"""Evaluation-metric sink (S8 analog): score table → DET-style curve →
EER summary (reference: the sorted-cumsum DET/EER computation,
``jyh/result.py:34-88`` and ``IVector.py:1670-1690``).

Scale shape: the only per-row work is a vectorized score+bucket map; the
heavy reduction is ONE grouped aggregate over score buckets (distributed,
map-side combined). The cumulative sweep then runs over the BUCKET table,
which is ≤ ``2·n_buckets+1`` rows by construction — a deliberate
histogram formulation so the curve never requires a global row sort at
100 TB (the reference's DETsort full sort is available separately as
:func:`relational.global_rank`).

All curve arithmetic is over exact integer counts; the final rates are
single IEEE divisions — bit-identical to the SQL oracle at any
parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import relational


def score_buckets(emb_ds, *, vec_col: str = "embedding",
                  label_col: str = "label", scale: float = 50.0):
    """Per-row trial score = first component of the L2-normalized vector
    (a deterministic cosine-against-probe-axis), histogrammed into
    ``floor(score·scale)`` buckets with positive = even label."""

    def prep(batch: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        vecs = vec_matrix(batch.column(vec_col), batch.num_rows)
        lab = batch.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        norm = np.sqrt((vecs * vecs).sum(axis=1))
        norm[norm == 0] = 1.0
        score = vecs[:, 0] / norm
        bucket = np.floor(score * scale).astype(np.int64)
        pos = (lab % 2 == 0).astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket),
            "pos": pa.array(pos),
        })

    pre = emb_ds.map_batches(prep, batch_format="pyarrow")
    return relational.grouped_agg(
        pre, ["bucket"], {"n_pos": ("pos", "sum")}, count_alias="n")


def det_curve(emb_ds, *, vec_col: str = "embedding",
              label_col: str = "label", scale: float = 50.0) -> pd.DataFrame:
    """DET-style curve rows per score bucket, swept from the highest
    threshold down: cumulative true-positives / false-positives and the
    miss / false-alarm rates. Integer-exact until the final division."""
    buckets = score_buckets(emb_ds, vec_col=vec_col, label_col=label_col,
                            scale=scale).to_pandas()
    return det_curve_from_buckets(buckets)


def det_curve_from_buckets(buckets: pd.DataFrame) -> pd.DataFrame:
    """The cumulative DET sweep over an already-histogrammed
    (bucket, n_pos, n) table — shared by the built-in probe score and
    any external trial scorer (e.g. the i-vector cosine trials)."""
    buckets = buckets.copy()
    buckets["n_pos"] = buckets["n_pos"].astype("int64")
    buckets["n"] = buckets["n"].astype("int64")
    buckets["n_neg"] = buckets["n"] - buckets["n_pos"]
    buckets = buckets.sort_values("bucket", ascending=False,
                                  kind="stable").reset_index(drop=True)
    P = int(buckets["n_pos"].sum())
    N = int(buckets["n_neg"].sum())
    cum_tp = buckets["n_pos"].cumsum().astype("int64")
    cum_fp = buckets["n_neg"].cumsum().astype("int64")
    fnr = np.round(1.0 - cum_tp.to_numpy(np.float64) / float(max(P, 1)), 6)
    fpr = np.round(cum_fp.to_numpy(np.float64) / float(max(N, 1)), 6)
    return pd.DataFrame({
        "bucket": buckets["bucket"].astype("int64"),
        "n_pos": buckets["n_pos"],
        "n_neg": buckets["n_neg"],
        "cum_tp": cum_tp,
        "cum_fp": cum_fp,
        "fnr": fnr,
        "fpr": fpr,
    })


def det_curve_svg(curve: pd.DataFrame, *, width: int = 480,
                  height: int = 480) -> str:
    """DET plot (fpr vs fnr, log-like axes) as a standalone SVG string —
    the reference plots this curve with matplotlib (jyh/result.py:59-69);
    this environment has no plotting library, so the SVG is built by
    hand from the exact curve rows. Deterministic: same curve → same
    bytes."""
    m = 48  # margin for axis labels
    fpr = np.clip(curve["fpr"].to_numpy(np.float64), 1e-4, 1.0)
    fnr = np.clip(curve["fnr"].to_numpy(np.float64), 1e-4, 1.0)

    def sx(v: np.ndarray) -> np.ndarray:  # log10 scale, 1e-4..1 → px
        return m + (np.log10(v) + 4.0) / 4.0 * (width - 2 * m)

    def sy(v: np.ndarray) -> np.ndarray:
        return height - m - (np.log10(v) + 4.0) / 4.0 * (height - 2 * m)

    order = np.argsort(fpr, kind="stable")
    pts = " ".join(f"{x:.1f},{y:.1f}"
                   for x, y in zip(sx(fpr[order]), sy(fnr[order])))
    ticks = [1e-4, 1e-3, 1e-2, 1e-1, 1.0]
    grid = []
    for t in ticks:
        gx = float(sx(np.array([t]))[0])
        gy = float(sy(np.array([t]))[0])
        grid.append(f'<line x1="{gx:.1f}" y1="{m}" x2="{gx:.1f}" '
                    f'y2="{height - m}" stroke="#ddd"/>')
        grid.append(f'<line x1="{m}" y1="{gy:.1f}" x2="{width - m}" '
                    f'y2="{gy:.1f}" stroke="#ddd"/>')
        grid.append(f'<text x="{gx:.1f}" y="{height - m + 16}" '
                    f'font-size="10" text-anchor="middle">{t:g}</text>')
        grid.append(f'<text x="{m - 6}" y="{gy + 3:.1f}" font-size="10" '
                    f'text-anchor="end">{t:g}</text>')
    eer = eer_summary(curve).iloc[0]
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
        f'<rect width="{width}" height="{height}" fill="white"/>'
        + "".join(grid)
        + f'<polyline points="{pts}" fill="none" stroke="#1f77b4" '
          f'stroke-width="1.5"/>'
        + f'<line x1="{m}" y1="{height - m}" x2="{width - m}" y2="{m}" '
          f'stroke="#999" stroke-dasharray="4 3"/>'
        + f'<text x="{width // 2}" y="{height - 8}" font-size="12" '
          f'text-anchor="middle">false alarm rate</text>'
        + f'<text x="12" y="{height // 2}" font-size="12" '
          f'text-anchor="middle" transform="rotate(-90 12 '
          f'{height // 2})">miss rate</text>'
        + f'<text x="{width - m}" y="{m - 6}" font-size="11" '
          f'text-anchor="end">EER={float(eer["eer"]):.4f}</text>'
        + "</svg>")


def write_metrics_artifact(curve: pd.DataFrame, out_dir: str) -> dict:
    """Persist the curve + summary the way the reference's result stage
    writes its score artifacts (S8 sink): curve.parquet + curve.svg +
    summary.json + an atomic _SUCCESS marker so a resumed run can skip
    the stage."""
    import json
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_SUCCESS.json")
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)
    pq.write_table(pa.Table.from_pandas(curve, preserve_index=False),
                   os.path.join(out_dir, "curve.parquet"))
    with open(os.path.join(out_dir, "curve.svg"), "w") as f:
        f.write(det_curve_svg(curve))
    summary = eer_summary(curve).iloc[0].to_dict()
    summary = {k: (int(v) if k == "eer_bucket" else float(v))
               for k, v in summary.items()}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f)
    os.replace(tmp, marker)
    return summary


def roc_auc(curve: pd.DataFrame) -> pd.DataFrame:
    """Exact ROC-AUC from the bucketed DET curve (the Mann–Whitney
    rank-sum form; reference analog: the scoring/summary stage next to
    the EER pick, ``jyh/result.py:70-88``).

    With buckets swept from the highest score down, every negative in
    bucket ``b`` is out-ranked by the ``cum_tp_b − n_pos_b`` positives
    in strictly higher buckets, and ties inside the bucket count half.
    So ``2·P·N·AUC = Σ_b n_neg_b · (2·cum_tp_b − n_pos_b)`` — an exact
    int64 sum over the O(buckets) table; AUC is one IEEE division at the
    end, bit-identical to the SQL oracle at any parallelism."""
    n_pos = curve["n_pos"].to_numpy(np.int64)
    n_neg = curve["n_neg"].to_numpy(np.int64)
    cum_tp = curve["cum_tp"].to_numpy(np.int64)
    P = int(n_pos.sum())
    N = int(n_neg.sum())
    numer2 = int((n_neg * (2 * cum_tp - n_pos)).sum())
    denom = 2 * max(P, 1) * max(N, 1)
    return pd.DataFrame({
        "n_pos": [P],
        "n_neg": [N],
        "auc_numer2": [numer2],
        "auc": [float(np.round(numer2 / denom, 6))],
    })


def eer_summary(curve: pd.DataFrame) -> pd.DataFrame:
    """The curve's argmin-|fnr−fpr| row (reference's EER threshold pick,
    jyh/result.py:70-88): one-row summary (threshold bucket + EER)."""
    d = np.abs(curve["fnr"].to_numpy() - curve["fpr"].to_numpy())
    order = np.lexsort((curve["bucket"].to_numpy(), d))
    row = curve.iloc[order[0]]
    return pd.DataFrame({
        "eer_bucket": [int(row["bucket"])],
        "fnr": [float(row["fnr"])],
        "fpr": [float(row["fpr"])],
        "eer": [float(np.round((row["fnr"] + row["fpr"]) / 2.0, 6))],
    })
