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


def write_metrics_artifact(curve: pd.DataFrame, out_dir: str) -> dict:
    """Persist the curve + summary the way the reference's result stage
    writes its score artifacts (S8 sink): curve.parquet + summary.json +
    an atomic _SUCCESS marker so a resumed run can skip the stage."""
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
    summary = eer_summary(curve).iloc[0].to_dict()
    summary = {k: (int(v) if k == "eer_bucket" else float(v))
               for k, v in summary.items()}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f)
    os.replace(tmp, marker)
    return summary


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
