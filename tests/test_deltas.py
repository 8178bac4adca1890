"""Delta / double-delta kernel vs a naive per-row oracle (no Ray)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from featureengineer_ray import deltas, kernels


def _naive_delta(xs: list[float], k: int) -> list[float]:
    n = len(xs)
    denom = 2.0 * sum(j * j for j in range(1, k + 1))
    out = []
    for i in range(n):
        num = 0.0
        for j in range(1, k + 1):
            num += j * (xs[min(i + j, n - 1)] - xs[max(i - j, 0)])
        out.append(num / denom)
    return out


def _mk_part(df: pd.DataFrame) -> kernels.SortedPartition:
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return kernels.sort_partition(tbl, "doc_id", "ts", "event_seq")


def test_delta_vs_naive_multi_entity():
    rng = np.random.default_rng(7)
    rows = []
    for doc, n in (("a", 11), ("b", 1), ("c", 2), ("d", 5)):
        for i in range(n):
            rows.append({"doc_id": doc, "ts": int(rng.integers(0, 50)),
                         "event_seq": len(rows),
                         "x": float(rng.integers(-20, 20))})
    df = pd.DataFrame(rows)
    p = _mk_part(df)
    x = p.table.column("x").to_numpy(zero_copy_only=False).astype(float)
    for k in (1, 2, 3):
        got = deltas.delta(p, x, k)
        exp = np.concatenate([
            _naive_delta(list(x[s:e]), k)
            for s, e in zip(p.seg_offsets[:-1], p.seg_offsets[1:])])
        np.testing.assert_allclose(got, exp, rtol=1e-12)
        got2 = deltas.double_delta(p, x, k)
        exp2 = np.concatenate([
            _naive_delta(_naive_delta(list(x[s:e]), k), k)
            for s, e in zip(p.seg_offsets[:-1], p.seg_offsets[1:])])
        np.testing.assert_allclose(got2, exp2, rtol=1e-12)


def test_delta_linear_ramp_is_slope():
    """Interior of a linear sequence: delta == the per-step slope; the
    double delta of a linear sequence is 0 in the interior."""
    df = pd.DataFrame({
        "doc_id": ["u"] * 20,
        "ts": np.arange(20, dtype=np.int64),
        "event_seq": np.arange(20, dtype=np.int64),
        "x": 3.0 * np.arange(20) + 5.0,
    })
    p = _mk_part(df)
    x = df["x"].to_numpy()
    d = deltas.delta(p, x, 2)
    np.testing.assert_allclose(d[2:-2], 3.0, rtol=1e-12)
    dd = deltas.double_delta(p, x, 2)
    np.testing.assert_allclose(dd[4:-4], 0.0, atol=1e-12)


def test_delta_single_row_entity_zero():
    df = pd.DataFrame({"doc_id": ["z"], "ts": [0], "event_seq": [0],
                       "x": [42.0]})
    p = _mk_part(df)
    np.testing.assert_allclose(
        deltas.delta(p, np.array([42.0]), 2), [0.0])


def test_delta_empty():
    df = pd.DataFrame({"doc_id": pd.Series([], dtype=str),
                       "ts": pd.Series([], dtype="int64"),
                       "event_seq": pd.Series([], dtype="int64"),
                       "x": pd.Series([], dtype=float)})
    p = _mk_part(df)
    assert len(deltas.delta(p, np.zeros(0), 2)) == 0
