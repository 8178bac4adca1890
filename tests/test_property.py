"""Property-based (hypothesis) fuzzing of the partition-local kernels
against the row-at-a-time oracle module — no Ray needed.

The fixed-seed corpus tests in test_kernels.py pin the kernels to the
oracle on ONE distribution; these generate adversarial shapes the
generator never emits: empty tables, single-row entities, all-equal
timestamps, duplicate (key, ts) pairs, huge ts spans that force the
composite-key overflow fallback in asof_merge, and NaN-riddled value
columns. Value magnitudes are kept small on purpose: the kernels use
uncentered sum-of-squares (fine at feature scale), and the properties
fuzz LOGIC, not float cancellation.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from featureengineer_ray import kernels, oracle

KEYS = ["a", "b", "c", "dd", ""]  # incl. empty string and 2-char key

SMALL_TS = st.integers(min_value=-1000, max_value=1000)
# spans past 2^61 with several codes trip the (max_code+1)*off >= 2^62
# fallback inside asof_merge / asof_merge_nearest
HUGE_TS = st.integers(min_value=(1 << 60), max_value=(1 << 61))
X_VALS = st.one_of(
    st.just(float("nan")),
    st.integers(min_value=-100, max_value=100).map(float),
)


@st.composite
def event_frames(draw, ts_strategy=SMALL_TS, max_rows=40):
    n = draw(st.integers(min_value=0, max_value=max_rows))
    rows = {
        "doc_id": draw(st.lists(st.sampled_from(KEYS), min_size=n,
                                max_size=n)),
        "ts": draw(st.lists(ts_strategy, min_size=n, max_size=n)),
        "x": draw(st.lists(X_VALS, min_size=n, max_size=n)),
    }
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("int64")
    df["event_seq"] = np.arange(n, dtype=np.int64)  # unique tiebreak
    return df


def _part(df: pd.DataFrame) -> kernels.SortedPartition:
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return kernels.sort_partition(tbl, "doc_id", "ts", "event_seq")


def _sorted_x(p: kernels.SortedPartition) -> np.ndarray:
    return p.table.column("x").to_numpy(zero_copy_only=False).astype(
        np.float64)


def _brute_asof_backward(ev_codes, ev_ts, sp_codes, sp_ts, tol):
    idx = np.full(len(sp_codes), -1, dtype=np.int64)
    valid = np.zeros(len(sp_codes), dtype=bool)
    for r in range(len(sp_codes)):
        cand = [j for j in range(len(ev_codes))
                if ev_codes[j] == sp_codes[r] and ev_ts[j] <= sp_ts[r]]
        if cand:
            j = cand[-1]  # last in (code, ts, tiebreak) sort order
            if tol is None or sp_ts[r] - ev_ts[j] <= tol:
                idx[r], valid[r] = j, True
    return idx, valid


@settings(max_examples=60, deadline=None)
@given(ev=event_frames(), sp=event_frames(max_rows=25),
       tol=st.one_of(st.none(), st.integers(min_value=0, max_value=500)))
def test_prop_asof_merge_backward(ev, sp, tol):
    p = _part(ev)
    sp_codes, _ = kernels.map_keys_to_codes(
        p.uniques, sp["doc_id"].to_numpy())
    sp_ts = sp["ts"].to_numpy()
    got_idx, got_valid = kernels.asof_merge(p.codes, p.ts, sp_codes,
                                            sp_ts, tol)
    exp_idx, exp_valid = _brute_asof_backward(p.codes, p.ts, sp_codes,
                                              sp_ts, tol)
    np.testing.assert_array_equal(got_valid, exp_valid)
    np.testing.assert_array_equal(got_idx[got_valid], exp_idx[exp_valid])


@settings(max_examples=30, deadline=None)
@given(ev=event_frames(ts_strategy=st.one_of(SMALL_TS, HUGE_TS)),
       sp=event_frames(ts_strategy=st.one_of(SMALL_TS, HUGE_TS),
                       max_rows=20))
def test_prop_asof_merge_overflow_fallback(ev, sp):
    """Huge ts spans route through _asof_merge_segmented; semantics must
    be identical to the composite-key fast path (checked via brute
    force, which is path-agnostic)."""
    p = _part(ev)
    sp_codes, _ = kernels.map_keys_to_codes(
        p.uniques, sp["doc_id"].to_numpy())
    sp_ts = sp["ts"].to_numpy()
    got_idx, got_valid = kernels.asof_merge(p.codes, p.ts, sp_codes,
                                            sp_ts, None)
    exp_idx, exp_valid = _brute_asof_backward(p.codes, p.ts, sp_codes,
                                              sp_ts, None)
    np.testing.assert_array_equal(got_valid, exp_valid)
    np.testing.assert_array_equal(got_idx[got_valid], exp_idx[exp_valid])


@settings(max_examples=40, deadline=None)
@given(ev=event_frames(ts_strategy=st.one_of(SMALL_TS, HUGE_TS)),
       sp=event_frames(ts_strategy=st.one_of(SMALL_TS, HUGE_TS),
                       max_rows=20),
       tol=st.one_of(st.none(), st.integers(min_value=0, max_value=500)))
def test_prop_asof_merge_nearest(ev, sp, tol):
    """Nearest = min |Δts|; distance ties prefer backward; within a side
    backward takes the LAST and forward the FIRST sorted candidate."""
    p = _part(ev)
    sp_codes, _ = kernels.map_keys_to_codes(
        p.uniques, sp["doc_id"].to_numpy())
    sp_ts = sp["ts"].to_numpy()
    got_idx, got_valid = kernels.asof_merge_nearest(
        p.codes, p.ts, sp_codes, sp_ts, tol)
    for r in range(len(sp_codes)):
        back = [j for j in range(p.n)
                if p.codes[j] == sp_codes[r] and p.ts[j] <= sp_ts[r]]
        fwd = [j for j in range(p.n)
               if p.codes[j] == sp_codes[r] and p.ts[j] >= sp_ts[r]]
        jb = back[-1] if back else None
        jf = fwd[0] if fwd else None
        db = sp_ts[r] - p.ts[jb] if jb is not None else None
        df_ = p.ts[jf] - sp_ts[r] if jf is not None else None
        if jb is None and jf is None:
            exp = None
        elif jf is None or (jb is not None and db <= df_):
            exp = jb if (tol is None or db <= tol) else None
        else:
            exp = jf if (tol is None or df_ <= tol) else None
        # tolerance may invalidate the nearer side while the farther
        # side is in range — the kernel (like pandas merge_asof) drops
        # the row entirely; accept either only when exp is None
        if exp is None:
            if got_valid[r]:
                other = jf if (jb is not None and db is not None
                               and (df_ is None or db <= df_)) else jb
                assert other is not None and got_idx[r] == other
        else:
            assert got_valid[r] and got_idx[r] == exp, (
                r, got_idx[r], exp, jb, jf)


@settings(max_examples=40, deadline=None)
@given(df=event_frames(ts_strategy=st.integers(0, 5000), max_rows=30),
       w=st.integers(min_value=0, max_value=2000))
def test_prop_rolling_time(df, w):
    if len(df) == 0:
        return
    p = _part(df)
    got = kernels.rolling_time(p, _sorted_x(p), w)
    exp = oracle.oracle_rolling_time(df, "doc_id", "ts", "x", w,
                                     tiebreak="event_seq")
    for stat in ("sum", "mean", "min", "max", "std", "count"):
        np.testing.assert_allclose(
            got[stat],
            exp[f"x_troll_{stat}"].astype("float64").to_numpy(),
            rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=stat)


@settings(max_examples=40, deadline=None)
@given(df=event_frames(ts_strategy=st.integers(0, 5000), max_rows=30),
       gap=st.integers(min_value=0, max_value=2000))
def test_prop_sessionize(df, gap):
    if len(df) == 0:
        return
    p = _part(df)
    got = kernels.sessionize(p, gap)
    exp = oracle.oracle_sessionize(df, "doc_id", "ts", gap,
                                   tiebreak="event_seq")
    for col in ("session_idx", "session_event_idx", "session_len"):
        np.testing.assert_array_equal(
            got[col], exp[col].to_numpy(), err_msg=col)


@settings(max_examples=40, deadline=None)
@given(df=event_frames(max_rows=30))
def test_prop_expanding_zscore(df):
    if len(df) == 0:
        return
    p = _part(df)
    got = kernels.expanding_zscore(p, _sorted_x(p))
    exp = oracle.oracle_expanding_zscore(df, "doc_id", "ts", "x",
                                         tiebreak="event_seq")
    np.testing.assert_allclose(
        got, exp["x_ez"].astype("float64").to_numpy(),
        rtol=1e-9, atol=1e-9, equal_nan=True)


@settings(max_examples=40, deadline=None)
@given(df=event_frames(max_rows=30))
def test_prop_dedup_first(df):
    p = _part(df)
    mask = kernels.dedup_first_mask(p)
    kept = p.table.filter(pa.array(mask)).to_pandas()
    exp = oracle.oracle_dedup_first(df, ["doc_id", "ts"],
                                    ["doc_id", "ts", "event_seq"])
    assert len(kept) == len(exp)
    np.testing.assert_array_equal(kept["event_seq"].to_numpy(),
                                  exp["event_seq"].to_numpy())


@settings(max_examples=60, deadline=None)
@given(present=st.lists(st.sampled_from(KEYS), max_size=20),
       probe=st.lists(st.sampled_from(KEYS + ["zz", "q"]), max_size=20))
def test_prop_map_keys_to_codes(present, probe):
    uniques = np.unique(np.array(present, dtype=object))
    keys = np.array(probe, dtype=object)
    codes, ok = kernels.map_keys_to_codes(uniques, keys)
    in_set = np.isin(keys, uniques)
    np.testing.assert_array_equal(ok, in_set)
    assert (codes[~ok] == -1).all()
    if ok.any():
        np.testing.assert_array_equal(uniques[codes[ok]], keys[ok])


@settings(max_examples=40, deadline=None)
@given(df=event_frames(max_rows=30))
def test_prop_ffill_bfill(df):
    if len(df) == 0:
        return
    p = _part(df)
    x = _sorted_x(p)
    valid = ~np.isnan(x)
    fi, f_ok = kernels.ffill_indices(p, valid)
    bi, b_ok = kernels.bfill_indices(p, valid)
    got_ff = np.where(f_ok, x[np.maximum(fi, 0)], np.nan)
    got_bf = np.where(b_ok, x[np.clip(bi, 0, p.n - 1)], np.nan)
    exp = oracle.oracle_fill(df, "doc_id", "ts", "x",
                             tiebreak="event_seq")
    np.testing.assert_allclose(
        got_ff, exp["x_ffill"].astype("float64").to_numpy(),
        equal_nan=True)
    np.testing.assert_allclose(
        got_bf, exp["x_bfill"].astype("float64").to_numpy(),
        equal_nan=True)
