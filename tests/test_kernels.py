"""Kernel ↔ oracle conformance on the synthetic token corpus (no Ray).

Every vectorized partition kernel must agree with the row-at-a-time oracle
(FIXTURES.md §5: token-array equality, allclose rtol=1e-9)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import kernels, oracle
from featureengineer_ray.datagen import (
    GenSpec, SESSION_GAP_US, generate_events, generate_spine,
)

SPEC = GenSpec(n_rows=2000, n_entities=50, seed=42)


@pytest.fixture(scope="module")
def events_tbl() -> pa.Table:
    return generate_events(SPEC)


@pytest.fixture(scope="module")
def part(events_tbl) -> kernels.SortedPartition:
    return kernels.sort_partition(events_tbl, "doc_id", "ts", "event_seq")


@pytest.fixture(scope="module")
def events_df(events_tbl) -> pd.DataFrame:
    df = events_tbl.to_pandas()
    df["n_tok"] = df["n_tok"].astype("float64")
    return df


def _sorted_df(part: kernels.SortedPartition) -> pd.DataFrame:
    return part.table.to_pandas()


def test_generator_shape(events_tbl):
    assert events_tbl.num_rows == SPEC.n_rows
    assert events_tbl.schema.field("tokens").type == pa.list_(pa.int32())
    df = events_tbl.to_pandas()
    # n_tok consistent with tokens
    assert (df["tokens"].map(len) == df["n_tok"]).all()
    # hot key: top entity holds ≥5% of rows
    counts = df["doc_id"].value_counts()
    assert counts.iloc[0] >= 0.05 * len(df)
    # some single-event entities exist
    assert (counts == 1).sum() >= 1
    # strictly increasing ts per entity in event_seq order
    for _, g in df.groupby("doc_id"):
        g = g.sort_values("event_seq")
        assert g["ts"].is_monotonic_increasing
        assert g["ts"].nunique() == len(g)


def test_generator_deterministic(events_tbl):
    again = generate_events(GenSpec(n_rows=2000, n_entities=50, seed=42))
    assert again.equals(events_tbl)
    other = generate_events(GenSpec(n_rows=2000, n_entities=50, seed=7))
    assert not other.equals(events_tbl)


def test_sessionize_gap_fraction(events_tbl):
    """~10% of consecutive pairs should exceed the session gap."""
    df = events_tbl.to_pandas().sort_values(["doc_id", "event_seq"])
    gaps = df.groupby("doc_id")["ts"].diff().dropna().dt.total_seconds()
    frac = (gaps > SESSION_GAP_US / 1e6).mean()
    assert 0.04 < frac < 0.2


def test_lag_lead_vs_oracle(part, events_df):
    exp = oracle.oracle_lag_lead(events_df, "doc_id", "ts", "n_tok",
                                 lags=[1, 2, 3], leads=[1], tiebreak="event_seq")
    got = _sorted_df(part)
    x = part.table.column("n_tok")
    for k in (1, 2, 3):
        idx, valid = kernels.lag_indices(part, k)
        got[f"n_tok_lag_{k}"] = kernels.take_with_mask(x, idx, valid).to_pandas()
    idx, valid = kernels.lead_indices(part, 1)
    got["n_tok_lead_1"] = kernels.take_with_mask(x, idx, valid).to_pandas()
    for col in ["n_tok_lag_1", "n_tok_lag_2", "n_tok_lag_3", "n_tok_lead_1"]:
        a = got[col].astype("float64").to_numpy()
        b = exp[col].astype("float64").to_numpy()
        np.testing.assert_allclose(a, b, rtol=1e-9, equal_nan=True)


def test_rolling_rows_vs_oracle(part, events_df):
    w = 5
    exp = oracle.oracle_rolling_rows(events_df, "doc_id", "ts", "n_tok", w,
                                     tiebreak="event_seq")
    x = part.table.column("n_tok").cast(pa.float64()).to_numpy(zero_copy_only=False)
    got = kernels.rolling_rows(part, x, w)
    for stat in ("sum", "mean", "min", "max", "std", "count"):
        b = exp[f"n_tok_roll_{stat}_{w}"].astype("float64").to_numpy()
        np.testing.assert_allclose(got[stat], b, rtol=1e-9, equal_nan=True)


def test_rolling_time_vs_oracle(events_df):
    # small slice only: oracle is O(n^2) per entity
    small = events_df.groupby("doc_id").head(30).copy()
    tbl = pa.Table.from_pandas(small, preserve_index=False)
    p = kernels.sort_partition(tbl, "doc_id", "ts", "event_seq")
    W = 5 * 60 * 1_000_000  # 5 minutes
    exp = oracle.oracle_rolling_time(small, "doc_id", "ts", "n_tok", W,
                                     tiebreak="event_seq")
    x = p.table.column("n_tok").cast(pa.float64()).to_numpy(zero_copy_only=False)
    got = kernels.rolling_time(p, x, W)
    for stat in ("sum", "mean", "min", "max", "std", "count"):
        np.testing.assert_allclose(
            got[stat],
            exp[f"n_tok_troll_{stat}"].astype("float64").to_numpy(),
            rtol=1e-9, equal_nan=True, err_msg=stat)


def test_rolling_time_null_ts_rows_excluded(events_df):
    """Rows with null ts are excluded from every window and get NaN
    stats / count 0 themselves (found by a verify probe: the round-2
    kernel crashed on a null-bearing ts column)."""
    small = events_df.groupby("doc_id").head(20).copy()
    small = small.reset_index(drop=True)
    small.loc[small.index % 5 == 0, "ts"] = pd.NaT  # inject null ts
    # oracle over the non-null-ts subset
    sub = small[small["ts"].notna()].copy()
    W = 5 * 60 * 1_000_000
    exp = oracle.oracle_rolling_time(sub, "doc_id", "ts", "n_tok", W,
                                     tiebreak="event_seq")
    # kernel over the full table including null-ts rows
    tbl = pa.Table.from_pandas(small, preserve_index=False)
    p = kernels.sort_partition(tbl, "doc_id", "ts", "event_seq")
    x = p.table.column("n_tok").cast(pa.float64()).to_numpy(
        zero_copy_only=False)
    got = kernels.rolling_time(p, x, W)
    ts_sorted = np.asarray(p.ts, dtype=np.float64)
    fin = np.isfinite(ts_sorted)
    assert (got["count"][~fin] == 0).all()
    assert np.isnan(got["sum"][~fin]).all()
    # finite rows, sorted by (doc, ts, seq), must match the oracle on the
    # null-free subset (same order on both sides)
    np.testing.assert_allclose(
        got["sum"][fin], exp["n_tok_troll_sum"].astype("float64").to_numpy(),
        rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(
        got["min"][fin], exp["n_tok_troll_min"].astype("float64").to_numpy(),
        rtol=1e-9, equal_nan=True)


def test_fill_vs_oracle(part, events_df):
    # introduce deterministic nulls: n_tok where source == 'chat' → null
    df = events_df.copy()
    df["val"] = df["n_tok"].where(df["source"] != "chat")
    exp = oracle.oracle_fill(df, "doc_id", "ts", "val", tiebreak="event_seq")

    sdf = _sorted_df(part)
    val = sdf["n_tok"].astype("float64").where(sdf["source"] != "chat")
    x = val.to_numpy(dtype="float64", na_value=np.nan)
    valid = ~np.isnan(x)
    fi, fok = kernels.ffill_indices(part, valid)
    bi, bok = kernels.bfill_indices(part, valid)
    got_ff = np.where(fok, x[np.maximum(fi, 0)], np.nan)
    got_bf = np.where(bok, x[np.maximum(bi, 0)], np.nan)
    np.testing.assert_allclose(
        got_ff, exp["val_ffill"].astype("float64").to_numpy(), rtol=1e-9,
        equal_nan=True)
    np.testing.assert_allclose(
        got_bf, exp["val_bfill"].astype("float64").to_numpy(), rtol=1e-9,
        equal_nan=True)


def test_sessionize_vs_oracle(part, events_df):
    exp = oracle.oracle_sessionize(events_df, "doc_id", "ts",
                                   gap_us=int(SESSION_GAP_US),
                                   tiebreak="event_seq")
    got = kernels.sessionize(part, int(SESSION_GAP_US))
    for col in ("session_idx", "session_event_idx", "session_len"):
        np.testing.assert_array_equal(got[col], exp[col].to_numpy())


def test_zscore_vs_oracle(part, events_df):
    exp = oracle.oracle_zscore(events_df, "doc_id", "n_tok")
    # oracle output is in input order; re-sort to partition order
    exp = exp.sort_values(["doc_id", "ts", "event_seq"], kind="stable")
    x = part.table.column("n_tok").cast(pa.float64()).to_numpy(zero_copy_only=False)
    got = kernels.zscore(part, x)
    np.testing.assert_allclose(
        got, exp["n_tok_z"].astype("float64").to_numpy(), rtol=1e-9,
        equal_nan=True)


def test_expanding_zscore_vs_oracle(part, events_df):
    exp = oracle.oracle_expanding_zscore(events_df, "doc_id", "ts", "n_tok",
                                         tiebreak="event_seq")
    x = part.table.column("n_tok").cast(pa.float64()).to_numpy(
        zero_copy_only=False)
    got = kernels.expanding_zscore(part, x)
    np.testing.assert_allclose(
        got, exp["n_tok_ez"].astype("float64").to_numpy(), rtol=1e-9,
        atol=1e-9, equal_nan=True)


def test_expanding_zscore_with_prefix_matches_whole():
    """Splitting a sequence at any point and carrying (cnt,sum,ssq) as the
    prefix must reproduce the unsplit expanding z (the hot-split path)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(200)
    x[::11] = np.nan
    tbl = pa.table({"k": ["a"] * 200, "ts": np.arange(200, dtype=np.int64),
                    "v": x})
    p = kernels.sort_partition(tbl, "k", "ts")
    whole = kernels.expanding_zscore(p, x)
    for cut in (1, 50, 199):
        head = x[:cut]
        v = ~np.isnan(head)
        pref = (float(v.sum()), float(np.nansum(head)),
                float(np.nansum(head ** 2)))
        tail = kernels.expanding_zscore_with_prefix(x[cut:], pref)
        np.testing.assert_allclose(tail, whole[cut:], rtol=1e-9, atol=1e-9,
                                   equal_nan=True)


def test_asof_merge_vs_oracle(events_tbl, events_df):
    spine = generate_spine(SPEC).to_pandas()
    exp = oracle.oracle_asof_join(
        spine, events_df, key="doc_id", ts="ts", as_of_ts="as_of_ts",
        value_cols=["n_tok", "event_seq"], tiebreak="event_seq")

    part = kernels.sort_partition(events_tbl, "doc_id", "ts", "event_seq")
    # shared code space across both sides
    ev_keys = part.table.column("doc_id").to_numpy(zero_copy_only=False)
    sp_keys = spine["doc_id"].to_numpy()
    uniq = np.unique(np.concatenate([ev_keys, sp_keys]))
    code_of = {k: i for i, k in enumerate(uniq)}
    ev_codes = np.array([code_of[k] for k in ev_keys], dtype=np.int64)
    sp_codes = np.array([code_of[k] for k in sp_keys], dtype=np.int64)
    ev_ts = part.ts
    sp_ts = spine["as_of_ts"].astype("int64").to_numpy()
    # ev side sorted by (uniq-code, ts)? codes from np.unique are
    # lexicographic ranks — same ordering as part's own codes, so still sorted.
    idx, valid = kernels.asof_merge(ev_codes, ev_ts, sp_codes, sp_ts)

    got_ntok = np.where(
        valid,
        part.table.column("n_tok").to_numpy(zero_copy_only=False)[np.maximum(idx, 0)],
        np.nan,
    )
    np.testing.assert_allclose(
        got_ntok, exp["n_tok"].astype("float64").to_numpy(), rtol=1e-9,
        equal_nan=True)
    got_seq = np.where(
        valid,
        part.table.column("event_seq").to_numpy(zero_copy_only=False)[np.maximum(idx, 0)],
        np.nan,
    )
    np.testing.assert_allclose(
        got_seq, exp["event_seq"].astype("float64").to_numpy(), rtol=1e-9,
        equal_nan=True)
    # token-array equality at matched rows
    toks = part.table.column("tokens")
    taken = kernels.take_with_mask(toks, idx, valid).to_pylist()
    ev_sorted = part.table.to_pandas()
    for r in range(0, len(spine), 97):
        if valid[r]:
            expected = ev_sorted["tokens"].iloc[idx[r]]
            assert list(taken[r]) == list(expected)
        else:
            assert taken[r] is None


def test_asof_tolerance(events_tbl, events_df):
    spine = generate_spine(SPEC).to_pandas()
    tol = 120_000_000  # 2 minutes
    exp = oracle.oracle_asof_join(
        spine, events_df, key="doc_id", ts="ts", as_of_ts="as_of_ts",
        value_cols=["n_tok"], tolerance=pd.Timedelta(tol, unit="us"),
        tiebreak="event_seq")
    part = kernels.sort_partition(events_tbl, "doc_id", "ts", "event_seq")
    ev_keys = part.table.column("doc_id").to_numpy(zero_copy_only=False)
    sp_keys = spine["doc_id"].to_numpy()
    uniq = np.unique(np.concatenate([ev_keys, sp_keys]))
    code_of = {k: i for i, k in enumerate(uniq)}
    ev_codes = np.array([code_of[k] for k in ev_keys], dtype=np.int64)
    sp_codes = np.array([code_of[k] for k in sp_keys], dtype=np.int64)
    sp_ts = spine["as_of_ts"].astype("int64").to_numpy()
    idx, valid = kernels.asof_merge(ev_codes, part.ts, sp_codes, sp_ts,
                                    tolerance_us=tol)
    got = np.where(
        valid,
        part.table.column("n_tok").to_numpy(zero_copy_only=False)[np.maximum(idx, 0)],
        np.nan)
    np.testing.assert_allclose(
        got, exp["n_tok"].astype("float64").to_numpy(), rtol=1e-9,
        equal_nan=True)


def test_dedup_first(events_tbl):
    # inject duplicates: repeat first 50 rows with a higher tiebreak
    dup = events_tbl.slice(0, 50).to_pandas()
    dup["event_seq"] = dup["event_seq"]  # same (doc_id, ts) — exact dup rows
    dup["n_tok"] = -1  # marker: must NOT survive (first wins)
    base = events_tbl.to_pandas()
    base["__order"] = np.arange(len(base))
    dup["__order"] = np.arange(len(base), len(base) + len(dup))
    both = pd.concat([base, dup], ignore_index=True)
    tbl = pa.Table.from_pandas(both, preserve_index=False)
    p = kernels.sort_partition(tbl, "doc_id", "ts", "__order")
    keep = kernels.dedup_first_mask(p)
    out = p.table.to_pandas()[keep]
    assert len(out) == len(base)
    assert (out["n_tok"] != -1).all()
    exp = oracle.oracle_dedup_first(both, keys=["doc_id", "ts"],
                                    order=["doc_id", "ts", "__order"])
    got = out.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    exps = exp.sort_values(["doc_id", "ts"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["n_tok"].to_numpy(),
                                  exps["n_tok"].to_numpy())


def test_rolling_large_window_fallback():
    """window > 128 exercises the sparse-table path in _rolling_min_max
    (the strided sliding_window_view handles only w <= 128)."""
    spec = GenSpec(n_rows=600, n_entities=2, zipf_a=1.01, seed=9)
    tbl = generate_events(spec)
    part = kernels.sort_partition(tbl, "doc_id", "ts", "event_seq")
    x = part.table.column("n_tok").cast(pa.float64()).to_numpy(
        zero_copy_only=False)
    # null some values to test nan-awareness in the fallback
    x = x.copy()
    x[::7] = np.nan
    got = kernels.rolling_rows(part, x, 200)
    df = part.table.to_pandas()
    df["val"] = x
    exp = oracle.oracle_rolling_rows(df, "doc_id", "ts", "val", 200,
                                     tiebreak="event_seq")
    for stat in ("sum", "mean", "min", "max", "std", "count"):
        np.testing.assert_allclose(
            got[stat], exp[f"val_roll_{stat}_200"].astype("float64").to_numpy(),
            rtol=1e-9, equal_nan=True, err_msg=stat)


def test_asof_merge_nearest_vs_bruteforce():
    """Nearest-direction merge vs a per-row brute force, covering distance
    ties (backward preferred), within-side ts ties, tolerance, and codes
    with no candidates on one side."""
    rng = np.random.default_rng(42)
    n_ev, n_sp = 400, 150
    ev_codes = np.sort(rng.integers(0, 8, n_ev)).astype(np.int64)
    # within each code, sorted (ts, tiebreak); duplicate ts on purpose
    ev_ts = np.zeros(n_ev, dtype=np.int64)
    for c in np.unique(ev_codes):
        m = ev_codes == c
        ev_ts[m] = np.sort(rng.integers(0, 50, m.sum()))
    sp_codes = rng.integers(0, 10, n_sp).astype(np.int64)  # 8,9 = absent
    sp_ts = rng.integers(-5, 55, n_sp).astype(np.int64)
    order = np.argsort(sp_codes, kind="stable")
    sp_codes, sp_ts = sp_codes[order], sp_ts[order]

    for tol in (None, 3):
        idx, valid = kernels.asof_merge_nearest(
            ev_codes, ev_ts, sp_codes, sp_ts, tol)
        for r in range(n_sp):
            cand = np.flatnonzero(ev_codes == sp_codes[r])
            if len(cand) == 0:
                assert not valid[r]
                continue
            d = np.abs(ev_ts[cand] - sp_ts[r])
            best = d.min()
            if tol is not None and best > tol:
                assert not valid[r], r
                continue
            assert valid[r], r
            winners = cand[d == best]
            back = winners[ev_ts[winners] <= sp_ts[r]]
            # backward preferred on distance ties; last-in-order within
            # backward, first-in-order within forward
            expect = back[-1] if len(back) else winners[0]
            assert idx[r] == expect, (r, idx[r], expect)


def test_asof_merge_nearest_overflow_fallback():
    """Huge code × span product forces the segmented forward fallback."""
    ev_codes = np.array([0, 0, 10**9], dtype=np.int64)
    ev_ts = np.array([0, 10**10, 5], dtype=np.int64)
    sp_codes = np.array([0, 10**9, 7], dtype=np.int64)
    sp_ts = np.array([10**9, 0, 0], dtype=np.int64)
    idx, valid = kernels.asof_merge_nearest(ev_codes, ev_ts, sp_codes, sp_ts)
    assert valid[0] and idx[0] == 0          # 1e9 closer to 0 than 1e10
    assert valid[1] and idx[1] == 2          # forward-only candidate
    assert not valid[2]                      # absent code
