"""Hot-entity sub-split exactness: forced splits must match the oracle
(and the unsplit engine) bit-for-bit — including sessions spanning 3+
sub-partitions, ffill carries, z-score moments, and as-of payloads matched
from context rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import engine, oracle
from featureengineer_ray.datagen import (
    GenSpec, SESSION_GAP_US, generate_events, generate_spine,
)
from featureengineer_ray.partition import plan_partitions

# few entities + tiny partition budget → the Zipf head entities split into
# many time-contiguous subs
SPEC = GenSpec(n_rows=2500, n_entities=12, zipf_a=1.4, seed=23)
SORT = ["doc_id", "ts", "event_seq"]


@pytest.fixture(scope="module")
def events_tbl():
    return generate_events(SPEC)


@pytest.fixture(scope="module")
def spine_tbl():
    return generate_spine(SPEC)


@pytest.fixture(scope="module")
def split_plan(ray_session, events_tbl):
    import ray.data as rd

    ds = rd.from_arrow(events_tbl)
    plan = plan_partitions(ds, "doc_id", "ts", target_rows_per_part=150,
                           sample_rate=1.0, hot_factor=1.0,
                           split_hot_keys=True)
    assert plan.hot_splits, "test requires actual sub-splits"
    assert any(len(b) >= 2 for b in plan.hot_splits.values()), \
        "need a 3+-sub split to exercise session chains"
    return plan


def test_split_window_features_vs_oracle(ray_session, events_tbl, split_plan):
    import ray.data as rd

    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2, 3]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US), zscore=["n_tok"],
        expanding_zscore=["n_tok"],
    )
    ds = rd.from_arrow(events_tbl).repartition(5)
    got = engine.window_features(ds, spec, plan=split_plan).to_pandas()
    assert len(got) == events_tbl.num_rows
    got = got.sort_values(SORT, kind="stable").reset_index(drop=True)

    df = events_tbl.to_pandas()
    df["n_tok"] = df["n_tok"].astype("float64")
    exp = oracle.oracle_lag_lead(df, "doc_id", "ts", "n_tok", [1, 2, 3], [],
                                 tiebreak="event_seq")
    exp = oracle.oracle_rolling_rows(exp, "doc_id", "ts", "n_tok", 5,
                                     tiebreak="event_seq")
    exp = oracle.oracle_sessionize(exp, "doc_id", "ts", int(SESSION_GAP_US),
                                   tiebreak="event_seq")
    exp = oracle.oracle_zscore(exp, "doc_id", "n_tok")
    exp = oracle.oracle_expanding_zscore(exp, "doc_id", "ts", "n_tok",
                                         tiebreak="event_seq")
    exp = exp.sort_values(SORT, kind="stable").reset_index(drop=True)

    for col in ["n_tok_lag_1", "n_tok_lag_2", "n_tok_lag_3",
                "n_tok_roll_mean_5", "n_tok_roll_std_5", "n_tok_roll_sum_5",
                "n_tok_roll_min_5", "n_tok_roll_max_5", "n_tok_z",
                "n_tok_ez"]:
        np.testing.assert_allclose(
            got[col].astype("float64").to_numpy(),
            exp[col].astype("float64").to_numpy(),
            rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=col)
    for col in ["session_idx", "session_event_idx", "session_len"]:
        np.testing.assert_array_equal(
            got[col].to_numpy().astype("int64"),
            exp[col].to_numpy().astype("int64"), err_msg=col)


def test_split_ffill_vs_oracle(ray_session, events_tbl, split_plan):
    import ray.data as rd
    import pyarrow.compute as pc

    def nullify(batch: pa.Table) -> pa.Table:
        # long null runs (entire 'web' source) stress the cross-sub carry
        mask = pc.equal(batch.column("source"), "web")
        v = pc.if_else(mask, pa.nulls(batch.num_rows, pa.float64()),
                       batch.column("n_tok").cast(pa.float64()))
        return batch.append_column("val", v)

    ds = rd.from_arrow(events_tbl).map_batches(nullify,
                                               batch_format="pyarrow")
    spec = engine.WindowSpec(key="doc_id", ts="ts", tiebreak="event_seq",
                             ffill=["val"])
    got = engine.window_features(ds, spec, plan=split_plan).to_pandas()
    got = got.sort_values(SORT, kind="stable").reset_index(drop=True)

    df = events_tbl.to_pandas()
    df["val"] = df["n_tok"].astype("float64").where(df["source"] != "web")
    exp = oracle.oracle_fill(df, "doc_id", "ts", "val", tiebreak="event_seq")
    exp = exp.sort_values(SORT, kind="stable").reset_index(drop=True)
    np.testing.assert_allclose(
        got["val_ffill"].astype("float64").to_numpy(),
        exp["val_ffill"].astype("float64").to_numpy(),
        rtol=1e-9, equal_nan=True)


def test_split_feature_stack_vs_unsplit(ray_session, events_tbl, spine_tbl,
                                        split_plan):
    """Split and unsplit runs of the flagship must agree exactly —
    including tokens matched from context rows at sub boundaries."""
    import ray.data as rd

    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US),
    )
    ev = rd.from_arrow(events_tbl).repartition(4)
    sp = rd.from_arrow(spine_tbl).repartition(2)
    got = engine.feature_stack(
        ev, sp, spec, value_cols=["tokens", "n_tok", "event_seq"],
        plan=split_plan,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)

    ev2 = rd.from_arrow(events_tbl)
    sp2 = rd.from_arrow(spine_tbl)
    ref = engine.feature_stack(
        ev2, sp2, spec, value_cols=["tokens", "n_tok", "event_seq"],
        target_rows_per_part=10_000, sample_rate=1.0, min_parts=1,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)

    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref) == spine_tbl.num_rows
    for col in got.columns:
        if col == "tokens":
            for i in range(len(got)):
                g, e = got[col].iloc[i], ref[col].iloc[i]
                if e is None or (isinstance(e, float) and pd.isna(e)):
                    assert g is None or (isinstance(g, float) and pd.isna(g))
                else:
                    assert list(g) == list(e), f"tokens row {i}"
        elif got[col].dtype == object:
            assert got[col].astype(str).equals(ref[col].astype(str)), col
        else:
            np.testing.assert_allclose(
                got[col].to_numpy(dtype="float64"),
                ref[col].to_numpy(dtype="float64"),
                rtol=0, atol=0, equal_nan=True, err_msg=col)


def test_split_dedup_with_duplicate_rows(ray_session, events_tbl):
    """dedup=True combined with hot-entity sub-splits and duplicate
    (key, ts) rows (ADVICE r01 medium): the pre-pass summaries, ctx
    duplication and split kernels must all agree on the SURVIVING rows."""
    import ray.data as rd

    base = events_tbl.select(
        ["doc_id", "event_seq", "ts", "n_tok", "source"]).to_pandas()
    hot = base["doc_id"].value_counts().index[0]
    dups = base[base["doc_id"] == hot].iloc[::3].copy()
    dups["event_seq"] = dups["event_seq"] + 100_000  # later tiebreak → loses
    dups["n_tok"] = 9999
    both = pd.concat([base, dups], ignore_index=True)
    tbl = pa.Table.from_pandas(both, preserve_index=False)

    from featureengineer_ray.partition import plan_partitions

    plan = plan_partitions(rd.from_arrow(tbl), "doc_id", "ts",
                           target_rows_per_part=150, sample_rate=1.0,
                           hot_factor=1.0, split_hot_keys=True)
    assert hot in plan.hot_splits

    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US), zscore=["n_tok"],
        expanding_zscore=["n_tok"], dedup=True)
    got = engine.window_features(
        rd.from_arrow(tbl).repartition(5), spec, plan=plan).to_pandas()
    assert len(got) == len(base)
    assert (got["n_tok"] != 9999).all()
    got = got.sort_values(SORT, kind="stable").reset_index(drop=True)

    surv = oracle.oracle_dedup_first(
        both, keys=["doc_id", "ts"], order=["doc_id", "ts", "event_seq"])
    surv["n_tok"] = surv["n_tok"].astype("float64")
    exp = oracle.oracle_lag_lead(surv, "doc_id", "ts", "n_tok", [1, 2], [],
                                 tiebreak="event_seq")
    exp = oracle.oracle_rolling_rows(exp, "doc_id", "ts", "n_tok", 5,
                                     tiebreak="event_seq")
    exp = oracle.oracle_sessionize(exp, "doc_id", "ts", int(SESSION_GAP_US),
                                   tiebreak="event_seq")
    exp = oracle.oracle_zscore(exp, "doc_id", "n_tok")
    exp = oracle.oracle_expanding_zscore(exp, "doc_id", "ts", "n_tok",
                                         tiebreak="event_seq")
    exp = exp.sort_values(SORT, kind="stable").reset_index(drop=True)
    for col in ["n_tok_lag_1", "n_tok_lag_2", "n_tok_roll_mean_5",
                "n_tok_roll_sum_5", "n_tok_z", "n_tok_ez"]:
        np.testing.assert_allclose(
            got[col].astype("float64").to_numpy(),
            exp[col].astype("float64").to_numpy(),
            rtol=1e-9, atol=1e-9, equal_nan=True, err_msg=col)
    for col in ["session_idx", "session_event_idx", "session_len"]:
        np.testing.assert_array_equal(
            got[col].to_numpy().astype("int64"),
            exp[col].to_numpy().astype("int64"), err_msg=col)


def test_split_range_join_vs_unsplit(ray_session, events_tbl, spine_tbl,
                                     split_plan):
    """Spine-anchored range aggregates must be exact across hot-entity
    sub-splits (the fold carries W-deep boundary context)."""
    import ray.data as rd

    W = 10 * 60 * 1_000_000  # 10 minutes
    kw = dict(key="doc_id", ts="ts", spine_ts="as_of_ts",
              value_cols=["n_tok"], tiebreak="event_seq",
              range_windows={"w10m": (W, "n_tok")})
    got = engine.asof_join(
        rd.from_arrow(events_tbl).repartition(4),
        rd.from_arrow(spine_tbl).repartition(2), plan=split_plan, **kw,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    ref = engine.asof_join(
        rd.from_arrow(events_tbl), rd.from_arrow(spine_tbl),
        target_rows_per_part=10_000, sample_rate=1.0, min_parts=1, **kw,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["w10m_count"].to_numpy(),
                                  ref["w10m_count"].to_numpy())
    np.testing.assert_allclose(
        got["w10m_sum"].to_numpy(dtype="float64"),
        ref["w10m_sum"].to_numpy(dtype="float64"),
        rtol=1e-12, equal_nan=True)


def test_hot_split_subs_are_balanced(ray_session):
    """Sub-split boundaries must be REAL time quantiles of each hot
    entity, even though events arrive globally shuffled (regression: the
    per-batch lo/hi-only sample collapsed boundaries and one sub
    inherited nearly the whole entity — a 3.5M-row straggler at 24M)."""
    import ray.data as rd

    from featureengineer_ray.partition import (assign_partition_ids,
                                               plan_partitions)

    spec = GenSpec(n_rows=20_000, n_entities=40, zipf_a=1.4, seed=5)
    tbl = generate_events(spec)  # shuffled ingestion order
    ds = rd.from_arrow(tbl).repartition(8)
    budget = 600
    plan = plan_partitions(ds, "doc_id", "ts",
                           target_rows_per_part=budget, sample_rate=0.5,
                           split_hot_keys=True)
    assert plan.hot_splits
    tsv = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    pids = assign_partition_ids(tbl.column("doc_id"), plan, tsv)
    counts = np.bincount(pids, minlength=plan.n_parts)
    # every hot-split sub holds well under the pathological
    # whole-entity-in-one-sub regime: ≤ 3× the per-partition budget
    for k in plan.hot_splits:
        base = plan.hot[k]
        n_sub = len(plan.hot_splits[k]) + 1
        sub_counts = counts[base:base + n_sub]
        assert sub_counts.max() <= 3 * budget, (k, sub_counts)


def test_split_rolling_time(ray_session, events_tbl, split_plan):
    import ray.data as rd

    W = 10 * 60 * 1_000_000  # 10 minutes
    spec = engine.WindowSpec(key="doc_id", ts="ts", tiebreak="event_seq",
                             rolling_time={"n_tok": [W]})
    ds = rd.from_arrow(events_tbl)
    got = engine.window_features(ds, spec, plan=split_plan).to_pandas()
    got = got.sort_values(SORT, kind="stable").reset_index(drop=True)

    df = events_tbl.to_pandas()
    df["n_tok"] = df["n_tok"].astype("float64")
    # oracle is O(n^2) per entity; restrict to a manageable expectation
    exp = oracle.oracle_rolling_time(df, "doc_id", "ts", "n_tok", W,
                                     tiebreak="event_seq")
    exp = exp.sort_values(SORT, kind="stable").reset_index(drop=True)
    np.testing.assert_allclose(
        got[f"n_tok_troll_sum_{W}"].astype("float64").to_numpy(),
        exp["n_tok_troll_sum"].astype("float64").to_numpy(),
        rtol=1e-9, equal_nan=True)
    np.testing.assert_array_equal(
        got[f"n_tok_troll_count_{W}"].to_numpy().astype("int64"),
        exp["n_tok_troll_count"].to_numpy().astype("int64"))
