"""Engine ↔ oracle conformance through real Ray Data pipelines."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import engine, oracle
from featureengineer_ray.datagen import (
    GenSpec, SESSION_GAP_US, generate_events, generate_spine,
)

SPEC = GenSpec(n_rows=3000, n_entities=60, seed=11)
SORT_COLS = ["doc_id", "ts", "event_seq"]


@pytest.fixture(scope="module")
def events_tbl():
    return generate_events(SPEC)


@pytest.fixture(scope="module")
def spine_tbl():
    return generate_spine(SPEC)


@pytest.fixture(scope="module")
def events_ds(ray_session, events_tbl):
    import ray.data as rd

    return rd.from_arrow(events_tbl).repartition(7)


@pytest.fixture(scope="module")
def spine_ds(ray_session, spine_tbl):
    import ray.data as rd

    return rd.from_arrow(spine_tbl).repartition(3)


def _plan_kwargs():
    # small target so the test actually exercises multiple partitions
    return dict(target_rows_per_part=400, sample_rate=1.0, min_parts=4)


def _sorted_pdf(obj) -> pd.DataFrame:
    df = obj.to_pandas() if not isinstance(obj, pd.DataFrame) else obj
    return df.sort_values(SORT_COLS, kind="stable").reset_index(drop=True)


def test_window_features_vs_oracle(events_ds, events_tbl):
    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2, 3]}, leads={"n_tok": [1]},
        rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US),
        zscore=["n_tok"],
    )
    got = engine.window_features(events_ds, spec, **_plan_kwargs()).to_pandas()
    assert len(got) == events_tbl.num_rows
    got = _sorted_pdf(got)

    df = events_tbl.to_pandas()
    df["n_tok"] = df["n_tok"].astype("float64")
    exp = oracle.oracle_lag_lead(df, "doc_id", "ts", "n_tok", [1, 2, 3], [1],
                                 tiebreak="event_seq")
    exp = oracle.oracle_rolling_rows(exp, "doc_id", "ts", "n_tok", 5,
                                     tiebreak="event_seq")
    exp = oracle.oracle_sessionize(exp, "doc_id", "ts", int(SESSION_GAP_US),
                                   tiebreak="event_seq")
    exp = oracle.oracle_zscore(exp, "doc_id", "n_tok")
    exp = _sorted_pdf(exp)

    for col in ["n_tok_lag_1", "n_tok_lag_2", "n_tok_lag_3", "n_tok_lead_1",
                "n_tok_roll_mean_5", "n_tok_roll_std_5", "n_tok_roll_sum_5",
                "n_tok_roll_min_5", "n_tok_roll_max_5", "n_tok_z"]:
        np.testing.assert_allclose(
            got[col].astype("float64").to_numpy(),
            exp[col].astype("float64").to_numpy(),
            rtol=1e-9, equal_nan=True, err_msg=col)
    for col in ["session_idx", "session_event_idx", "session_len"]:
        np.testing.assert_array_equal(
            got[col].to_numpy().astype("int64"),
            exp[col].to_numpy().astype("int64"), err_msg=col)


def test_asof_join_vs_oracle(events_ds, spine_ds, events_tbl, spine_tbl):
    got = engine.asof_join(
        events_ds, spine_ds, key="doc_id", ts="ts",
        value_cols=["n_tok", "event_seq", "tokens", "ts"],
        tiebreak="event_seq", **_plan_kwargs(),
    ).to_pandas()
    got = got.sort_values("spine_id", kind="stable").reset_index(drop=True)

    df = events_tbl.to_pandas()
    sp = spine_tbl.to_pandas()
    exp = oracle.oracle_asof_join(
        sp, df, key="doc_id", ts="ts", as_of_ts="as_of_ts",
        value_cols=["n_tok", "event_seq", "tokens"], tiebreak="event_seq")
    exp = exp.sort_values("spine_id", kind="stable").reset_index(drop=True)

    assert len(got) == len(sp)
    for col in ["n_tok", "event_seq"]:
        np.testing.assert_allclose(
            got[col].astype("float64").to_numpy(),
            exp[col].astype("float64").to_numpy(),
            rtol=1e-9, equal_nan=True, err_msg=col)
    def ts_ns(s: pd.Series) -> np.ndarray:
        s = pd.to_datetime(s).astype("datetime64[ns]")
        v = s.astype("int64").to_numpy().astype("float64")
        v[s.isna().to_numpy()] = np.nan
        return v

    np.testing.assert_allclose(
        ts_ns(got["matched_ts"]), ts_ns(exp["matched_ts"]), equal_nan=True)
    # token-array equality at every matched spine row
    for i in range(len(got)):
        g, e = got["tokens"].iloc[i], exp["tokens"].iloc[i]
        if e is None or (isinstance(e, float) and pd.isna(e)):
            assert g is None or (isinstance(g, float) and pd.isna(g))
        else:
            assert list(g) == list(e)


def test_asof_tolerance_and_dedup(events_ds, spine_ds, events_tbl, spine_tbl):
    tol = 120_000_000
    got = engine.asof_join(
        events_ds, spine_ds, key="doc_id", ts="ts",
        value_cols=["n_tok"], tolerance_us=tol, tiebreak="event_seq",
        dedup=True, **_plan_kwargs(),
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    exp = oracle.oracle_asof_join(
        spine_tbl.to_pandas(), events_tbl.to_pandas(), key="doc_id", ts="ts",
        as_of_ts="as_of_ts", value_cols=["n_tok"],
        tolerance=pd.Timedelta(tol, unit="us"), tiebreak="event_seq",
    ).sort_values("spine_id").reset_index(drop=True)
    np.testing.assert_allclose(
        got["n_tok"].astype("float64").to_numpy(),
        exp["n_tok"].astype("float64").to_numpy(), rtol=1e-9, equal_nan=True)


def test_feature_stack_flagship(events_ds, spine_ds, events_tbl, spine_tbl):
    """FIXTURES.md §4: the full output contract at each entity×timestamp."""
    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2, 3]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US),
    )
    got = engine.feature_stack(
        events_ds, spine_ds, spec,
        value_cols=["tokens", "n_tok", "event_seq"], **_plan_kwargs(),
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)

    df = events_tbl.to_pandas()
    df["n_tok"] = df["n_tok"].astype("float64")
    feat = oracle.oracle_lag_lead(df, "doc_id", "ts", "n_tok", [1, 2, 3], [],
                                  tiebreak="event_seq")
    feat = oracle.oracle_rolling_rows(feat, "doc_id", "ts", "n_tok", 5,
                                      tiebreak="event_seq")
    feat = oracle.oracle_sessionize(feat, "doc_id", "ts", int(SESSION_GAP_US),
                                    tiebreak="event_seq")
    exp = oracle.oracle_asof_join(
        spine_tbl.to_pandas(), feat, key="doc_id", ts="ts",
        as_of_ts="as_of_ts",
        value_cols=["tokens", "n_tok", "event_seq", "n_tok_lag_1",
                    "n_tok_roll_mean_5", "n_tok_roll_std_5", "session_idx",
                    "session_event_idx"],
        tiebreak="event_seq",
    ).sort_values("spine_id").reset_index(drop=True)

    assert len(got) == len(exp)
    # session_len is deliberately absent: it counts future events of the
    # session and is excluded from as-of outputs (leakage rule)
    assert "session_len" not in got.columns
    for col in ["n_tok", "event_seq", "n_tok_lag_1", "n_tok_roll_mean_5",
                "n_tok_roll_std_5", "session_idx", "session_event_idx"]:
        np.testing.assert_allclose(
            got[col].astype("float64").to_numpy(),
            exp[col].astype("float64").to_numpy(),
            rtol=1e-9, equal_nan=True, err_msg=col)
    for i in range(0, len(got), 13):
        g, e = got["tokens"].iloc[i], exp["tokens"].iloc[i]
        if e is None or (isinstance(e, float) and pd.isna(e)):
            assert g is None or (isinstance(g, float) and pd.isna(g))
        else:
            assert list(g) == list(e)


def test_feature_stack_rejects_leaky_spec(events_ds, spine_ds):
    spec = engine.WindowSpec(key="doc_id", ts="ts", leads={"n_tok": [1]})
    with pytest.raises(ValueError, match="leakage"):
        engine.feature_stack(events_ds, spine_ds, spec, value_cols=["n_tok"])


def test_determinism_across_parallelism(ray_session, events_tbl, spine_tbl):
    """num_cpus is fixed per session, but block layout isn't: run the same
    stack at very different partitionings/block counts → identical output."""
    import ray.data as rd

    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US),
    )
    outs = []
    for nblocks, tgt in ((2, 3000), (13, 150)):
        ev = rd.from_arrow(events_tbl).repartition(nblocks)
        sp = rd.from_arrow(spine_tbl).repartition(max(1, nblocks // 2))
        out = engine.feature_stack(
            ev, sp, spec, value_cols=["n_tok", "event_seq"],
            target_rows_per_part=tgt, sample_rate=1.0, min_parts=1,
        ).to_pandas().sort_values("spine_id").reset_index(drop=True)
        outs.append(out)
    a, b = outs
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype == object:
            assert av.astype(str).equals(bv.astype(str)), col
        else:
            np.testing.assert_allclose(
                av.to_numpy(dtype="float64"), bv.to_numpy(dtype="float64"),
                rtol=0, atol=0, equal_nan=True, err_msg=col)


def test_feature_stack_empty_events(ray_session, spine_tbl):
    """No events at all: every spine row emits with null payload/features."""
    import ray.data as rd

    spec = engine.WindowSpec(key="doc_id", ts="ts", tiebreak="event_seq",
                             lags={"n_tok": [1]})
    empty = generate_events(SPEC).slice(0, 0)
    out = engine.feature_stack(
        rd.from_arrow(empty), rd.from_arrow(spine_tbl), spec,
        value_cols=["n_tok"], **_plan_kwargs()).to_pandas()
    assert len(out) == spine_tbl.num_rows
    assert out["n_tok"].isna().all()


def test_feature_stack_empty_spine(ray_session, events_tbl):
    """No spine rows: output is empty but the pipeline must not crash."""
    import ray.data as rd

    spec = engine.WindowSpec(key="doc_id", ts="ts", tiebreak="event_seq",
                             lags={"n_tok": [1]})
    out = engine.feature_stack(
        rd.from_arrow(events_tbl),
        rd.from_arrow(generate_spine(SPEC).slice(0, 0)), spec,
        value_cols=["n_tok"], **_plan_kwargs()).to_pandas()
    assert len(out) == 0


def test_window_features_single_row_entities(ray_session):
    """One event per entity: lags are null, rolling count is 1."""
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(["a", "b", "c"]),
        "ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                       type=pa.timestamp("us")),
        "event_seq": pa.array([0, 0, 0], type=pa.int64()),
        "n_tok": pa.array([1.0, 2.0, 3.0]),
    })
    spec = engine.WindowSpec(key="doc_id", ts="ts", tiebreak="event_seq",
                             lags={"n_tok": [1]}, rolling={"n_tok": [3]})
    out = engine.window_features(
        rd.from_arrow(t), spec, **_plan_kwargs()).to_pandas()
    assert len(out) == 3
    assert out["n_tok_lag_1"].isna().all()
    assert (out["n_tok_roll_count_3"] == 1.0).all()
