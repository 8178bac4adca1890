"""Zero temporal leakage (FIXTURES.md §5): no output value may change when
all events with ts > as_of_ts are deleted from the input — the engine
analog of the reference's cep[start:stop] cut (IVector.py:797-800)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import engine
from featureengineer_ray.datagen import (
    GenSpec, SESSION_GAP_US, generate_events, generate_spine,
)

SPEC = GenSpec(n_rows=1200, n_entities=25, seed=47)


def _stack(ray_session, events_tbl, spine_tbl):
    import ray.data as rd

    spec = engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2, 3]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US),
        zscore=["n_tok"], expanding_zscore=["n_tok"])
    return engine.feature_stack(
        rd.from_arrow(events_tbl), rd.from_arrow(spine_tbl), spec,
        value_cols=["tokens", "n_tok", "event_seq"],
        target_rows_per_part=300, sample_rate=1.0, min_parts=4,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)


def test_zero_temporal_leakage(ray_session):
    """Per-spine-row check against a future-truncated input.

    Only columns emitted by feature_stack are compared — and feature_stack
    structurally refuses lead/bfill columns, so every emitted column must
    be invariant to deleting the future."""
    events = generate_events(SPEC)
    spine = generate_spine(SPEC)
    full = _stack(None, events, spine)

    # global cut: keep a prefix of time, and only spine rows before the cut
    cut = int(np.quantile(
        events.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False),
        0.6))
    ev_trunc = events.filter(
        pa.compute.less_equal(events.column("ts").cast(pa.int64()),
                              pa.scalar(cut)))
    sp_keep = spine.filter(
        pa.compute.less_equal(spine.column("as_of_ts").cast(pa.int64()),
                              pa.scalar(cut)))
    assert sp_keep.num_rows > 100
    trunc = _stack(None, ev_trunc, sp_keep)

    sub = full[full["as_of_ts"].astype("datetime64[us]").astype("int64")
               <= cut].reset_index(drop=True)
    sub = sub.sort_values("spine_id").reset_index(drop=True)
    trunc = trunc.sort_values("spine_id").reset_index(drop=True)
    assert len(sub) == len(trunc)
    for col in full.columns:
        if col == "tokens":
            for i in range(len(sub)):
                g, e = sub[col].iloc[i], trunc[col].iloc[i]
                if e is None or (isinstance(e, float) and pd.isna(e)):
                    assert g is None or (isinstance(g, float) and pd.isna(g))
                else:
                    assert list(g) == list(e)
        elif sub[col].dtype == object:
            assert sub[col].astype(str).equals(trunc[col].astype(str)), col
        else:
            np.testing.assert_allclose(
                sub[col].to_numpy(dtype="float64"),
                trunc[col].to_numpy(dtype="float64"),
                rtol=0, atol=0, equal_nan=True, err_msg=col)


def test_session_len_excluded_from_asof(ray_session):
    """Retrospective columns must not appear in feature_stack outputs:
    session_len (FULL session size counts events after the as-of point;
    session_event_idx is the non-leaky 'session length so far') and
    {col}_z (entity-GLOBAL moments include future events; {col}_ez is the
    non-leaky trailing z) — ADVICE r01 high finding."""
    events = generate_events(SPEC)
    spine = generate_spine(SPEC)
    out = _stack(None, events, spine)
    assert "session_len" not in out.columns
    assert "session_event_idx" in out.columns and "session_idx" in out.columns
    assert "n_tok_z" not in out.columns
    assert "n_tok_ez" in out.columns


def test_no_unbounded_driver_pull_in_queries():
    """VERDICT r3 #1 regression guard: no query may chain a raw table
    read straight into a driver materialization — that class is O(corpus
    rows) through the driver. Bounded pulls (row-filtered pq reads,
    post-aggregate results) don't match the pattern."""
    import pathlib
    import re

    from featureengineer_ray import queries

    src = pathlib.Path(queries.__file__).read_text()
    assert not re.search(r"_read\([^)]*\)\s*\.to_pandas\(\)", src)
    assert not re.search(r"_read\([^)]*\)\s*\.take_all\(\)", src)
