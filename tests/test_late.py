"""Late materialization must equal the eager feature stack exactly —
including token payloads matched from sub-split context rows."""

import numpy as np
import pandas as pd
import pytest

from featureengineer_ray import engine
from featureengineer_ray.datagen import (
    GenSpec, SESSION_GAP_US, generate_events, generate_spine,
)
from featureengineer_ray.partition import plan_partitions
from featureengineer_ray.pipelines import run_token_stack

SPEC = GenSpec(n_rows=2200, n_entities=14, zipf_a=1.4, seed=77)


def _cmp(a: pd.DataFrame, b: pd.DataFrame, cols):
    for col in cols:
        if col == "tokens":
            for i in range(len(a)):
                g, e = a[col].iloc[i], b[col].iloc[i]
                if e is None or (isinstance(e, float) and pd.isna(e)):
                    assert g is None or (isinstance(g, float) and pd.isna(g))
                else:
                    assert list(g) == list(e), f"tokens row {i}"
        elif a[col].dtype == object:
            assert a[col].astype(str).equals(b[col].astype(str)), col
        else:
            np.testing.assert_allclose(
                a[col].to_numpy(dtype="float64"),
                b[col].to_numpy(dtype="float64"),
                rtol=0, atol=0, equal_nan=True, err_msg=col)


def test_late_equals_eager_with_splits(ray_session):
    import ray.data as rd

    events = generate_events(SPEC)
    spine = generate_spine(SPEC)
    ev = rd.from_arrow(events)
    plan = plan_partitions(ev, "doc_id", "ts", target_rows_per_part=150,
                           sample_rate=1.0, hot_factor=1.0,
                           split_hot_keys=True)
    assert plan.hot_splits

    late = run_token_stack(
        rd.from_arrow(events), rd.from_arrow(spine), plan=plan,
        late_materialize=True,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    eager = run_token_stack(
        rd.from_arrow(events), rd.from_arrow(spine), plan=plan,
        late_materialize=False,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)

    assert len(late) == len(eager) == spine.num_rows
    common = [c for c in eager.columns if c in late.columns]
    assert set(eager.columns) <= set(late.columns), \
        set(eager.columns) - set(late.columns)
    _cmp(late[common], eager[common], common)
    # payload present exactly where a match exists
    assert late["tokens"].isna().equals(eager["tokens"].isna())


def test_late_equals_eager_unsplit(ray_session):
    import ray.data as rd

    spec2 = GenSpec(n_rows=1200, n_entities=40, seed=3)
    events = generate_events(spec2)
    spine = generate_spine(spec2)
    late = run_token_stack(
        rd.from_arrow(events), rd.from_arrow(spine),
        target_rows_per_part=400, sample_rate=1.0, min_parts=4,
        split_hot_keys=False, late_materialize=True,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    eager = run_token_stack(
        rd.from_arrow(events), rd.from_arrow(spine),
        target_rows_per_part=400, sample_rate=1.0, min_parts=4,
        split_hot_keys=False, late_materialize=False,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    common = [c for c in eager.columns if c in late.columns]
    _cmp(late[common], eager[common], common)
