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


def test_pruned_payload_read_equals_in_memory(ray_session, tmp_path):
    """payload_paths (row-group-pruned attach read) must produce the
    SAME stack as the in-memory payload side, and on a selective spine
    the pre-pass must actually skip row groups."""
    import pyarrow.parquet as pq

    import ray.data as rd

    events = generate_events(SPEC)
    spine = generate_spine(SPEC)
    # write events as several small-row-group files so pruning has
    # granularity to work with
    paths = []
    n = events.num_rows
    cuts = np.linspace(0, n, 5).astype(int)
    for i in range(4):
        p = str(tmp_path / f"ev-{i}.parquet")
        pq.write_table(events.slice(cuts[i], cuts[i + 1] - cuts[i]), p,
                       row_group_size=150)
        paths.append(p)

    base = run_token_stack(
        rd.read_parquet(paths), rd.from_arrow(spine),
        target_rows_per_part=300, sample_rate=1.0, split_hot_keys=True,
        late_materialize=True,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    pruned = run_token_stack(
        rd.read_parquet(paths), rd.from_arrow(spine),
        target_rows_per_part=300, sample_rate=1.0, split_hot_keys=True,
        late_materialize=True, payload_paths=paths,
    ).to_pandas().sort_values("spine_id").reset_index(drop=True)
    assert len(pruned) == len(base) == spine.num_rows
    common = [c for c in base.columns if c in pruned.columns]
    _cmp(pruned[common], base[common], common)

    # selective spine (one entity) → most row groups have no matched
    # (key, seq): the pre-pass plan must skip them
    import ray

    from featureengineer_ray.hashing import Bloom, hash_str_array, mix64

    one = spine.to_pandas()
    one = one[one["doc_id"] == one["doc_id"].iloc[0]].head(3)
    sel = run_token_stack(
        rd.read_parquet(paths),
        rd.from_arrow(__import__("pyarrow").Table.from_pandas(
            one, preserve_index=False)),
        target_rows_per_part=300, sample_rate=1.0, split_hot_keys=False,
        late_materialize=True, payload_paths=paths,
    ).to_pandas()
    assert len(sel) == 3

    # direct pre-pass check: locator of the 3 matched rows hits only a
    # few of the ~15 row groups
    m = sel.dropna(subset=["event_seq"])
    bl = Bloom(max(len(m), 1))
    bl.add(mix64(hash_str_array(m["doc_id"].to_numpy()),
                 m["event_seq"].to_numpy().astype(np.int64)
                 .astype(np.uint64)))
    recs = engine.payload_rowgroup_hits(paths, ray.put(bl), "doc_id",
                                        "event_seq")
    n_hit = sum(1 for r in recs if r["n_hits"] > 0)
    assert len(recs) >= 10          # granularity exists
    assert n_hit < len(recs) // 2   # and most row groups are SKIPPED


def test_dense_probe_skips_prepass(ray_session, tmp_path):
    """When every sampled row group contains matches, the pruned reader
    must skip the hit-counting pre-pass and route ALL row groups through
    the direct per-row-group read — returning exactly the locator-matched
    rows (here: the full table)."""
    import pyarrow.parquet as pq

    import ray

    from featureengineer_ray.hashing import Bloom, hash_str_array, mix64

    events = generate_events(SPEC)
    p = str(tmp_path / "ev.parquet")
    pq.write_table(events, p, row_group_size=100)  # ~22 row groups

    df = events.to_pandas()
    bl = Bloom(len(df))
    bl.add(mix64(hash_str_array(df["doc_id"].to_numpy()),
                 df["event_seq"].to_numpy().astype(np.int64)
                 .astype(np.uint64)))
    marks = []
    cols = ["doc_id", "event_seq", "ts", "tokens"]
    out = engine._pruned_payload_read(
        [p], ray.put(bl), "doc_id", "event_seq", cols,
        mark=marks.append).to_pandas()
    assert any("dense workload" in m and "pre-pass skipped" in m
               for m in marks)
    assert not any("attach pre-pass" in m for m in marks)
    exp = df[cols].sort_values(["doc_id", "event_seq"]).reset_index(
        drop=True)
    got = out.sort_values(["doc_id", "event_seq"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["doc_id"].equals(exp["doc_id"])
    assert got["event_seq"].equals(exp["event_seq"])
    assert (got["ts"].to_numpy() == exp["ts"].to_numpy()).all()


def test_route_attach_equals_exchange_attach(ray_session, tmp_path,
                                             monkeypatch):
    """The provenance-routed attach (default with payload_paths: payload
    bytes never exchange) must produce exactly the exchange attach's
    stack, including null payloads for unmatched spine rows."""
    import pyarrow.parquet as pq

    import ray.data as rd

    events = generate_events(SPEC)
    spine = generate_spine(SPEC)
    paths = []
    n = events.num_rows
    cuts = np.linspace(0, n, 4).astype(int)
    for i in range(3):
        p = str(tmp_path / f"ev-{i}.parquet")
        pq.write_table(events.slice(cuts[i], cuts[i + 1] - cuts[i]), p,
                       row_group_size=200)
        paths.append(p)

    kw = dict(target_rows_per_part=300, sample_rate=1.0,
              split_hot_keys=True, late_materialize=True,
              payload_paths=paths)
    monkeypatch.setenv("FE_ATTACH_MODE", "route")
    routed = run_token_stack(rd.read_parquet(paths), rd.from_arrow(spine),
                             **kw).to_pandas()
    routed = routed.sort_values("spine_id").reset_index(drop=True)
    monkeypatch.setenv("FE_ATTACH_MODE", "exchange")
    exch = run_token_stack(rd.read_parquet(paths), rd.from_arrow(spine),
                           **kw).to_pandas()
    exch = exch.sort_values("spine_id").reset_index(drop=True)

    assert len(routed) == len(exch) == spine.num_rows
    assert set(routed.columns) == set(exch.columns)
    assert "__src_rg" not in routed.columns
    _cmp(routed[sorted(exch.columns)], exch[sorted(exch.columns)],
         sorted(exch.columns))


def test_route_attach_selective_spine(ray_session, tmp_path, monkeypatch):
    """On a spine matching a single entity, the provenance-routed attach
    must still equal the exchange attach — most result rows route to the
    few row groups holding that entity; absent-entity rows take the
    null-payload passthrough group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    events = generate_events(SPEC)
    spine = generate_spine(SPEC).to_pandas()
    one = spine[spine["doc_id"] == spine["doc_id"].iloc[0]].head(5)
    # plus rows for an entity that does not exist at all
    ghost = one.copy()
    ghost["doc_id"] = "doc-none"
    ghost["spine_id"] = ghost["spine_id"] + 10_000
    sel = pa.Table.from_pandas(
        __import__("pandas").concat([one, ghost], ignore_index=True),
        preserve_index=False)

    paths = []
    n = events.num_rows
    cuts = np.linspace(0, n, 4).astype(int)
    for i in range(3):
        p = str(tmp_path / f"ev-{i}.parquet")
        pq.write_table(events.slice(cuts[i], cuts[i + 1] - cuts[i]), p,
                       row_group_size=150)
        paths.append(p)

    kw = dict(target_rows_per_part=300, sample_rate=1.0,
              split_hot_keys=False, late_materialize=True,
              payload_paths=paths)
    monkeypatch.setenv("FE_ATTACH_MODE", "route")
    routed = run_token_stack(rd.read_parquet(paths), rd.from_arrow(sel),
                             **kw).to_pandas()
    routed = routed.sort_values("spine_id").reset_index(drop=True)
    monkeypatch.setenv("FE_ATTACH_MODE", "exchange")
    exch = run_token_stack(rd.read_parquet(paths), rd.from_arrow(sel),
                           **kw).to_pandas()
    exch = exch.sort_values("spine_id").reset_index(drop=True)

    assert len(routed) == len(exch) == sel.num_rows
    # ghost-entity rows got NULL payloads on both paths
    assert routed.loc[routed["doc_id"] == "doc-none", "tokens"].isna().all()
    _cmp(routed[sorted(exch.columns)], exch[sorted(exch.columns)],
         sorted(exch.columns))
