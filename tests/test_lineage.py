"""Resumable output: kill after k partitions, restart, equal result
(FIXTURES.md §5 'Resume')."""

import os

import pyarrow as pa
import shutil

import numpy as np
import pandas as pd
import pytest

from featureengineer_ray import engine, lineage
from featureengineer_ray.datagen import (
    GenSpec, SESSION_GAP_US, generate_events, generate_spine,
)

SPEC = GenSpec(n_rows=1500, n_entities=30, seed=31)


def _spec() -> engine.WindowSpec:
    return engine.WindowSpec(
        key="doc_id", ts="ts", tiebreak="event_seq",
        lags={"n_tok": [1, 2]}, rolling={"n_tok": [5]},
        session_gap_us=int(SESSION_GAP_US))


def _run(ray_session, out_dir, fail_pids=None):
    import ray.data as rd

    ev = rd.from_arrow(generate_events(SPEC)).repartition(4)
    sp = rd.from_arrow(generate_spine(SPEC)).repartition(2)
    return lineage.write_feature_stack(
        ev, sp, _spec(), out_dir, value_cols=["tokens", "n_tok", "event_seq"],
        fail_pids=fail_pids, target_rows_per_part=200, sample_rate=1.0,
        min_parts=6)


def _read_sorted(ray_session, out_dir) -> pd.DataFrame:
    df = lineage.read_output(out_dir).to_pandas()
    df = df.drop(columns=["tokens"]).sort_values("spine_id").reset_index(
        drop=True)
    return df


def test_resume_after_failure(ray_session, tmp_path):
    out_ok = str(tmp_path / "ok")
    out_resume = str(tmp_path / "resume")

    recs = _run(ray_session, out_ok)
    assert len(recs) > 3
    full = _read_sorted(ray_session, out_ok)

    # first attempt dies on some partitions
    all_pids = sorted(r["pid"] for r in recs)
    fail = all_pids[len(all_pids) // 2:]
    with pytest.raises(Exception):
        _run(ray_session, out_resume, fail_pids=fail)
    done_first = lineage.done_pids(out_resume)
    assert 0 < len(done_first) < len(all_pids)

    # restart without failure: only the missing partitions are computed
    recs2 = _run(ray_session, out_resume)
    done_after = lineage.done_pids(out_resume)
    assert done_after == set(all_pids)
    assert {r["pid"] for r in recs2} == set(all_pids) - done_first

    resumed = _read_sorted(ray_session, out_resume)
    pd.testing.assert_frame_equal(full, resumed)

    # manifest carries lineage fields
    man = lineage.load_manifest(out_resume)
    assert all({"pid", "rows", "input_rows", "wall_sec", "fingerprint"}
               <= set(r) for r in man)
    # plan pinned on disk for identical re-partitioning
    assert os.path.exists(os.path.join(out_resume, "plan.json"))


def test_rerun_is_noop(ray_session, tmp_path):
    out = str(tmp_path / "noop")
    recs = _run(ray_session, out)
    man1 = lineage.load_manifest(out)
    recs2 = _run(ray_session, out)
    assert recs2 == [] or all(r["rows"] == 0 for r in recs2)
    assert lineage.load_manifest(out) == man1


def test_incremental_map_processes_only_new_fragments(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from featureengineer_ray.lineage import (incremental_map,
                                             read_incremental_output)

    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()

    def write_frag(name, lo, hi):
        pq.write_table(pa.table({"x": pa.array(
            np.arange(lo, hi, dtype=np.int64))}), inp / name)

    def double(ds):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"y": pa.array(
                b.column("x").to_numpy(zero_copy_only=False) * 2)})

        return ds.map_batches(fn, batch_format="pyarrow")

    write_frag("a.parquet", 0, 100)
    write_frag("b.parquet", 100, 200)
    first = incremental_map(str(inp), str(out), double)
    assert len(first) == 2

    # re-run with no new input: nothing processed
    assert incremental_map(str(inp), str(out), double) == []

    # a third file lands: only it is processed
    write_frag("c.parquet", 200, 250)
    third = incremental_map(str(inp), str(out), double)
    assert len(third) == 1

    got = sorted(read_incremental_output(str(out)).to_pandas()["y"])
    assert got == [2 * i for i in range(250)]


def test_incremental_map_rewrite_supersedes_stale_output(
        ray_session, tmp_path):
    """An in-place rewrite of a fragment (same name, new content/mtime)
    must REPLACE its old output, not union with it: the output dir is
    keyed by fragment name and the content id lives in the marker
    (ADVICE r3: id-keyed dirs left the stale marker discoverable, so
    read_incremental_output double-counted the fragment)."""
    import pyarrow.parquet as pq

    from featureengineer_ray.lineage import (incremental_map,
                                             read_incremental_output)

    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()

    def double(ds):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"y": pa.array(
                b.column("x").to_numpy(zero_copy_only=False) * 2)})

        return ds.map_batches(fn, batch_format="pyarrow")

    pq.write_table(pa.table({"x": pa.array(
        np.arange(0, 100, dtype=np.int64))}), inp / "a.parquet")
    assert len(incremental_map(str(inp), str(out), double)) == 1

    # in-place rewrite: different rows, same file name
    pq.write_table(pa.table({"x": pa.array(
        np.arange(1000, 1050, dtype=np.int64))}), inp / "a.parquet")
    os.utime(inp / "a.parquet")  # ensure mtime_ns moves even on coarse fs
    assert len(incremental_map(str(inp), str(out), double)) == 1

    got = sorted(read_incremental_output(str(out)).to_pandas()["y"])
    assert got == [2 * i for i in range(1000, 1050)]  # old rows GONE

    # mtime-only touch (cp/rsync without timestamp preservation):
    # reprocessed, still exactly one copy in the output
    os.utime(inp / "a.parquet")
    assert len(incremental_map(str(inp), str(out), double)) == 1
    got = sorted(read_incremental_output(str(out)).to_pandas()["y"])
    assert got == [2 * i for i in range(1000, 1050)]


def test_incremental_map_recovers_from_crash_before_marker(
        ray_session, tmp_path):
    """Crash between the data-dir rename and the marker write must not
    poison the fragment: the re-run processes it again into a fresh
    uniquely-named dir (ADVICE r2: a fixed 'data' target raised
    ENOTEMPTY on every subsequent run)."""
    import pyarrow.parquet as pq

    from featureengineer_ray.lineage import (incremental_map,
                                             read_incremental_output)

    inp = tmp_path / "in"
    out = tmp_path / "out"
    inp.mkdir()
    pq.write_table(pa.table({"x": pa.array(np.arange(50, dtype=np.int64))}),
                   inp / "a.parquet")

    def double(ds):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({"y": pa.array(
                b.column("x").to_numpy(zero_copy_only=False) * 2)})

        return ds.map_batches(fn, batch_format="pyarrow")

    assert len(incremental_map(str(inp), str(out), double)) == 1
    # simulate the crash: delete the marker but keep the renamed data dir
    frag_dirs = [d for d in os.listdir(out) if d.startswith("frag=")]
    assert len(frag_dirs) == 1
    fdir = out / frag_dirs[0]
    os.remove(fdir / "_SUCCESS.json")
    assert any(d.startswith("data-") for d in os.listdir(fdir))

    # re-run: must succeed (no ENOTEMPTY) and produce a complete output
    redone = incremental_map(str(inp), str(out), double)
    assert len(redone) == 1
    got = sorted(read_incremental_output(str(out)).to_pandas()["y"])
    assert got == [2 * i for i in range(50)]


def test_read_incremental_output_empty_is_empty_dataset(
        ray_session, tmp_path):
    from featureengineer_ray.lineage import read_incremental_output

    out = tmp_path / "out"
    out.mkdir()
    ds = read_incremental_output(str(out))
    assert ds.count() == 0


def test_frag_id_detects_same_size_rewrite(tmp_path):
    """An in-place rewrite that keeps the byte size must change the
    fragment id (mtime_ns is part of the identity, ADVICE r2)."""
    import time as _time

    from featureengineer_ray.lineage import _frag_id

    p = tmp_path / "f.bin"
    p.write_bytes(b"a" * 64)
    fid1 = _frag_id(str(p))
    _time.sleep(0.002)  # ensure mtime_ns differs
    p.write_bytes(b"b" * 64)  # same size, new content
    assert _frag_id(str(p)) != fid1
