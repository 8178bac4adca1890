"""Per-partition lineage checkpointing + resumable output.

The reference's de-facto checkpoint system is an HDF5 artifact per stage
with lazy reload (``IVector.py:1059-1060``, per-iteration ``T_*_it-{i}.h5``
saves, and the failed-file retry list ``FeaGet.py:116-144``). The engine
formalizes that as **per-partition lineage** (north rule):

- Output layout: ``out_dir/part=<pid>/data.parquet`` — one directory per
  partition of THE plan, written atomically (tmp file + rename) by the
  same task that computed the partition.
- Lineage record: ``out_dir/part=<pid>/_SUCCESS.json`` holds partition id,
  row count, input row count, wall time, and a content fingerprint.
  Marker-per-partition (not a shared manifest file) means concurrent
  writers never contend.
- Plan pinning: ``out_dir/plan.json`` stores the PartitionPlan; a resumed
  run reuses it verbatim so partition boundaries are identical.
- Resume: completed pids are loaded from the markers and **filtered out
  before the shuffle** — a restarted run re-reads the input but moves and
  computes only the unfinished partitions, i.e. it resumes mid-shuffle.

``write_feature_stack`` is the resumable flagship sink; ``load_manifest``
summarizes lineage for inspection.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import engine
from .partition import PartitionPlan, plan_partitions


def _part_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part={pid:05d}")


def _marker(out_dir: str, pid: int) -> str:
    return os.path.join(_part_dir(out_dir, pid), "_SUCCESS.json")


def done_pids(out_dir: str) -> set[int]:
    out = set()
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if name.startswith("part="):
            pid = int(name.split("=")[1])
            if os.path.exists(_marker(out_dir, pid)):
                out.add(pid)
    return out


def load_manifest(out_dir: str) -> list[dict]:
    recs = []
    for pid in sorted(done_pids(out_dir)):
        with open(_marker(out_dir, pid)) as f:
            recs.append(json.load(f))
    return recs


def _load_or_save_plan(out_dir: str, plan: PartitionPlan) -> PartitionPlan:
    path = os.path.join(out_dir, "plan.json")
    if os.path.exists(path):
        with open(path) as f:
            return PartitionPlan.from_json(json.load(f))
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(plan.to_json(), f)
    os.replace(tmp, path)
    return plan


def _fingerprint(tbl: pa.Table) -> int:
    """Order-insensitive lightweight content fingerprint (xor of row-wise
    mixed hashes over the integer columns + row count)."""
    from .hashing import mix64

    acc = np.uint64(tbl.num_rows)
    for name in tbl.column_names:
        col = tbl.column(name)
        t = col.type
        if pa.types.is_integer(t) or pa.types.is_timestamp(t):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = col.cast(pa.int64()).fill_null(0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            if len(v):
                with np.errstate(over="ignore"):
                    acc ^= np.bitwise_xor.reduce(mix64(v.view(np.uint64)))
    v = int(acc)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed for Arrow int64


class _PartitionWriter:
    """Wraps a per-partition kernel: computes, writes the partition's
    parquet atomically, records lineage, and emits only a manifest row."""

    def __init__(self, kern, out_dir: str, fail_pids: list[int] | None = None):
        self.kern = kern
        self.out_dir = out_dir
        self.fail_pids = set(fail_pids or [])  # test hook: crash injection

    def __call__(self, block: pa.Table) -> pa.Table:
        pids = (block.column(engine.PART_COL).to_numpy(zero_copy_only=False)
                if block.num_rows else np.zeros(0, dtype=np.int64))
        recs = {"pid": [], "rows": [], "input_rows": [], "wall_sec": [],
                "fingerprint": []}
        for pid in np.unique(pids):
            pid = int(pid)
            if pid in self.fail_pids:
                raise RuntimeError(f"injected failure at partition {pid}")
            if os.path.exists(_marker(self.out_dir, pid)):
                continue  # another attempt already finished this partition
            sub = block.filter(pa.array(pids == pid))
            t0 = time.time()
            out = self.kern(sub)
            pdir = _part_dir(self.out_dir, pid)
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, f".tmp.{uuid.uuid4().hex[:8]}.parquet")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(pdir, "data.parquet"))
            fp = _fingerprint(out)
            rec = {
                "pid": pid, "rows": out.num_rows, "input_rows": sub.num_rows,
                "wall_sec": round(time.time() - t0, 4), "fingerprint": fp,
            }
            mtmp = _marker(self.out_dir, pid) + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(mtmp, "w") as f:
                json.dump(rec, f)
            os.replace(mtmp, _marker(self.out_dir, pid))
            for k in recs:
                recs[k].append(rec[k])
        return pa.table({k: pa.array(v) for k, v in recs.items()})


def write_feature_stack(
    events,
    spine,
    spec: engine.WindowSpec,
    out_dir: str,
    *,
    value_cols: list[str],
    tolerance_us: int | None = None,
    dedup: bool = True,
    plan: PartitionPlan | None = None,
    fail_pids: list[int] | None = None,
    **plan_kwargs,
) -> list[dict]:
    """Resumable flagship run: feature stack → partitioned parquet.

    Returns the manifest records of THIS run's newly completed partitions;
    already-completed partitions are skipped before the shuffle.
    """
    if spec.leads or spec.bfill:
        raise ValueError("leaky spec (leads/bfill) rejected for as-of output")
    plan = engine._ensure_plan(events, spec.key, spec.ts, plan, **plan_kwargs)
    plan = _load_or_save_plan(out_dir, plan)
    skip = sorted(done_pids(out_dir))

    # same zero-leakage exclusions as engine.feature_stack: retrospective
    # session_len and entity-global {col}_z never cross the as-of boundary
    leaky = ("session_len",) + tuple(f"{c}_z" for c in spec.zscore)
    tagged, kern, plan = engine._build_asof(
        events, spine, key=spec.key, ts=spec.ts, spine_ts="as_of_ts",
        value_cols=value_cols, tolerance_us=tolerance_us,
        tiebreak=spec.tiebreak, dedup=dedup, spec=spec, plan=plan,
        exclude_feats=leaky)
    if skip:
        skip_arr = np.array(skip, dtype=np.int64)

        def drop_done(batch: pa.Table) -> pa.Table:
            pids = batch.column(engine.PART_COL).to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(pids, skip_arr)))

        tagged = tagged.map_batches(drop_done, batch_format="pyarrow",
                                    zero_copy_batch=True)

    writer = _PartitionWriter(kern, out_dir, fail_pids=fail_pids)

    def write_kernel(block: pa.Table) -> pa.Table:
        return writer(block)

    manifest_ds = engine._exchange_by_part(tagged, plan, write_kernel)
    return manifest_ds.to_pandas().to_dict("records")


def read_output(out_dir: str):
    """Read the partitioned output back as a Dataset (done partitions)."""
    import ray.data as rd

    paths = [os.path.join(_part_dir(out_dir, pid), "data.parquet")
             for pid in sorted(done_pids(out_dir))]
    return rd.read_parquet(paths)


# --------------------------------------------------------------------------
# incremental ingest: process only input fragments not yet marked done
# --------------------------------------------------------------------------
def _frag_id(path: str) -> str:
    """Stable fragment identity: name + byte size + mtime_ns. The mtime
    component catches in-place rewrites that keep the byte size (e.g.
    fixed-width re-exports) — without it such a rewrite would be silently
    treated as already processed (ADVICE r2)."""
    from .hashing import hash_str

    st = os.stat(path)
    ident = f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"
    return f"{hash_str(ident):016x}"


def incremental_map(input_dir: str, out_dir: str, fn, *,
                    pattern: str = ".parquet"):
    """Append-only incremental processing (the reference's
    failed/missing-file re-drive, ``FeaGet.py:116-144``, generalized):
    each input fragment is processed through ``fn(Dataset) -> Dataset``
    exactly once; a re-run after new files land processes ONLY the new
    fragments. Marker-per-fragment (``out_dir/frag=<id>/_SUCCESS.json``,
    atomic tmp+rename) — concurrent or repeated runs never contend and
    never double-process.

    Each fragment's pipeline is internally parallel (Ray Data splits the
    fragment into blocks); fragments are driven sequentially so a crash
    loses at most one fragment's work. Returns the list of fragment ids
    processed THIS run.
    """
    os.makedirs(out_dir, exist_ok=True)
    import ray.data as rd

    frags = sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.endswith(pattern))
    done_now = []
    for path in frags:
        fid = _frag_id(path)
        # Output dir keyed by the fragment NAME, not the content id: an
        # in-place rewrite (same name, new bytes/mtime) must SUPERSEDE the
        # old output, not sit next to it. With id-keyed dirs the stale
        # frag=<oldid> dir kept its marker and read_incremental_output
        # unioned both old and new rows (ADVICE r3). The content id lives
        # INSIDE the marker; a mismatch triggers reprocessing and an
        # atomic marker replacement, after which only the new data_dir is
        # followed (the stale attempt dir is best-effort deleted).
        fdir = os.path.join(out_dir, f"frag={os.path.basename(path)}")
        marker = os.path.join(fdir, "_SUCCESS.json")
        stale_dir = None
        if os.path.exists(marker):
            with open(marker) as f:
                prev = json.load(f)
            if prev.get("frag_id") == fid:
                continue
            stale_dir = os.path.join(fdir, prev.get("data_dir", "data"))
        t0 = time.monotonic()
        out_ds = fn(rd.read_parquet(path))
        os.makedirs(fdir, exist_ok=True)
        # distributed sink into a tmp dir, then ONE atomic dir rename —
        # the fragment's output never funnels through the driver. The
        # final dir name is UNIQUE per attempt and recorded in the
        # marker: a crash between the rename and the marker write (or a
        # concurrent run on the same new fragment) leaves an orphan dir
        # but can never collide — a fixed "data" target made every
        # post-crash re-run fail with ENOTEMPTY (ADVICE r2). The marker
        # is the single atomic commit point; readers follow it.
        attempt = uuid.uuid4().hex
        tmp_dir = os.path.join(fdir, f".tmp-{attempt}")
        out_ds.write_parquet(tmp_dir)
        rows_out = sum(
            pq.read_metadata(os.path.join(tmp_dir, f)).num_rows
            for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
        data_name = f"data-{attempt}"
        os.replace(tmp_dir, os.path.join(fdir, data_name))
        rec = {"fragment": os.path.basename(path), "frag_id": fid,
               "rows_out": rows_out, "data_dir": data_name,
               "wall_s": round(time.monotonic() - t0, 3)}
        mtmp = marker + f".tmp-{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            json.dump(rec, f)
        os.replace(mtmp, marker)
        if stale_dir is not None and os.path.isdir(stale_dir):
            import shutil

            shutil.rmtree(stale_dir, ignore_errors=True)
        done_now.append(fid)
    return done_now


def read_incremental_output(out_dir: str):
    """All successfully processed fragments' outputs as one Dataset.

    Follows each marker's recorded ``data_dir`` (unique-per-attempt;
    legacy markers fall back to ``data``). With no completed fragment it
    returns an EMPTY dataset instead of raising (ADVICE r2)."""
    import ray.data as rd

    paths = []
    for d in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        marker = os.path.join(out_dir, d, "_SUCCESS.json")
        if d.startswith("frag=") and os.path.exists(marker):
            with open(marker) as f:
                rec = json.load(f)
            ddir = os.path.join(out_dir, d, rec.get("data_dir", "data"))
            paths.extend(os.path.join(ddir, f)
                         for f in sorted(os.listdir(ddir))
                         if f.endswith(".parquet"))
    if not paths:
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths)
