"""Range-partition planning with explicit skew handling.

The engine's wide operators (as-of join, windowed feature stack, grouped
aggregates) all reuse ONE partitioning: entities are assigned to partitions
by quantile ranges of their 64-bit key hash, so each partition holds complete
entities and partitions are load-balanced even under Zipf-skewed keys
(SURVEY.md §4 "skew/stragglers — needs design"; the reference's static
``array_split`` sharding, ``mpiIV.py:403-405``, silently assumes uniform
cost).

Plan construction is a single sampling pass over the key (+ts) columns:

1. ``map_batches`` samples rows deterministically (``mix64(key_hash, ts) %
   M < p·M``) and pre-aggregates per-batch ``(key, count, min_ts, max_ts)``
   partials — entities ≪ rows, so partials are tiny.
2. The driver combines partials (they are small by construction), estimates
   total rows, picks the partition count, computes weighted quantile
   boundaries over hash space, and isolates **hot keys** (estimated row share
   > ``hot_factor`` × the per-partition budget) into dedicated partitions.
3. Optionally, hot entities larger than one partition budget are
   **sub-split into time-contiguous ranges** by sampled ts quantiles; the
   windowed kernels then receive ``C`` rows of trailing context per
   sub-boundary (see engine.py) so per-entity window semantics survive the
   split.

The plan is a small, JSON-serializable object: it is broadcast into the
assignment ``map_batches`` closure and recorded in the lineage manifest so a
resumed run reuses the identical partitioning (lineage, SURVEY.md §7.3
step 7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .hashing import hash_str, hash_str_array, mix64

_MOD = np.uint64(1 << 32)


@dataclass
class PartitionPlan:
    key: str
    n_parts: int                       # total partitions incl. hot/sub parts
    boundaries: list[int]              # sorted upper bounds in hash space (len n_range-1)
    n_range: int                       # number of range partitions [0..n_range)
    hot: dict[str, int] = field(default_factory=dict)      # key -> partition id
    hot_splits: dict[str, list[int]] = field(default_factory=dict)
    # key -> ts quantile bounds (µs, len = n_subparts-1); sub-partition ids are
    # contiguous starting at hot[key]
    est_rows: int = 0
    sample_rate: float = 1.0
    seed: int = 0

    def to_json(self) -> dict:
        return {
            "key": self.key, "n_parts": self.n_parts,
            "boundaries": [int(b) for b in self.boundaries],
            "n_range": self.n_range, "hot": self.hot,
            "hot_splits": {k: [int(v) for v in vs] for k, vs in self.hot_splits.items()},
            "est_rows": int(self.est_rows), "sample_rate": self.sample_rate,
            "seed": self.seed,
        }

    @classmethod
    def from_json(cls, d: dict) -> "PartitionPlan":
        return cls(
            key=d["key"], n_parts=d["n_parts"], boundaries=d["boundaries"],
            n_range=d["n_range"], hot=dict(d["hot"]),
            hot_splits={k: list(v) for k, v in d["hot_splits"].items()},
            est_rows=d["est_rows"], sample_rate=d["sample_rate"],
            seed=d.get("seed", 0),
        )


SKETCH_K = 64  # bottom-k ts sketch size per (key, batch)


class _SamplePartials:
    """Per-batch deterministic row sample → per-key partials:
    (n, ts_lo, ts_hi, bottom-k ts sketch).

    The sketch keeps the K sampled rows with the SMALLEST sample hash per
    key — merging bottom-k sketches across batches yields a uniform,
    layout-independent sample of each key's timestamps, from which
    hot-key sub-split boundaries are computed as real quantiles. (Round 1
    used only per-batch (ts_lo, ts_hi); with shuffled ingestion every
    batch spans the whole time range, the "quantiles" collapsed to ~3
    distinct values, and one sub inherited almost the entire hot entity —
    a 3.5M-row straggler partition at 24M rows.)"""

    def __init__(self, key: str, ts: str | None, rate: float, seed: int):
        self.key, self.ts, self.rate, self.seed = key, ts, rate, seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        # cheap row sampling first (ts mix — no key hashing for the ~95%
        # of rows that are dropped), then hash only the sampled keys
        if self.ts is not None:
            tsv = batch.column(self.ts).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            h = mix64(tsv.astype(np.uint64), 0x5A)
        else:
            h = mix64(np.arange(batch.num_rows, dtype=np.uint64), 0x5A)
            # (no stable ts: per-batch index sampling — plan quality only)
        take = (h % _MOD) < np.uint64(int(self.rate * float(_MOD)))
        # filter in Arrow BEFORE any numpy conversion: materializing the
        # full key column as Python objects just to drop ~95% of it was
        # the dominant cost of the planning scan (measured 96M rows @32
        # cpus: ~2/3 of the scan wall was this conversion)
        kcol = batch.column(self.key)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        keys = kcol.filter(pa.array(take)).to_numpy(zero_copy_only=False)
        hs = h[take]
        if self.ts is not None:
            tsv = tsv[take]
        else:
            tsv = np.zeros(int(take.sum()), dtype=np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lo = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(lo, inv, tsv)
        np.maximum.at(hi, inv, tsv)
        # bottom-k (by sample hash) ts sketch per key: sort rows by
        # (key, hash) once, slice the first ≤K of each key segment
        order = np.lexsort((hs, inv))
        inv_s, ts_s, h_s = inv[order], tsv[order], hs[order]
        seg_start = np.concatenate(([0], np.cumsum(n)))[:-1]
        pos_in_seg = np.arange(len(inv_s)) - seg_start[inv_s]
        keep = pos_in_seg < SKETCH_K
        kept_per_key = np.bincount(inv_s[keep], minlength=len(uniq))
        offs = np.concatenate(([0], np.cumsum(kept_per_key))).astype(np.int64)
        return pa.table({
            "key": pa.array(uniq),
            "n": pa.array(n), "ts_lo": pa.array(lo), "ts_hi": pa.array(hi),
            "ts_sketch": pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(ts_s[keep], type=pa.int64())),
            "h_sketch": pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(h_s[keep].view(np.int64))),
        })


SKETCH_MERGE_CAP = 1024  # bottom-k kept per key by the distributed combine


def _merge_sample_partials(part: pa.Table) -> pa.Table:
    """Fold one hash-partition of (key, batch) sample partials to one row
    per key: n summed, ts extrema folded, bottom-k ts sketches merged by
    keeping the SKETCH_MERGE_CAP smallest sample hashes per key — the
    same segment-vectorized slice _SamplePartials uses, over all keys of
    the partition at once (no per-key Python calls)."""
    part = part.drop_columns(["__part"])
    keys = part.column("key").to_numpy(zero_copy_only=False)
    n = part.column("n").to_numpy(zero_copy_only=False)
    lo = part.column("ts_lo").to_numpy(zero_copy_only=False)
    hi = part.column("ts_hi").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(keys, return_inverse=True)
    m = len(uniq)
    mn = np.bincount(inv, weights=n.astype(np.float64),
                     minlength=m).astype(np.int64)
    mlo = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    mhi = np.full(m, np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(mlo, inv, lo)
    np.maximum.at(mhi, inv, hi)

    tcol = part.column("ts_sketch")
    hcol = part.column("h_sketch")
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    if isinstance(hcol, pa.ChunkedArray):
        hcol = hcol.combine_chunks()
    offs = tcol.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    hoffs = hcol.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    tvals = tcol.values.to_numpy(zero_copy_only=False)[offs[0]:offs[-1]]
    hvals = hcol.values.to_numpy(zero_copy_only=False)[hoffs[0]:hoffs[-1]]
    row_of = np.repeat(np.arange(part.num_rows, dtype=np.int64),
                       np.diff(offs))
    ki = inv[row_of]
    order = np.lexsort((hvals.view(np.uint64), ki))
    ki_s, ts_s, h_s = ki[order], tvals[order], hvals[order]
    seg_counts = np.bincount(ki, minlength=m)
    seg_start = np.concatenate(([0], np.cumsum(seg_counts)))[:-1]
    pos = np.arange(len(ki_s), dtype=np.int64) - seg_start[ki_s]
    keep = pos < SKETCH_MERGE_CAP
    kept = np.bincount(ki_s[keep], minlength=m)
    offs2 = np.concatenate(([0], np.cumsum(kept))).astype(np.int64)
    return pa.table({
        "key": pa.array(uniq),
        "n": pa.array(mn), "ts_lo": pa.array(mlo), "ts_hi": pa.array(mhi),
        "ts_sketch": pa.ListArray.from_arrays(
            pa.array(offs2, type=pa.int32()),
            pa.array(ts_s[keep], type=pa.int64())),
        "h_sketch": pa.ListArray.from_arrays(
            pa.array(offs2, type=pa.int32()),
            pa.array(h_s[keep], type=pa.int64())),
    })


def plan_partitions(
    ds,
    key: str,
    ts: str | None = None,
    *,
    target_rows_per_part: int = 100_000,
    min_parts: int | None = None,
    max_parts: int = 4096,
    sample_rate: float = 0.05,
    hot_factor: float = 1.0,
    split_hot_keys: bool = False,
    seed: int = 0,
) -> PartitionPlan:
    """One sampling pass over (key, ts) → a PartitionPlan."""
    cols = [key] + ([ts] if ts else [])
    partials = ds.select_columns(cols).map_batches(
        _SamplePartials(key, ts, sample_rate, seed),
        batch_format="pyarrow",
    )
    # distributed per-key combine BEFORE the driver collect: the partial
    # stream has one row per (key, batch), so the driver pull grows with
    # blocks×keys — ~2.1M rows / 0.7 GB at 96M rows·384 blocks·5k keys,
    # unbounded at scale. One tiny hash shuffle folds it to ≤1 row per
    # key with sketches truncated to the bottom-SKETCH_MERGE_CAP hashes.
    # The driver's bottom-kk selection is exact while kk ≤ CAP (kk is
    # clamped to CAP below); a hotter key (>128 sub-splits) gets its ts
    # quantiles from a bottom-CAP sample — still a uniform sample of the
    # key's own rows, so quantile error is O(1/sqrt(CAP)), not a bias.
    def _tag(b: pa.Table) -> pa.Table:
        kh = hash_str_array(
            b.column("key").to_numpy(zero_copy_only=False), seed=seed)
        return b.append_column(
            "__part", pa.array((kh % np.uint64(32)).astype(np.int32)))

    sample = (
        partials.map_batches(_tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_merge_sample_partials, batch_format="pyarrow")
        .to_pandas()
    )
    if min_parts is None:
        # size partition count to the cluster so no stage starves: at least
        # 2 partitions per CPU (target_rows_per_part stays the memory cap)
        try:
            import ray

            min_parts = max(4, 2 * int(ray.cluster_resources().get("CPU", 4)))
        except Exception:
            min_parts = 4
    if len(sample) == 0:
        return PartitionPlan(key=key, n_parts=1, boundaries=[], n_range=1,
                             est_rows=0, sample_rate=sample_rate, seed=seed)
    agg = sample.groupby("key", sort=False).agg(
        n=("n", "sum"), ts_lo=("ts_lo", "min"), ts_hi=("ts_hi", "max")
    ).reset_index()
    est_rows = int(agg["n"].sum() / sample_rate)
    n_parts = int(np.clip(int(np.ceil(est_rows / target_rows_per_part)),
                          min_parts, max_parts))
    per_part_budget = max(1, est_rows // n_parts)

    est_key_rows = (agg["n"] / sample_rate).astype(int)
    hot_mask = est_key_rows > hot_factor * per_part_budget
    hot_keys = agg[hot_mask]
    cold = agg[~hot_mask]

    # range boundaries over hash space from the cold sample, count-weighted
    kh = hash_str_array(cold["key"].to_numpy(), seed=seed) if len(cold) else np.array([], dtype=np.uint64)
    n_hot_parts_est = int(
        sum(max(1, int(np.ceil(r / per_part_budget))) if split_hot_keys else 1
            for r in est_key_rows[hot_mask])
    )
    n_range = max(1, n_parts - n_hot_parts_est)
    if len(cold) and n_range > 1:
        order = np.argsort(kh)
        w = cold["n"].to_numpy()[order].astype(np.float64)
        cw = np.cumsum(w)
        targets = cw[-1] * np.arange(1, n_range) / n_range
        cut_idx = np.searchsorted(cw, targets)
        boundaries = sorted(set(int(kh[order][min(i, len(order) - 1)]) for i in cut_idx))
        n_range = len(boundaries) + 1
    else:
        boundaries = []
        n_range = 1

    hot: dict[str, int] = {}
    hot_splits: dict[str, list[int]] = {}
    next_pid = n_range
    for _, row in hot_keys.sort_values("key").iterrows():
        k = row["key"]
        est = int(row["n"] / sample_rate)
        n_sub = max(1, int(np.ceil(est / per_part_budget))) if split_hot_keys else 1
        hot[k] = next_pid
        if n_sub > 1:
            # ts quantile bounds from the key's merged bottom-k sketch —
            # a uniform sample of ITS OWN rows' timestamps (per-batch
            # lo/hi alone degenerate under shuffled ingestion)
            ksample = sample[sample["key"] == k]
            ts_all = np.concatenate([
                np.asarray(x, dtype=np.int64)
                for x in ksample["ts_sketch"]]) if len(ksample) else \
                np.zeros(0, dtype=np.int64)
            if len(ts_all):
                h_all = np.concatenate([
                    np.asarray(x, dtype=np.int64)
                    for x in ksample["h_sketch"]]).view(np.uint64)
                # clamp to the combine's per-key sketch cap: beyond it
                # the bottom-kk hashes are no longer all present, so the
                # selection would silently become a sample-of-a-sample
                # with a misleading size (ADVICE r3)
                kk = min(len(ts_all), max(256, 8 * n_sub),
                         SKETCH_MERGE_CAP)
                sel = np.argsort(h_all, kind="stable")[:kk]
                tvals = np.sort(ts_all[sel])
            else:  # fallback: per-batch extrema only
                tvals = np.sort(np.concatenate([
                    ksample["ts_lo"].to_numpy(), ksample["ts_hi"].to_numpy()]))
            qs = np.quantile(tvals, np.arange(1, n_sub) / n_sub).astype(np.int64)
            hot_splits[k] = sorted(set(int(q) for q in qs))
            n_sub = len(hot_splits[k]) + 1
        next_pid += n_sub
    return PartitionPlan(
        key=key, n_parts=next_pid, boundaries=boundaries, n_range=n_range,
        hot=hot, hot_splits=hot_splits, est_rows=est_rows,
        sample_rate=sample_rate, seed=seed,
    )


def estimate_rows(ds, col: str | None = None) -> int:
    """Row-count estimate for shuffle-width sizing.

    Free when the Dataset's metadata already knows its count (fresh
    parquet reads); otherwise ONE narrow counting pass over a single
    column (the same trade plan_partitions makes: a cheap extra scan buys
    a data-sized, OOM-safe partition count at 100 TB)."""
    try:
        n = ds._meta_count()
        if n is not None:
            return int(n)
    except Exception:
        pass
    cols = [col] if col else None
    narrow = ds.select_columns(cols) if cols else ds

    def count(batch: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})

    total = 0
    for b in narrow.map_batches(count, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        total += int(np.sum(b.column("n").to_numpy(zero_copy_only=False)))
    return total


def hash_shuffle_width(est_rows: int | None,
                       target_rows_per_part: int = 1_000_000,
                       max_parts: int = 4096) -> int:
    """Partition count for hash-partitioned group shuffles: at least
    2×cluster CPUs (parallelism floor), grown by data size so one
    partition's rows always fit a worker's pandas frame (VERDICT r01 #6:
    a CPU-tied width is a per-task OOM at 100 TB)."""
    try:
        import ray

        floor = max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        floor = 32
    if not est_rows:
        return floor
    need = int(np.ceil(est_rows / target_rows_per_part))
    return int(np.clip(need, floor, max_parts))


def assign_partition_ids(
    keys, plan: PartitionPlan, ts: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized key (+ts for sub-split hot keys) → partition id.

    ``keys`` may be a numpy array or an Arrow column; the Arrow path
    dictionary-encodes in C++ so all Python-level work is O(unique)."""
    import pyarrow as pa

    bounds = np.asarray(plan.boundaries, dtype=np.uint64)
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        d = keys.dictionary_encode()
        inv = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    else:
        uniq, inv = np.unique(np.asarray(keys), return_inverse=True)
        inv = inv.astype(np.int64)
    if len(uniq) == 0:
        return np.zeros(0, dtype=np.int64)
    kh_u = np.fromiter(
        (hash_str(u if isinstance(u, str) else str(u), plan.seed)
         for u in uniq), dtype=np.uint64, count=len(uniq))
    pid_u = np.searchsorted(bounds, kh_u, side="left").astype(np.int64)
    split_unique_idx = []
    if plan.hot:
        for i, u in enumerate(uniq):
            h = plan.hot.get(u)
            if h is not None:
                pid_u[i] = h
                if u in plan.hot_splits:
                    split_unique_idx.append((i, u))
    pid = pid_u[inv]
    if split_unique_idx and ts is not None:
        for i, u in split_unique_idx:
            m = inv == i
            bnds = np.asarray(plan.hot_splits[u], dtype=np.int64)
            pid[m] = plan.hot[u] + np.searchsorted(bnds, ts[m], side="left")
    return pid


# --- Z-order (Morton) locality keys ----------------------------------------

def _spread_bits32(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 32 bits of x to even bit positions of a
    uint64 (the classic magic-number Morton fold, 5 shift/mask stages)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def zorder_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleaved 64-bit Z-order (Morton) key of two non-negative
    32-bit dimensions — the lakehouse data-layout trick: sorting or
    range-partitioning by this key keeps rows close in BOTH dimensions
    co-located, so min/max pruning works for predicates on either
    column (the multi-dimensional analog of the single-key range
    partition the flagship already plans). Returned as int64 (the sign
    bit is never set: 2×32 interleaved bits fill exactly bits 0..63,
    but the TOP bit comes from b's bit 31 — inputs are masked to 31
    bits to keep the key non-negative and SQL-comparable)."""
    a = a.astype(np.uint64) & np.uint64(0x7FFFFFFF)
    b = b.astype(np.uint64) & np.uint64(0x7FFFFFFF)
    return (_spread_bits32(a) | (_spread_bits32(b) << np.uint64(1))
            ).astype(np.int64)
