"""Relational operators: broadcast joins, semi/anti joins, partial-agg
groupby, top-k — the engine's counterparts of the reference's metadata-spine
relational work (SURVEY.md §2.4/§2.5/§2.6).

Design rules (scale-first):

- **Small side is broadcast**, never shuffled: the dimension table is read
  once, `ray.put` into the object store, and probed with a vectorized pandas
  merge / numpy ``searchsorted`` inside ``map_batches`` — the reference's
  dict-probe joins (``PrepareData.py:252-260,486-487``) done right.
- **Grouped aggregates pre-aggregate per batch** (map-side combine) so the
  all-to-all ``groupby`` only moves one row per (batch × key) — the
  reference's MPI ``Reduce`` partial+final shape (``mpiIV.py:469-496``).
- **Top-k** computes per-batch candidates before the global sort+limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(
    ds,
    small: pd.DataFrame,
    *,
    on: list[str] | str,
    how: str = "inner",
    suffix: str = "_r",
):
    """Join a Dataset against a small in-memory table (broadcast hash join).

    ``small`` is shipped once via the object store (Ray serializes the
    closure's ``ObjectRef``), not re-pickled per batch. ``how`` in
    {'inner','left'}. The probe is Arrow-native: per-key codes +
    ``searchsorted`` ranges + one ``pc.take`` per side — the batch never
    round-trips through pandas (duplicate small-side keys fan out exactly
    like a hash join).
    """
    import ray

    from .kernels import map_keys_to_codes

    if isinstance(on, str):
        on = [on]

    # precompute the probe index ONCE on the driver; ship via object store
    uniqs = []  # per key col: sorted unique values
    comp = np.zeros(len(small), dtype=np.int64)
    for k in on:
        vals = small[k].to_numpy()
        uniq, codes = np.unique(vals, return_inverse=True)
        uniqs.append(uniq)
        comp = comp * np.int64(len(uniq) + 1) + codes.astype(np.int64)
    width = 1
    for u in uniqs:
        width *= len(u) + 1
    if width >= (1 << 62):
        raise ValueError("broadcast_join composite key space overflow — "
                         "small side too wide for int64 codes")
    order = np.argsort(comp, kind="stable")  # stable: dup keys keep row order
    small_cols = {}
    for c in small.columns:
        if c in on:
            continue
        arr = pa.Array.from_pandas(small[c])
        small_cols[c] = pc.take(arr, pa.array(order, type=pa.int64()))
    ref = ray.put((uniqs, comp[order], small_cols))

    # plain function, not an actor pool: the probe index is fully built on
    # the driver, so per-batch setup is a zero-copy ray.get of local plasma
    # buffers — and a TaskPoolMapOperator fuses with the downstream maps.
    def _probe(batch: pa.Table) -> pa.Table:
        b_uniqs, comp_sorted, b_small_cols = ray.get(ref)
        n = batch.num_rows
        comp = np.zeros(n, dtype=np.int64)
        present = np.ones(n, dtype=bool)
        for k, uniq in zip(on, b_uniqs):
            vals = batch.column(k).to_numpy(zero_copy_only=False)
            codes, ok = map_keys_to_codes(uniq, vals)
            present &= ok
            comp = comp * np.int64(len(uniq) + 1) + np.where(ok, codes, 0)
        lo = np.searchsorted(comp_sorted, comp, side="left")
        hi = np.searchsorted(comp_sorted, comp, side="right")
        counts = np.where(present, hi - lo, 0)
        if how == "left":
            out_counts = np.maximum(counts, 1)
        else:
            out_counts = counts
        total = int(out_counts.sum())
        row_of = np.repeat(np.arange(n, dtype=np.int64), out_counts)
        starts = np.concatenate(([0], np.cumsum(out_counts)))[:-1]
        within = np.arange(total, dtype=np.int64) - starts[row_of]
        matched = counts[row_of] > 0
        sidx = np.where(matched, lo[row_of] + within, 0)
        out = batch.take(pa.array(row_of, type=pa.int64()))
        names = set(out.column_names)
        for c, arr in b_small_cols.items():
            name = c if c not in names else c + suffix
            idx = pa.array(np.where(matched, sidx, -1), type=pa.int64(),
                           mask=~matched)
            out = out.append_column(name, pc.take(arr, idx))
        return out

    return ds.map_batches(_probe, batch_format="pyarrow")


def semi_join(ds, keys: set | np.ndarray | pd.Series, *, on: str,
              anti: bool = False):
    """Keep rows whose `on` value is (not) in the broadcast key set."""
    import ray

    arr = np.asarray(list(keys) if isinstance(keys, set) else keys)
    ref = ray.put(np.unique(arr))

    def _filter(batch: pa.Table) -> pa.Table:
        skeys = ray.get(ref)  # zero-copy local get; fuses as a task op
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, vals)
        pos = np.clip(pos, 0, max(len(skeys) - 1, 0))
        hit = (skeys[pos] == vals) if len(skeys) else np.zeros(
            len(vals), dtype=bool)
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(_filter, batch_format="pyarrow")


def grouped_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    count_alias: str | None = None,
):
    """Grouped aggregation with map-side combine.

    ``aggs``: output_name -> (input_col, fn) with fn in
    {'sum','min','max','count','mean'}; 'mean' is decomposed into
    sum+count partials and finalized after the shuffle. ``count_alias``
    adds a plain row count.
    """
    partial_specs: list[tuple[str, str, str]] = []  # (pname, col, fn)
    finals: list[tuple[str, str]] = []
    for out_name, (col, fn) in aggs.items():
        if fn == "mean":
            partial_specs.append((f"__s_{out_name}", col, "sum"))
            partial_specs.append((f"__c_{out_name}", col, "count"))
            finals.append((out_name, "mean"))
        else:
            partial_specs.append((out_name, col, fn))
            finals.append((out_name, fn))
    if count_alias:
        partial_specs.append((count_alias, None, "size"))

    def _partial_arrow(batch: pa.Table) -> pa.Table:
        # Arrow-native hash aggregation (C++): no pandas round-trip in the
        # busiest partial in the repo (VERDICT r2 #4). Arrow's hash_sum
        # defaults to min_count=1, so an all-null group contributes NULL,
        # not 0.0 — the merged SUM matches SQL. Output columns come back
        # as [keys..., one per aggregate in spec order]; duplicate
        # (col, fn) pairs produce duplicate names, so rename positionally.
        specs = []
        for pname, col, fn in partial_specs:
            if fn == "size":
                specs.append((keys[0], "count", pc.CountOptions(mode="all")))
            elif fn == "count":
                specs.append((col, "count"))
            else:
                specs.append((col, fn))
        g = batch.group_by(keys, use_threads=False).aggregate(specs)
        # the positional rename assumes keys-first layout; pyarrow has
        # shipped keys-LAST in older releases, and a silent layout change
        # would mislabel every partial without an error (ADVICE r3) —
        # assert the contract before relying on it
        if g.column_names[:len(keys)] != list(keys):
            raise AssertionError(
                f"group_by layout changed: expected keys {list(keys)} "
                f"first, got columns {g.column_names}")
        cols = {k: g.column(i) for i, k in enumerate(keys)}
        for i, (pname, _, _) in enumerate(partial_specs):
            cols[pname] = g.column(len(keys) + i)
        return pa.table(cols)

    def _partial_pandas(batch: pa.Table) -> pa.Table:
        # fallback for column types Arrow's hash kernels can't aggregate
        df = batch.to_pandas()
        g = df.groupby(keys, sort=False)
        out = {}
        for pname, col, fn in partial_specs:
            if fn == "size":
                out[pname] = g.size()
            elif fn == "count":
                out[pname] = g[col].count()
            elif fn == "sum":
                out[pname] = g[col].sum(min_count=1)
            else:
                out[pname] = getattr(g[col], fn)()
        res = pd.DataFrame(out).reset_index()
        return pa.Table.from_pandas(res, preserve_index=False)

    def partial(batch: pa.Table) -> pa.Table:
        try:
            return _partial_arrow(batch)
        except pa.lib.ArrowNotImplementedError:
            return _partial_pandas(batch)

    from ray.data.aggregate import Max, Min, Sum

    combine = []
    for pname, col, fn in partial_specs:
        if fn in ("sum", "count", "size"):
            combine.append(Sum(pname, alias_name=pname))
        elif fn == "min":
            combine.append(Min(pname, alias_name=pname))
        elif fn == "max":
            combine.append(Max(pname, alias_name=pname))
    partials = ds.map_batches(partial, batch_format="pyarrow")
    from .engine import use_push_shuffle

    use_push_shuffle(partials)
    merged = partials.groupby(keys).aggregate(*combine)

    def finalize(batch: pa.Table) -> pa.Table:
        # Arrow-native: float64 divide (int/int would truncate); an
        # all-null group is null/0 → null, matching pandas' NaN
        for out_name, fn in finals:
            if fn == "mean":
                s = batch.column(f"__s_{out_name}").cast(pa.float64())
                c = batch.column(f"__c_{out_name}").cast(pa.float64())
                batch = batch.drop_columns(
                    [f"__s_{out_name}", f"__c_{out_name}"])
                batch = batch.append_column(out_name, pc.divide(s, c))
        return batch

    return merged.map_batches(finalize, batch_format="pyarrow")


def grouped_top_k(ds, keys: list[str], k: int, *, by: list[str],
                  descending: list[bool], est_rows: int | None = None,
                  target_rows_per_part: int = 1_000_000):
    """Top-k rows per key group (O4/O7-style grouped selection).

    Hash-partition on the group keys, then one vectorized pandas pass per
    partition handles all of its groups (no per-group Python calls). The
    shuffle width is data-sized exactly like :func:`dedup.exact_dedup`."""
    import numpy as np

    from .hashing import hash_str_array, mix64
    from .partition import estimate_rows, hash_shuffle_width

    if est_rows is None:
        est_rows = estimate_rows(ds, keys[0])
    P = hash_shuffle_width(est_rows, target_rows_per_part)

    def assign(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in keys:
            h = mix64(h, hash_str_array(
                batch.column(c).to_numpy(zero_copy_only=False)))
        return batch.append_column(
            "__part", pa.array((h % np.uint64(P)).astype(np.int32)))

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=[not d for d in descending],
                          kind="stable")
        g = g.groupby(keys, sort=False).head(k)
        return g.drop(columns=["__part"])

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    from .engine import use_push_shuffle

    use_push_shuffle(tagged)
    return tagged.groupby("__part").map_groups(topk_part,
                                               batch_format="pandas")


def global_rank(ds, *, by: list[str], descending: list[bool],
                rank_col: str = "rank", n_parts: int | None = None,
                sample_rate: float = 0.05, seed: int = 0):
    """Global full sort with exact 1-based row numbers (the reference's
    DETsort, jyh/result.py:10-31, distributed).

    ``by`` must be a total order (last column a unique tiebreaker) and its
    FIRST column numeric. Three-phase, no driver materialization:

    1. deterministic sample of the primary sort column → range boundaries
       (count-weighted quantiles);
    2. narrow counting pass over ONLY the primary column → exact rows per
       range → prefix offsets (broadcast, tiny);
    3. one range shuffle of the full rows; each range sorts locally and
       ranks as ``offset[range] + local position``.

    Equal primary values are co-located by construction so ties resolved
    by later ``by`` columns stay within one range. A single value held by
    a huge fraction of rows makes that range hot (documented skew limit —
    salt the key upstream if the primary column is near-constant)."""
    primary = by[0]
    desc0 = descending[0]

    from .hashing import hash_values
    from .partition import hash_shuffle_width

    # phase 1: deterministic sample → boundaries (value-hash, not
    # positional — see skew_join.sample_keys)
    def sample(batch: pa.Table) -> pa.Table:
        x = batch.column(primary).to_numpy(zero_copy_only=False)
        h = hash_values(x, seed=0x5B)
        take = (h % np.uint64(1 << 20)) < np.uint64(
            int(sample_rate * (1 << 20)))
        return pa.table({"v": pa.array(x[take].astype(np.float64))})

    svals = []
    for b in ds.select_columns([primary]).map_batches(
            sample, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        svals.append(b.column("v").to_numpy(zero_copy_only=False))
    sv = np.concatenate(svals) if svals else np.zeros(0)
    P = n_parts or hash_shuffle_width(int(len(sv) / max(sample_rate, 1e-9)))
    if len(sv) and P > 1:
        qs = np.quantile(np.sort(sv), np.arange(1, P) / P)
        bounds = np.unique(qs)
    else:
        bounds = np.zeros(0)
    n_ranges = len(bounds) + 1

    def part_of(x: np.ndarray) -> np.ndarray:
        p = np.searchsorted(bounds, x.astype(np.float64), side="right")
        return (n_ranges - 1 - p) if desc0 else p

    # phase 2: exact rows per range (narrow pass over the primary column)
    def count_parts(batch: pa.Table) -> pa.Table:
        x = batch.column(primary).to_numpy(zero_copy_only=False)
        c = np.bincount(part_of(x), minlength=n_ranges).astype(np.int64)
        return pa.table({"part": pa.array(np.arange(n_ranges, dtype=np.int64)),
                         "cnt": pa.array(c)})

    counts = np.zeros(n_ranges, dtype=np.int64)
    for b in ds.select_columns([primary]).map_batches(
            count_parts, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        # np.add.at: a yielded batch may contain SEVERAL partial tables
        # (repeated part ids) — `counts[idx] += v` would drop all but one
        np.add.at(counts, b.column("part").to_numpy(zero_copy_only=False),
                  b.column("cnt").to_numpy(zero_copy_only=False))
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]

    # phase 3: full-row range shuffle + local sort + offset rank
    def assign(batch: pa.Table) -> pa.Table:
        x = batch.column(primary).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__part", pa.array(part_of(x).astype(np.int32)))

    off_map = {int(i): int(offsets[i]) for i in range(n_ranges)}

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        # one call may receive SEVERAL __part groups in one frame (the
        # grouped blocks are packed) — rank each range independently
        outs = []
        for pid, sub in g.groupby("__part", sort=False):
            sub = sub.sort_values(by, ascending=[not d for d in descending],
                                  kind="stable")
            sub = sub.drop(columns=["__part"])
            sub[rank_col] = off_map[int(pid)] + np.arange(
                1, len(sub) + 1, dtype=np.int64)
            outs.append(sub)
        return pd.concat(outs, ignore_index=True)

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    from .engine import use_push_shuffle

    use_push_shuffle(tagged)
    return tagged.groupby("__part").map_groups(rank_part,
                                               batch_format="pandas")


def top_k(ds, k: int, *, by: list[str], descending: list[bool]):
    """Global top-k: per-batch truncation, then one small sort+limit."""

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        order = [(c, "descending" if d else "ascending")
                 for c, d in zip(by, descending)]
        idx = pc.sort_indices(batch, sort_keys=order)[:k]
        return batch.take(idx)

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return pruned.sort(by, descending=descending).limit(k)


def grouped_quantiles_hist(ds, key: str, value_col: str, qs: list[float],
                           names: list[str]):
    """Exact per-group discrete quantiles of a bounded-cardinality value
    column via a VALUE HISTOGRAM, not a sort: one map-side-combined
    (key, value) count shuffle, then per-key cumulative counts over the
    tiny histogram. Matches SQL quantile_disc(q) = sorted[ceil(q*n) - 1].

    Scale shape: the all-to-all moves O(groups x distinct values) partial
    counts -- independent of row count -- which is the right design for
    integer stats (token counts, lengths) over 100 TB."""
    hist = grouped_agg(ds, [key, value_col], {}, count_alias="__n")

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        # one frame may pack several key groups -- re-group inside
        for kv, sub in g.groupby(key, sort=False):
            sub = sub.sort_values(value_col, kind="stable")
            cum = sub["__n"].to_numpy().cumsum()
            total = cum[-1]
            row = {key: kv}
            vals = sub[value_col].to_numpy()
            for q, name in zip(qs, names):
                rank = int(np.ceil(q * total))
                row[name] = vals[np.searchsorted(cum, max(rank, 1))]
            outs.append(row)
        return pd.DataFrame(outs)

    return hist.groupby(key).map_groups(quants, batch_format="pandas")


def global_cumsum(ds, val_col: str, *, order_col: str,
                  est_rows: int | None = None,
                  target_rows_per_part: int = 1_000_000,
                  out_col: str | None = None):
    """Distributed global prefix scan: inclusive cumulative sum of
    ``val_col`` in global ``order_col`` order (assumed unique), appended
    as ``out_col`` (default ``{val_col}_cumsum``).

    Classic two-phase scan (the reference's sequential accumulators,
    e.g. jyh/result.py:34-45 cumulative sweeps, distributed): sample
    order_col → P range boundaries; one streaming pass folds per-range
    partial sums (only P×blocks tiny rows reach the driver); the driver
    exclusive-prefixes P values and broadcasts them; the single all-to-all
    range-shuffles rows so each task sorts + cumsums one bounded range and
    adds its offset. Integer inputs stay int64-exact end to end.
    """
    import ray

    from .engine import use_push_shuffle
    from .partition import estimate_rows, hash_shuffle_width

    out_col = out_col or f"{val_col}_cumsum"
    if est_rows is None:
        est_rows = estimate_rows(ds, order_col)
    P = hash_shuffle_width(est_rows, target_rows_per_part)

    # boundaries: stride-sample order values (layout-dependent, but the
    # scan result is exact for ANY boundary choice)
    def sample(batch: pa.Table) -> pa.Table:
        v = batch.column(order_col).to_numpy(zero_copy_only=False)
        k = min(len(v), 128)
        idx = np.linspace(0, len(v) - 1, k).astype(np.int64) if len(v) else \
            np.zeros(0, dtype=np.int64)
        return pa.table({"v": pa.array(v[idx])})

    sv = ds.select_columns([order_col]).map_batches(
        sample, batch_format="pyarrow").to_pandas()["v"].to_numpy()
    if len(sv) == 0:
        bounds = np.zeros(0)
    else:
        qs = np.quantile(np.sort(sv), np.linspace(0, 1, P + 1)[1:-1])
        bounds = np.unique(qs)
    nparts = len(bounds) + 1

    def assign(batch: pa.Table) -> pa.Table:
        o = batch.column(order_col).to_numpy(zero_copy_only=False)
        pid = np.searchsorted(bounds, o, side="right").astype(np.int32)
        return batch.append_column("__part", pa.array(pid))

    parted = ds.map_batches(assign, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch.column("__part").to_numpy(zero_copy_only=False)
        v = batch.column(val_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.integer):
            acc = np.zeros(nparts, dtype=np.int64)
            np.add.at(acc, pid, v.astype(np.int64))
        else:
            acc = np.zeros(nparts, dtype=np.float64)
            np.add.at(acc, pid, v.astype(np.float64))
        nz = np.nonzero(acc)[0]
        return pa.table({"p": pa.array(nz.astype(np.int32)),
                         "s": pa.array(acc[nz])})

    psums = parted.map_batches(partial, batch_format="pyarrow").to_pandas()
    totals = np.zeros(nparts, dtype=np.float64 if len(psums) == 0 or
                      psums["s"].dtype.kind == "f" else np.int64)
    if len(psums):
        np.add.at(totals, psums["p"].to_numpy(), psums["s"].to_numpy())
    offsets = np.concatenate(([totals[:0].sum()], np.cumsum(totals)[:-1]))
    oref = ray.put(offsets)

    def scan_part(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(oref)
        g = g.sort_values(order_col, kind="stable")
        if g[order_col].duplicated().any():
            # among ties the cumsum order would depend on shuffle arrival
            raise ValueError(
                f"global_cumsum: duplicate {order_col!r} values — the "
                "order column must be a unique global order")
        v = g[val_col].to_numpy()
        base = offs[int(g["__part"].iloc[0])]
        if np.issubdtype(v.dtype, np.integer):
            g[out_col] = np.int64(base) + np.cumsum(v.astype(np.int64))
        else:
            g[out_col] = float(base) + np.cumsum(v.astype(np.float64))
        return g.drop(columns=["__part"])

    use_push_shuffle(parted)
    return parted.groupby("__part").map_groups(scan_part,
                                               batch_format="pandas")


def exact_percentiles(ds, col: str, qs: list[float], *,
                      sample_rate: float = 0.05,
                      n_parts: int | None = None):
    """Exact global percentiles of a numeric column WITHOUT a full sort.

    Percentile q is defined as the value at 1-based ascending rank
    ``ceil(q * N)`` — the discrete percentile the reference computes by
    fully sorting score tables (DETsort → index lookup,
    jyh/result.py:10-31,55-58). Distributed plan:

    1. deterministic sample of ``col`` → P range boundaries;
    2. ONE narrow counting pass (only ``col`` leaves storage) → exact
       rows per range → exact N and per-range rank offsets;
    3. only rows in the ranges that CONTAIN a target rank are pulled
       (|qs| ranges of ~N/P values each — bounded by the same
       target-rows-per-part budget as every other shuffle here, NOT the
       whole column), each range ``np.partition``-selected locally.

    Data movement: 2 narrow scans + |qs| bounded ranges; nothing close
    to the O(N log N) full-sort byte volume. Skew limit: a single value
    spanning many duplicates makes its range large (documented, same as
    global_rank); the selection still only materializes that one range.
    """
    from .partition import estimate_rows, hash_shuffle_width

    qs = sorted(float(q) for q in qs)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("qs must be in (0, 1]")

    narrow = ds.select_columns([col])

    # phase 1: sample → ascending range boundaries
    from .hashing import hash_values

    def sample(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False)
        # value-hash sampling (see skew_join.sample_keys): boundary
        # estimates must not depend on per-batch row positions
        h = hash_values(x, seed=0xA7)
        take = (h % np.uint64(1 << 20)) < np.uint64(
            int(sample_rate * (1 << 20)))
        return pa.table({"v": pa.array(x[take].astype(np.float64))})

    svals = []
    for b in narrow.map_batches(sample, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        svals.append(b.column("v").to_numpy(zero_copy_only=False))
    sv = np.concatenate(svals) if svals else np.zeros(0)
    P = n_parts or hash_shuffle_width(
        estimate_rows(ds, col), target_rows_per_part=1_000_000)
    if len(sv) and P > 1:
        bounds = np.unique(np.quantile(np.sort(sv), np.arange(1, P) / P))
    else:
        bounds = np.zeros(0)
    n_ranges = len(bounds) + 1

    # phase 2: exact counts per range (narrow)
    def count_parts(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False)
        p = np.searchsorted(bounds, x.astype(np.float64), side="right")
        c = np.bincount(p, minlength=n_ranges).astype(np.int64)
        return pa.table({"part": pa.array(np.arange(n_ranges,
                                                    dtype=np.int64)),
                         "cnt": pa.array(c)})

    counts = np.zeros(n_ranges, dtype=np.int64)
    for b in narrow.map_batches(count_parts,
                                batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        np.add.at(counts, b.column("part").to_numpy(zero_copy_only=False),
                  b.column("cnt").to_numpy(zero_copy_only=False))
    total = int(counts.sum())
    if total == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    cum = np.cumsum(counts)
    offsets = np.concatenate(([0], cum[:-1]))

    ranks = np.minimum(np.maximum(
        np.ceil(np.asarray(qs) * total).astype(np.int64), 1), total)
    # range holding 1-based rank r: first p with cum[p] >= r
    hit = np.searchsorted(cum, ranks, side="left")
    hit_set = set(int(h) for h in hit)

    # phase 3: pull ONLY the hit ranges' values
    def keep_hit(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False)
        p = np.searchsorted(bounds, x.astype(np.float64), side="right")
        m = np.isin(p, np.fromiter(hit_set, dtype=np.int64))
        return pa.table({"v": pa.array(x[m].astype(np.float64)),
                         "p": pa.array(p[m].astype(np.int64))})

    by_part: dict[int, list[np.ndarray]] = {h: [] for h in hit_set}
    for b in narrow.map_batches(keep_hit,
                                batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        pv = b.column("p").to_numpy(zero_copy_only=False)
        vv = b.column("v").to_numpy(zero_copy_only=False)
        for h in np.unique(pv):
            by_part[int(h)].append(vv[pv == h])

    values = []
    for q, r, h in zip(qs, ranks, hit):
        vals = np.concatenate(by_part[int(h)])
        local = int(r - offsets[int(h)] - 1)  # 0-based within the range
        values.append(float(np.partition(vals, local)[local]))
    return pa.table({"q": pa.array(qs, type=pa.float64()),
                     "value": pa.array(values, type=pa.float64())})


def _estimate_hot_keys(left, on: str, *, sample_rate: float,
                       hot_row_threshold: int | None,
                       num_partitions: int) -> np.ndarray:
    """Deterministic per-ROW sample of the left key column → keys whose
    estimated row count exceeds ``hot_row_threshold``.

    Per-row decision (value hash mixed with the within-batch row
    position), NOT per-key-value: hashing only the key value makes
    inclusion all-or-nothing per key (equal keys share one hash), so a
    true hot key is entirely missed with probability 1-sample_rate and a
    sampled key's full count gets divided by sample_rate, inflating its
    estimate ~1/sample_rate× — both defeating skew handling (ADVICE r3).
    Pure positional sampling alone was rejected in r2 for bias on
    ordered inputs; the value-hash component decorrelates that.
    """
    from .hashing import hash_values, mix64

    def sample_keys(batch: pa.Table) -> pa.Table:
        x = batch.column(on).to_numpy(zero_copy_only=False)
        h = mix64(hash_values(x, seed=0xC3),
                  np.arange(len(x), dtype=np.uint64))
        take = (h % np.uint64(1 << 20)) < np.uint64(
            int(sample_rate * (1 << 20)))
        return pa.table({"k": pa.array(x[take])})

    sk = []
    for b in left.select_columns([on]).map_batches(
            sample_keys, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        sk.append(b.column("k").to_numpy(zero_copy_only=False))
    skv = np.concatenate(sk) if sk else np.zeros(0, dtype=np.int64)
    est_total = int(len(skv) / max(sample_rate, 1e-9))
    if hot_row_threshold is None:
        hot_row_threshold = max(
            1000, est_total // max(num_partitions, 1) // 4)
    uniq, cnt = (np.unique(skv, return_counts=True) if len(skv)
                 else (np.zeros(0, dtype=np.int64), np.zeros(0, np.int64)))
    est_rows = cnt / max(sample_rate, 1e-9)
    return uniq[est_rows > hot_row_threshold]


def drop_empty_blocks(mat_ds):
    """Rebuild a MATERIALIZED Dataset without its 0-row blocks.

    Works around a Ray 2.49 hash-shuffle defect: a 0-row input block
    short-circuits the shuffle task before partitioning
    (`hash_shuffle.py:223`), so when the FIRST block scheduled for a
    join side is empty, the schema-carrying empty shards are never
    fanned out (the driver still flips `_has_schemas_broadcasted`) and
    any aggregator partition that receives no real rows for that side
    builds a column-less table — pyarrow's join then fails with
    "No match ... for key field reference ... on right side". Small
    filter-derived join sides (a dedup drop set, a stats table) hit
    this nondeterministically; block-ordering luck decides.

    Metadata-only driver work: block num_rows come from the ref-bundle
    metadata, payloads never leave the object store. The input must be
    materialized (callers of the native join materialize small sides
    anyway, to pin the schema); returns it unchanged when no block is
    empty. An ALL-empty dataset is returned as-is — callers must
    short-circuit that case themselves (see skew_join's guard)."""
    import ray.data as _rd

    refs, empties = [], 0
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                empties += 1
            else:
                refs.append(ref)
    if empties == 0 or not refs:
        return mat_ds
    out = _rd.from_arrow_refs(refs)
    # the materialized source owns the block objects; tie its lifetime
    # to the rebuilt dataset so the refs stay pinned
    out._fe_backing = mat_ds
    return out


def skew_join(left, right, *, on: str, right_on: str,
              num_partitions: int = 16,
              hot_row_threshold: int | None = None,
              sample_rate: float = 0.02,
              broadcast_cap: int = 2_000_000):
    """Skew-aware inner join of two large Datasets.

    A plain hash join puts every row of a hot key in ONE partition — a
    Zipf head key that is 10% of the left side becomes a straggler task
    (the reference's static splits have the same blind spot, SURVEY §4
    "skew absent"). Plan:

    1. deterministic sample of the left key column → estimated per-key
       frequencies; keys whose estimated rows exceed ``hot_row_threshold``
       (default: rows/partition budget ÷ 4) are HOT;
    2. right rows for hot keys (usually a handful of keys × small
       multiplicity) are semi-join-filtered and broadcast once via the
       object store; the hot left rows probe them in map_batches —
       NO shuffle touches the hot rows;
    3. the cold remainder takes the native hash join at
       ``num_partitions``; results union.

    Raises if the hot right side exceeds ``broadcast_cap`` rows (then
    both sides are hot on the same key — a salted replicate join would
    be needed; not the case for spine×dimension-shaped inputs here).
    Output columns: left columns + right non-key columns (right key is
    dropped — it equals ``on``).
    """
    from .partition import estimate_rows

    if estimate_rows(right, right_on) == 0:
        # an all-empty side loses its schema inside the hash-shuffle
        # join — emit the joined (left + right-non-key) empty schema
        import ray.data as _rd

        ls, rs = left.schema(), right.schema()
        names = list(ls.names) + [n for n in rs.names
                                  if n != right_on and n not in ls.names]
        types = dict(zip(list(ls.names) + list(rs.names),
                         list(ls.types) + list(rs.types)))
        return _rd.from_arrow(pa.table(
            {n: pa.array([], type=types[n]) for n in names}))

    hot_keys = _estimate_hot_keys(
        left, on, sample_rate=sample_rate,
        hot_row_threshold=hot_row_threshold,
        num_partitions=num_partitions)

    if len(hot_keys) == 0:
        # native join emits left cols + right non-key cols (right key
        # column is not duplicated into the output)
        return left.join(right, join_type="inner",
                         num_partitions=num_partitions,
                         on=(on,), right_on=(right_on,))

    # split both sides; broadcast the (small) hot right slice
    left_hot = semi_join(left, hot_keys, on=on)
    left_cold = semi_join(left, hot_keys, on=on, anti=True)
    right_hot_ds = semi_join(right, hot_keys, on=right_on)
    right_hot = right_hot_ds.to_pandas()
    if len(right_hot) > broadcast_cap:
        raise ValueError(
            f"skew_join: hot right side has {len(right_hot)} rows > "
            f"broadcast_cap={broadcast_cap}; both sides hot on the same "
            "key — needs a salted replicate join")
    right_cold = semi_join(right, hot_keys, on=right_on, anti=True)

    cold_j = left_cold.join(right_cold, join_type="inner",
                            num_partitions=num_partitions,
                            on=(on,), right_on=(right_on,))
    if len(right_hot) == 0:
        # inner join: hot-left rows cannot match an empty right slice
        # (an empty Dataset→pandas frame also loses its columns, so the
        # broadcast probe could not even be built)
        return cold_j
    hot_j = broadcast_join(
        left_hot, right_hot.rename(columns={right_on: on}), on=on,
        how="inner")
    return hot_j.union(cold_j)


def replicate_join(left, right, *, on: str, right_on: str,
                   replicate: int = 8, num_partitions: int = 16):
    """Salted inner join for keys hot on BOTH sides (the case skew_join's
    broadcast path refuses): left rows get a deterministic salt in
    [0, replicate); right rows are replicated once per salt; the join key
    becomes (key, salt), spreading one hot key over ``replicate``
    partitions instead of one straggler.

    Cost: right side bytes × ``replicate`` through the exchange — use it
    on the HOT SLICE only (skew_join isolates that slice); output equals
    the plain inner join (salt columns are dropped).
    """
    from .hashing import mix64

    def salt_left(batch: pa.Table) -> pa.Table:
        # deterministic per-row salt: row content position independent —
        # hash of a per-batch row index is NOT stable across layouts, so
        # spread by a counter hash; any spread works, result is identical
        h = mix64(np.arange(batch.num_rows, dtype=np.uint64), 0xE1)
        return batch.append_column(
            "__salt", pa.array((h % np.uint64(replicate)).astype(np.int32)))

    def explode_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), replicate)
        out = batch.take(pa.array(idx))
        salts = np.tile(np.arange(replicate, dtype=np.int32), n)
        return out.append_column("__salt", pa.array(salts))

    l = left.map_batches(salt_left, batch_format="pyarrow")
    r = right.map_batches(explode_right, batch_format="pyarrow")
    j = l.join(r, join_type="inner", num_partitions=num_partitions,
               on=(on, "__salt"), right_on=(right_on, "__salt"))
    return j.drop_columns(["__salt"])


def bloom_prefilter(ds, keys_ds, *, on: str, keys_on: str,
                    bits_per_key: int = 16):
    """Approximate distributed semi-join pre-filter: build a Bloom filter
    over ``keys_ds[keys_on]`` WITHOUT collecting the keys (per-batch
    bitmap partials, OR-reduced on the driver — same shape as the
    flagship's payload locator, engine.py phase B), then drop ``ds`` rows
    whose ``on`` hash misses.

    Guarantees: every true match survives; false positives pass at the
    Bloom rate (~0.24% at 16 bits/key, k=4) — compose with an exact join
    downstream. The point at 100 TB: the big side is pre-shrunk to
    ~selectivity × N rows BEFORE any exchange, and the key set never
    materializes anywhere (bitmap is ~2 B/key regardless of key bytes).
    """
    import ray

    from .hashing import Bloom, hash_pa_array
    from .partition import estimate_rows

    n_keys = estimate_rows(keys_ds, keys_on)
    bloom = Bloom(n_keys, bits_per_key=bits_per_key)
    m_words = len(bloom.words)

    def partial(batch: pa.Table) -> pa.Table:
        part = Bloom(1)
        part.mask = bloom.mask
        part.words = np.zeros(m_words, dtype=np.uint64)
        part.add(hash_pa_array(batch.column(keys_on), seed=0x10F))
        return pa.table({"words": pa.array([part.words.tobytes()],
                                           type=pa.large_binary())})

    for b in keys_ds.select_columns([keys_on]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            bloom.words |= np.frombuffer(b.column("words")[i].as_py(),
                                         dtype=np.uint64)
    ref = ray.put(bloom)

    def keep(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        h = hash_pa_array(batch.column(on), seed=0x10F)
        return batch.filter(pa.array(bl.contains(h)))

    return ds.map_batches(keep, batch_format="pyarrow")
