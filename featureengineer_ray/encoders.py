"""Categorical / numeric feature encoders.

The reference's feature pipelines stop at raw per-record features; a
training-data engine also needs the classic tabular encoders that turn
grouped statistics into per-row features without leaking the row's own
target (reference analog: the per-utterance CMVN normalizers in
jyh/FeaProcess.py normalize each record by statistics of its OWN group;
these encoders are the supervised-tabular counterpart).

Scale shapes:

- **Leave-one-out target encoding** (`target_encode_loo`): one grouped
  sum/count aggregate over the category column (map-side combined, so
  the all-to-all moves O(categories) partials, not rows), then a plan
  switch on MEASURED category count: broadcast lookup inside
  `map_batches` when categories fit (`max_broadcast`), else a
  distributed hash join — the same measured-plan-switch policy as
  `text.tfidf_top_term`. The row's own target is subtracted from its
  category sum, so the encoding never leaks the row's label.
- **Smoothed (Bayesian-mean) target encoding** (`target_encode_smoothed`):
  same aggregate, shrunk toward the global mean with pseudo-count m.
- **Robust scaling** (`robust_scale`): per-group
  (x − median) / (q75 − q25) with linear-interpolation quantiles
  (numpy 'linear' == DuckDB quantile_cont). Continuous values admit no
  histogram shortcut, so this is ONE data-sized hash exchange with the
  quantiles computed segment-vectorized inside each group partition.
  Partitioning assumption: a single group's rows fit one task (true for
  per-entity groups; a 5-language split over 100 TB would need the
  hot-key sub-split machinery in partition.py instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_MAX_BROADCAST = 2_000_000


def _join_partitions() -> int:
    """Hash-join width sized to the cluster: Ray's shuffle join blocks
    until its aggregator pool schedules, so a width beyond the CPU count
    deadlocks small sessions (observed at num_partitions=32 on 4 CPUs)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if (
        ray.is_initialized()) else 8
    return max(2, min(32, ncpu))


def _category_stats(ds, cat_col: str, target_col: str):
    """One map-side-combined aggregate → (category, __te_sum, __te_cnt)."""
    from .relational import grouped_agg

    # materialized: every caller re-reads it (count → plan switch →
    # broadcast/join) and it is O(categories), spillable, never row-sized
    return grouped_agg(
        ds, [cat_col], {"__te_sum": (target_col, "sum")},
        count_alias="__te_cnt").materialize()


def target_encode_loo(ds, *, cat_col: str, target_col: str,
                      out_col: str | None = None,
                      max_broadcast: int = DEFAULT_MAX_BROADCAST,
                      ndigits: int | None = None):
    """Leave-one-out target encoding: for each row,
    ``(sum(target) over its category − own target) / (count − 1)``;
    NULL for singleton categories (no peers to average).

    Returns the input Dataset with ``out_col`` (default
    ``{target_col}_te_loo``) appended. Lazy end to end; the only
    materialized object is the O(categories) stats table (or nothing,
    on the join path)."""
    out_col = out_col or f"{target_col}_te_loo"
    stats = _category_stats(ds, cat_col, target_col)
    n_cat = stats.count()

    if n_cat <= max_broadcast:
        sp = stats.to_pandas()
        import ray

        # sort ONCE on the driver (ADVICE r4): at max_broadcast=2M
        # categories a per-batch argsort would repeat a 2M-element sort
        # across the whole scan; the closure only searchsorts
        _cats = sp[cat_col].to_numpy()
        _order = np.argsort(_cats, kind="stable")
        cats_ref = ray.put((
            _cats[_order],
            sp["__te_sum"].to_numpy(dtype=np.float64)[_order],
            sp["__te_cnt"].to_numpy(dtype=np.int64)[_order],
        ))

        def attach(batch: pa.Table) -> pa.Table:
            cats_s, sums_s, cnts_s = ray.get(cats_ref)
            keys = batch.column(cat_col).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(cats_s, keys)
            y = batch.column(target_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
            cnt = cnts_s[pos]
            with np.errstate(invalid="ignore", divide="ignore"):
                te = (sums_s[pos] - y) / (cnt - 1)
            if ndigits is not None:
                te = np.round(te, ndigits)
            return batch.append_column(
                out_col, pa.array(np.where(cnt > 1, te, np.nan),
                                  type=pa.float64(),
                                  mask=(cnt <= 1)))

        return ds.map_batches(attach, batch_format="pyarrow")

    # high-cardinality path: distributed hash join on the category
    joined = ds.join(stats, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=(cat_col,), right_suffix="_r")

    def finish(batch: pa.Table) -> pa.Table:
        y = batch.column(target_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = batch.column("__te_sum").to_numpy(zero_copy_only=False)
        c = batch.column("__te_cnt").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            te = (s - y) / (c - 1)
        if ndigits is not None:
            te = np.round(te, ndigits)
        out = batch.drop_columns(["__te_sum", "__te_cnt"])
        return out.append_column(
            out_col, pa.array(np.where(c > 1, te, np.nan),
                              type=pa.float64(), mask=(c <= 1)))

    return joined.map_batches(finish, batch_format="pyarrow")


def target_encode_smoothed(ds, *, cat_col: str, target_col: str,
                           m: float = 10.0, out_col: str | None = None,
                           max_broadcast: int = DEFAULT_MAX_BROADCAST,
                           ndigits: int | None = None):
    """Bayesian-mean (smoothed) target encoding:
    ``(sum_c + m · global_mean) / (cnt_c + m)`` — shrinks rare
    categories toward the global mean with pseudo-count ``m``.

    Unlike LOO this uses the row's own target too (standard definition);
    pair with a train/val split when leakage matters."""
    from ray.data.aggregate import Sum

    out_col = out_col or f"{target_col}_te"
    stats = _category_stats(ds, cat_col, target_col)
    # exact global mean from the (tiny) category stats: integer partial
    # sums re-sum exactly, so no second pass over the data is needed
    tot = stats.aggregate(Sum("__te_sum", alias_name="__gs"),
                          Sum("__te_cnt", alias_name="__gc"))
    gmean = float(tot["__gs"]) / float(tot["__gc"])

    n_cat = stats.count()
    if n_cat > max_broadcast:
        joined = ds.join(stats, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=(cat_col,), right_suffix="_r")

        def finish(batch: pa.Table) -> pa.Table:
            s = batch.column("__te_sum").to_numpy(zero_copy_only=False)
            c = batch.column("__te_cnt").to_numpy(zero_copy_only=False)
            te = (s + m * gmean) / (c + m)
            if ndigits is not None:
                te = np.round(te, ndigits)
            out = batch.drop_columns(["__te_sum", "__te_cnt"])
            return out.append_column(out_col,
                                     pa.array(te, type=pa.float64()))

        return joined.map_batches(finish, batch_format="pyarrow")

    sp = stats.to_pandas()
    import ray

    # driver-side sort once; the per-batch closure only searchsorts
    _cats = sp[cat_col].to_numpy()
    _order = np.argsort(_cats, kind="stable")
    cats_ref = ray.put((
        _cats[_order],
        sp["__te_sum"].to_numpy(dtype=np.float64)[_order],
        sp["__te_cnt"].to_numpy(dtype=np.int64)[_order],
    ))

    def attach(batch: pa.Table) -> pa.Table:
        cats_s, sums_s, cnts_s = ray.get(cats_ref)
        keys = batch.column(cat_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cats_s, keys)
        te = (sums_s[pos] + m * gmean) / (cnts_s[pos] + m)
        if ndigits is not None:
            te = np.round(te, ndigits)
        return batch.append_column(out_col, pa.array(te, type=pa.float64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def _attach_category_stats(ds, stats, cat_col: str, stat_cols: list[str],
                           finish, max_broadcast: int):
    """Attach an O(categories) stats table onto every row and run
    ``finish`` over the widened batches — broadcast lookup under
    ``max_broadcast`` categories, else a distributed hash join (the same
    measured plan switch as the target encoders)."""
    n_cat = stats.count()
    if n_cat > max_broadcast:
        joined = ds.join(stats, join_type="inner",
                         num_partitions=_join_partitions(),
                         on=(cat_col,), right_suffix="_r")
        return joined.map_batches(finish, batch_format="pyarrow")

    sp = stats.to_pandas()
    import ray

    # driver-side sort once; the per-batch closure only searchsorts
    _cats = sp[cat_col].to_numpy()
    _order = np.argsort(_cats, kind="stable")
    ref = ray.put((_cats[_order],
                   *(sp[c].to_numpy()[_order] for c in stat_cols)))

    def attach(batch: pa.Table) -> pa.Table:
        vals = ray.get(ref)
        pos = np.searchsorted(
            vals[0],
            batch.column(cat_col).to_numpy(zero_copy_only=False))
        b = batch
        for name, col in zip(stat_cols, vals[1:]):
            b = b.append_column(name, pa.array(col[pos]))
        return finish(b)

    return ds.map_batches(attach, batch_format="pyarrow")


def count_encode(ds, *, cat_col: str, count_col: str | None = None,
                 freq_col: str | None = None,
                 max_broadcast: int = DEFAULT_MAX_BROADCAST):
    """Frequency encoding: per-category row count and relative frequency
    (count / total rows). One O(categories) map-side-combined exchange;
    rows never shuffle on the broadcast path."""
    from .relational import grouped_agg

    count_col = count_col or f"{cat_col}_count"
    freq_col = freq_col or f"{cat_col}_freq"
    from ray.data.aggregate import Sum

    stats = grouped_agg(ds, [cat_col], {},
                        count_alias="__ce_cnt").materialize()
    total = int(stats.aggregate(Sum("__ce_cnt", alias_name="__t"))["__t"])

    def finish(b: pa.Table) -> pa.Table:
        c = b.column("__ce_cnt").to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = b.drop_columns(["__ce_cnt"])
        b = b.append_column(count_col, pa.array(c, type=pa.int64()))
        return b.append_column(
            freq_col, pa.array(c / float(total), type=pa.float64()))

    return _attach_category_stats(ds, stats, cat_col, ["__ce_cnt"],
                                  finish, max_broadcast)


def minmax_scale(ds, *, key: str, value_col: str,
                 out_col: str | None = None,
                 max_broadcast: int = DEFAULT_MAX_BROADCAST):
    """Per-group min-max scaling ``(x − min) / (max − min)``; NULL when
    the group is constant. Unlike quantile scaling this needs only a
    per-group (min, max) aggregate — one O(groups) exchange plus a
    stateless attach; the data rows never shuffle on the broadcast
    path."""
    from .relational import grouped_agg

    out_col = out_col or f"{value_col}_minmax"
    stats = grouped_agg(
        ds, [key], {"__mm_min": (value_col, "min"),
                    "__mm_max": (value_col, "max")}).materialize()

    def finish(b: pa.Table) -> pa.Table:
        x = b.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        mn = b.column("__mm_min").to_numpy(
            zero_copy_only=False).astype(np.float64)
        mx = b.column("__mm_max").to_numpy(
            zero_copy_only=False).astype(np.float64)
        span = mx - mn
        with np.errstate(invalid="ignore", divide="ignore"):
            y = (x - mn) / span
        b = b.drop_columns(["__mm_min", "__mm_max"])
        return b.append_column(
            out_col, pa.array(np.where(span > 0, y, np.nan),
                              type=pa.float64(), mask=(span <= 0)))

    return _attach_category_stats(ds, stats, key,
                                  ["__mm_min", "__mm_max"],
                                  finish, max_broadcast)


def woe_encode(ds, *, cat_col: str, target_col: str,
               out_col: str | None = None, smooth: float = 0.5,
               max_broadcast: int = DEFAULT_MAX_BROADCAST,
               ndigits: int | None = None):
    """Weight-of-evidence encoding for a BINARY (0/1) target:
    ``ln((pos_c + s) / (neg_c + s)) − ln((pos_tot + s) / (neg_tot + s))``
    per category, with additive smoothing ``s`` so empty cells stay
    finite. Same scale shape as the target encoders: one O(categories)
    sum/count exchange, then broadcast attach or hash join."""
    from ray.data.aggregate import Sum

    out_col = out_col or f"{target_col}_woe"
    stats = _category_stats(ds, cat_col, target_col)
    tot = stats.aggregate(Sum("__te_sum", alias_name="__p"),
                          Sum("__te_cnt", alias_name="__n"))
    pos_tot = float(tot["__p"])
    neg_tot = float(tot["__n"]) - pos_tot
    base = np.log((pos_tot + smooth) / (neg_tot + smooth))

    def finish(b: pa.Table) -> pa.Table:
        pos = b.column("__te_sum").to_numpy(
            zero_copy_only=False).astype(np.float64)
        cnt = b.column("__te_cnt").to_numpy(
            zero_copy_only=False).astype(np.float64)
        woe = np.log((pos + smooth) / (cnt - pos + smooth)) - base
        if ndigits is not None:
            woe = np.round(woe, ndigits)
        b = b.drop_columns(["__te_sum", "__te_cnt"])
        return b.append_column(out_col, pa.array(woe, type=pa.float64()))

    return _attach_category_stats(ds, stats, cat_col,
                                  ["__te_sum", "__te_cnt"],
                                  finish, max_broadcast)


def ordinal_encode(ds, *, cat_col: str, out_col: str | None = None,
                   max_broadcast: int = DEFAULT_MAX_BROADCAST):
    """Ordinal (dense-rank) encoding: each category value maps to its
    1-based position in the SORTED distinct-category list
    (== SQL ``dense_rank() OVER (ORDER BY cat)``).

    One O(categories) distinct exchange; under ``max_broadcast`` the
    sorted vocabulary broadcasts and rows never shuffle, else the
    distinct table is ranked by the distributed range sort
    (:func:`relational.global_rank` — category-sized, not row-sized)
    and attached with the hash join. The join path needs a NUMERIC
    category column (the range sort samples float boundaries); a string
    vocabulary above ``max_broadcast`` should be hash-bucketed first."""
    from .relational import grouped_agg

    out_col = out_col or f"{cat_col}_ord"
    stats = grouped_agg(ds, [cat_col], {},
                        count_alias="__oe_cnt").materialize()
    n_cat = stats.count()

    if n_cat <= max_broadcast:
        sp = stats.to_pandas()
        import ray

        vocab_ref = ray.put(np.sort(sp[cat_col].to_numpy()))

        def attach(batch: pa.Table) -> pa.Table:
            vocab = ray.get(vocab_ref)
            keys = batch.column(cat_col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                out_col, pa.array(np.searchsorted(vocab, keys) + 1,
                                  type=pa.int64()))

        return ds.map_batches(attach, batch_format="pyarrow")

    from .relational import global_rank

    ranked = global_rank(stats.drop_columns(["__oe_cnt"]),
                         by=[cat_col], descending=[False],
                         rank_col=out_col)
    joined = ds.join(ranked, join_type="inner",
                     num_partitions=_join_partitions(),
                     on=(cat_col,), right_suffix="_r")
    return joined.map_batches(
        lambda b: b.set_column(
            b.column_names.index(out_col), out_col,
            pc.cast(b.column(out_col), pa.int64())),
        batch_format="pyarrow")


def winsorize(ds, *, key: str, value_col: str,
              p_lo: float = 0.05, p_hi: float = 0.95,
              out_col: str | None = None, ndigits: int | None = None):
    """Per-group winsorization: clip values to the group's
    [p_lo, p_hi] linear-interpolation quantiles (== SQL quantile_cont).
    Continuous quantiles need the group's values together, so this is
    one data-sized hash exchange with the clip segment-vectorized per
    group inside each partition (same shape as :func:`robust_scale`)."""
    out_col = out_col or f"{value_col}_wins"

    def clip(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="stable").reset_index(drop=True)
        keys = g[key].to_numpy()
        x = g[value_col].to_numpy(dtype=np.float64)
        m = len(g)
        if m == 0:
            g[out_col] = pd.Series([], dtype="float64")
            return g
        new = np.empty(m, dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [m]))
        out = np.empty(m, dtype=np.float64)
        for s, e in zip(starts, ends):
            ql, qh = np.percentile(x[s:e], [100.0 * p_lo, 100.0 * p_hi])
            out[s:e] = np.minimum(np.maximum(x[s:e], ql), qh)
        if ndigits is not None:
            out = np.round(out, ndigits)
        g[out_col] = out
        return g

    return ds.groupby(key).map_groups(clip, batch_format="pandas")


def robust_scale(ds, *, key: str, value_col: str,
                 out_col: str | None = None, ndigits: int | None = None):
    """Per-group robust scaling ``(x − median) / (q75 − q25)`` with
    linear-interpolation quantiles (numpy 'linear' == SQL
    quantile_cont). NULL when the IQR is zero (constant group).

    One hash exchange of the data rows; quantiles and scaling are
    segment-vectorized per group inside each partition (one sort +
    reduceat per frame, no per-row Python)."""
    out_col = out_col or f"{value_col}_robust"

    def scale(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key, kind="stable").reset_index(drop=True)
        keys = g[key].to_numpy()
        x = g[value_col].to_numpy(dtype=np.float64)
        m = len(g)
        if m == 0:
            g[out_col] = pd.Series([], dtype="float64")
            return g
        new = np.empty(m, dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [m]))
        out = np.empty(m, dtype=np.float64)
        null = np.zeros(m, dtype=bool)
        # segment loop over GROUPS (not rows): each body is vectorized;
        # group count per partition is small by construction
        for s, e in zip(starts, ends):
            q25, q50, q75 = np.percentile(x[s:e], [25.0, 50.0, 75.0])
            iqr = q75 - q25
            if iqr == 0.0:
                null[s:e] = True
                out[s:e] = np.nan
            else:
                out[s:e] = (x[s:e] - q50) / iqr
        if ndigits is not None:
            out = np.round(out, ndigits)
        g[out_col] = pd.array(np.where(null, np.nan, out),
                              dtype="float64")
        if null.any():
            g.loc[null, out_col] = None
        return g

    return ds.groupby(key).map_groups(scale, batch_format="pandas")
