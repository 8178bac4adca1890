"""Dataset-level operators: the Ray-Data-native windowed feature engine.

Composition (SURVEY.md §7.3): ONE explicit range-partition shuffle
(:mod:`partition`) co-locates complete entities (or time-contiguous
sub-ranges of hot entities), then every windowed / point-in-time operator
runs inside a single vectorized per-partition kernel (:mod:`kernels`) over
zero-copy Arrow — `groupby(__part).map_groups(kernel, batch_format="pyarrow")`.

Operators:

- :func:`window_features` — lag/lead, rolling (rows + time), ffill/bfill,
  sessionize, per-entity z-score, exact dedup, in one pass (reference
  analogs: delta ±context ``FeaGet.py:287-290``, sliding CMVN
  ``IVector.py:348,508-514``, VAD segmentation ``FeaGet.py:292-297``,
  dedup ``PrepareData.py:647-658``).
- :func:`asof_join` — point-in-time backward join of a spine of
  ``(key, as_of_ts)`` request rows against the event table (reference
  analog: the ``cep[start:stop]`` cut, ``IVector.py:796-800``; IdMap spine,
  ``PrepareData.py:262-269``). Zero temporal leakage by construction: only
  events with ``ts <= as_of_ts`` are reachable.
- :func:`feature_stack` — windows + as-of fused into the same single
  shuffle: spine rows receive the windowed features of their matched event.

Skew: hot keys get dedicated partitions from the plan; when the plan
sub-splits a hot entity into time ranges, kernels consume boundary state
(context rows, session offsets, fill carries, entity moments) computed
exactly by :mod:`splitstate`'s cheap narrow pre-pass + driver fold.

Nothing here calls ray.init(); Datasets are built lazily and stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import deltas, kernels, splitstate
from .partition import PartitionPlan, assign_partition_ids, plan_partitions
from .splitstate import CTX_COL, SubCorrection

PART_COL = "__part"
SIDE_COL = "__side"


# --------------------------------------------------------------------------
# spec
# --------------------------------------------------------------------------

@dataclass
class WindowSpec:
    """What the windowed feature stack computes.

    All per-entity, ordered by ``(ts, tiebreak)``. Output column names:
    ``{col}_lag_{k}``, ``{col}_lead_{k}``, ``{col}_roll_{stat}_{w}``,
    ``{col}_troll_{stat}``, ``{col}_ffill``, ``{col}_bfill``, ``{col}_z``,
    ``{col}_delta_{k}``, ``{col}_ddelta_{k}``,
    ``session_idx``, ``session_event_idx``, ``session_len``.
    """

    key: str
    ts: str
    tiebreak: str | None = None
    lags: dict[str, list[int]] = field(default_factory=dict)
    leads: dict[str, list[int]] = field(default_factory=dict)
    # regression delta / double-delta over ±k rows (deltas.py; the
    # reference FeaturesServer's delta=/double_delta= options,
    # IVector.py:256-266). Forward-looking like leads: refuses hot-key
    # splitting (same guard).
    deltas: dict[str, list[int]] = field(default_factory=dict)
    double_deltas: dict[str, list[int]] = field(default_factory=dict)
    rolling: dict[str, list[int]] = field(default_factory=dict)
    rolling_stats: tuple[str, ...] = ("sum", "mean", "min", "max", "std", "count")
    rolling_time: dict[str, list[int]] = field(default_factory=dict)  # µs
    rolling_time_stats: tuple[str, ...] = ("sum", "count")
    ffill: list[str] = field(default_factory=list)
    bfill: list[str] = field(default_factory=list)
    session_gap_us: int | None = None
    zscore: list[str] = field(default_factory=list)
    expanding_zscore: list[str] = field(default_factory=list)
    dedup: bool = False

    @property
    def context_rows(self) -> int:
        """Trailing rows a sub-split boundary must carry for exactness."""
        c = 1
        for ks in self.lags.values():
            c = max(c, max(ks, default=0))
        for ks in self.leads.values():
            c = max(c, max(ks, default=0))
        for ws in self.rolling.values():
            c = max(c, max(ws, default=1) - 1)
        for ks in self.deltas.values():
            c = max(c, max(ks, default=0))
        for ks in self.double_deltas.values():
            c = max(c, 2 * max(ks, default=0))
        return c

    def numeric_cols(self) -> list[str]:
        cols = set()
        for d in (self.lags, self.leads, self.rolling, self.rolling_time,
                  self.deltas, self.double_deltas):
            cols.update(d.keys())
        cols.update(self.ffill)
        cols.update(self.bfill)
        cols.update(self.zscore)
        cols.update(self.expanding_zscore)
        return sorted(cols)


# --------------------------------------------------------------------------
# per-partition kernels (run inside map_groups)
# --------------------------------------------------------------------------

def _num_sorted(part: kernels.SortedPartition, name: str) -> np.ndarray:
    """float64 values of a column in SORTED order (numpy gather, no Arrow
    take of payloads)."""
    col = part.orig.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    x = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
    return x[part.order]


def _is_numeric_col(part: kernels.SortedPartition, name: str) -> bool:
    t = part.orig.schema.field(name).type
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_timestamp(t))


def _shift_feature(part, col: str, idx: np.ndarray, valid: np.ndarray):
    """lag/lead column in SORTED space: numpy shift for numeric columns,
    Arrow take for payload (list/string) columns."""
    src = part.orig.column(col)
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    if _is_numeric_col(part, col):
        orig_idx = part.order[np.clip(idx, 0, max(part.n - 1, 0))]
        return kernels.take_with_mask(src, orig_idx, valid)
    sorted_col = part.sorted_column(col)
    return kernels.take_with_mask(sorted_col, idx, valid)


def _compute_window_columns(
    part: kernels.SortedPartition, spec: WindowSpec
) -> dict[str, object]:
    """All windowed feature columns for one sorted view, in SORTED space.

    Values are numpy float/int arrays or Arrow arrays; callers align them
    (scatter via part.inv for original-order output, or gather by as-of
    match index)."""
    out: dict[str, object] = {}
    for col, ks in spec.lags.items():
        for k in ks:
            idx, valid = kernels.lag_indices(part, k)
            out[f"{col}_lag_{k}"] = _shift_feature(part, col, idx, valid)
    for col, ks in spec.leads.items():
        for k in ks:
            idx, valid = kernels.lead_indices(part, k)
            out[f"{col}_lead_{k}"] = _shift_feature(part, col, idx, valid)
    for col, ws in spec.rolling.items():
        x = _num_sorted(part, col)
        for w in ws:
            stats = kernels.rolling_rows(part, x, w)
            for s in spec.rolling_stats:
                out[f"{col}_roll_{s}_{w}"] = stats[s]
    for col, wins in spec.rolling_time.items():
        x = _num_sorted(part, col)
        for w in wins:
            stats = kernels.rolling_time(part, x, w)
            for s in spec.rolling_time_stats:
                v = stats[s]
                out[f"{col}_troll_{s}_{w}"] = (
                    v.astype(np.int64) if s == "count" else v)
    for col in spec.ffill:
        x = _num_sorted(part, col)
        idx, ok = kernels.ffill_indices(part, ~np.isnan(x))
        out[f"{col}_ffill"] = np.where(ok, x[np.clip(idx, 0, None)], np.nan)
    for col in spec.bfill:
        x = _num_sorted(part, col)
        idx, ok = kernels.bfill_indices(part, ~np.isnan(x))
        out[f"{col}_bfill"] = np.where(ok, x[np.clip(idx, 0, None)], np.nan)
    if spec.session_gap_us is not None:
        sess = kernels.sessionize(part, spec.session_gap_us)
        out["session_idx"] = sess["session_idx"]
        out["session_event_idx"] = sess["session_event_idx"]
        out["session_len"] = sess["session_len"]
    for col in spec.zscore:
        x = _num_sorted(part, col)
        out[f"{col}_z"] = kernels.zscore(part, x)
    for col in spec.expanding_zscore:
        x = _num_sorted(part, col)
        out[f"{col}_ez"] = kernels.expanding_zscore(part, x)
    for col, ks in spec.deltas.items():
        x = _num_sorted(part, col)
        for k in ks:
            out[f"{col}_delta_{k}"] = deltas.delta(part, x, k)
    for col, ks in spec.double_deltas.items():
        x = _num_sorted(part, col)
        for k in ks:
            out[f"{col}_ddelta_{k}"] = deltas.double_delta(part, x, k)
    return out


def _scatter_to_orig(part: kernels.SortedPartition, feat) -> pa.Array:
    """Sorted-space feature → column aligned to the ORIGINAL row order."""
    inv = part.inv
    if isinstance(feat, np.ndarray):
        return pa.array(feat[inv], from_pandas=True)
    return pc.take(feat, pa.array(inv, type=pa.int64()))


def _split_sessionize(
    part: kernels.SortedPartition, n_ctx: int, gap_us: int,
    corr: SubCorrection,
) -> dict[str, np.ndarray]:
    """Session columns for a split sub: exact via fold corrections.

    Sized over ALL rows (ctx + local). Only local rows and the LAST ctx row
    carry exact values (the last ctx row is the only ctx row an as-of merge
    can ever match — it is the latest event before the sub's range)."""
    n_all = part.n
    n_loc = n_all - n_ctx
    sidx = np.zeros(n_all, dtype=np.int64)
    seidx = np.zeros(n_all, dtype=np.int64)
    slen = np.zeros(n_all, dtype=np.int64)
    if n_loc > 0:
        tsl = part.ts[n_ctx:]
        new = np.empty(n_loc, dtype=bool)
        new[0] = True
        if n_loc > 1:
            new[1:] = np.diff(tsl) > gap_us
        sl = np.cumsum(new.astype(np.int64))          # local session idx
        starts = np.flatnonzero(new)
        se = np.arange(n_loc, dtype=np.int64) - starts[sl - 1] + 1
        lens = np.diff(np.concatenate((starts, [n_loc])))
        ln = lens[sl - 1].copy()
        first = sl == 1
        last = sl == sl[-1]
        if corr.merge:
            se[first] += corr.prior_rows
            if corr.first_total is not None:
                ln[first] = corr.first_total
        if corr.last_total is not None:
            ln[last] = corr.last_total
        sidx[n_ctx:] = sl + corr.session_offset - (1 if corr.merge else 0)
        seidx[n_ctx:] = se
        slen[n_ctx:] = ln
    if n_ctx > 0:
        # only the last ctx row needs exact values (see docstring)
        sidx[:n_ctx] = max(corr.session_offset, 1)
        if corr.merge:
            seidx[n_ctx - 1] = corr.prior_rows
            slen[n_ctx - 1] = (corr.first_total
                               if corr.first_total is not None
                               else (corr.prior_rows
                                     + (slen[n_ctx] if n_loc else 0)))
            if n_loc and corr.first_total is None:
                slen[n_ctx - 1] = slen[n_ctx]
        else:
            seidx[n_ctx - 1] = corr.prev_last_seidx
            slen[n_ctx - 1] = corr.prev_last_slen
    return {"session_idx": sidx, "session_event_idx": seidx,
            "session_len": slen}


def _compute_split_columns(
    part: kernels.SortedPartition, n_ctx: int, spec: WindowSpec,
    corr: SubCorrection,
) -> dict[str, object]:
    """Feature columns (SORTED space) for one hot-entity sub — ctx rows
    included in the input view, session/fill/moment state from the fold."""
    out: dict[str, object] = {}
    for col, ks in spec.lags.items():
        for k in ks:
            idx, valid = kernels.lag_indices(part, k)
            out[f"{col}_lag_{k}"] = _shift_feature(part, col, idx, valid)
    for col, ks in spec.leads.items():
        for k in ks:
            idx, valid = kernels.lead_indices(part, k)
            out[f"{col}_lead_{k}"] = _shift_feature(part, col, idx, valid)
    for col, ws in spec.rolling.items():
        x = _num_sorted(part, col)
        for w in ws:
            stats = kernels.rolling_rows(part, x, w)
            for s in spec.rolling_stats:
                out[f"{col}_roll_{s}_{w}"] = stats[s]
    for col, wins in spec.rolling_time.items():
        x = _num_sorted(part, col)
        for w in wins:
            stats = kernels.rolling_time(part, x, w)
            for s in spec.rolling_time_stats:
                v = stats[s]
                out[f"{col}_troll_{s}_{w}"] = (
                    v.astype(np.int64) if s == "count" else v)
    for col in spec.ffill:
        x = _num_sorted(part, col)
        idx, ok = kernels.ffill_indices(part, ~np.isnan(x))
        vals = np.where(ok, x[np.clip(idx, 0, None)], np.nan)
        carry = corr.ffill_carry.get(col, np.nan)
        if not (isinstance(carry, float) and np.isnan(carry)):
            vals = np.where(ok, vals, float(carry))
        out[f"{col}_ffill"] = vals
    for col in spec.bfill:
        # bfill across a FORWARD boundary would need future state; split
        # subs only support bfill within the sub (rejected upstream).
        x = _num_sorted(part, col)
        idx, ok = kernels.bfill_indices(part, ~np.isnan(x))
        out[f"{col}_bfill"] = np.where(ok, x[np.clip(idx, 0, None)], np.nan)
    if spec.session_gap_us is not None:
        sess = _split_sessionize(part, n_ctx, spec.session_gap_us, corr)
        out["session_idx"] = sess["session_idx"]
        out["session_event_idx"] = sess["session_event_idx"]
        out["session_len"] = sess["session_len"]
    for col in spec.zscore:
        x = _num_sorted(part, col)
        cnt, s, ssq = corr.moments.get(col, (0.0, 0.0, 0.0))
        if cnt >= 2:
            var = max(ssq - s * s / cnt, 0.0) / (cnt - 1)
            std = float(np.sqrt(var))
        else:
            std = 0.0
        z = np.full(part.n, np.nan)
        if std > 0.0:
            z = (x - (s / cnt)) / std
            z[np.isnan(x)] = np.nan
        out[f"{col}_z"] = z
    for col in spec.expanding_zscore:
        x = _num_sorted(part, col)
        z = np.full(part.n, np.nan)
        pref = corr.prefix_moments.get(col, (0.0, 0.0, 0.0))
        if part.n > n_ctx:
            z[n_ctx:] = kernels.expanding_zscore_with_prefix(x[n_ctx:], pref)
        if n_ctx > 0:
            # last ctx row = final surviving row of the previous sub, the
            # only ctx row an as-of can match; its expanding moments are
            # exactly the prefix fold (which ends with this row)
            p_c, p_s, p_s2 = pref
            if p_c >= 2 and not np.isnan(x[n_ctx - 1]):
                var = max(p_s2 - p_s * p_s / p_c, 0.0) / (p_c - 1)
                std = float(np.sqrt(var))
                if std > 0.0:
                    z[n_ctx - 1] = (x[n_ctx - 1] - p_s / p_c) / std
        out[f"{col}_ez"] = z
    return out



class _WindowKernel:
    """map_groups callable: one partition in → feature rows out."""

    def __init__(self, spec: WindowSpec,
                 corrections: dict[int, SubCorrection] | None = None):
        self.spec = spec
        self.corrections = corrections or {}

    def __call__(self, group: pa.Table) -> pa.Table:
        """Handles a block holding one or many partitions: all non-split
        rows are processed in ONE vectorized pass (kernels segment by
        entity, not by partition); each split sub is processed with its
        fold correction."""
        spec = self.spec
        if group.num_rows == 0:
            return group
        pids = (group.column(PART_COL).to_numpy(zero_copy_only=False)
                if PART_COL in group.column_names else None)
        split_pids = (np.array(sorted(
            {p for p in np.unique(pids) if p in self.corrections}))
            if pids is not None and self.corrections else np.zeros(0))
        drop = [c for c in (PART_COL, CTX_COL) if c in group.column_names]
        if len(split_pids) == 0:
            g = group.drop_columns(drop) if drop else group
            return self._plain(g)
        is_split = np.isin(pids, split_pids)
        outs = []
        plain = group.filter(pa.array(~is_split))
        if plain.num_rows:
            outs.append(self._plain(plain.drop_columns(drop)))
        for p in split_pids:
            sub = group.filter(pa.array(pids == p))
            outs.append(self._split(sub, self.corrections[int(p)]))
        return pa.concat_tables(outs, promote_options="default")

    def _plain(self, group: pa.Table) -> pa.Table:
        spec = self.spec
        part = kernels.sort_partition(group, spec.key, spec.ts, spec.tiebreak)
        if spec.dedup:
            keep = kernels.dedup_first_mask(part)
            if not keep.all():
                part = kernels.filter_sorted(part, keep)
                feats = _compute_window_columns(part, spec)
                tbl = part.table  # reduced sorted materialization
                for name, arr in feats.items():
                    tbl = tbl.append_column(
                        name, arr if not isinstance(arr, np.ndarray)
                        else pa.array(arr, from_pandas=True))
                return tbl
        feats = _compute_window_columns(part, spec)
        tbl = part.orig
        for name, arr in feats.items():
            tbl = tbl.append_column(name, _scatter_to_orig(part, arr))
        return tbl

    def _split(self, group: pa.Table, corr: SubCorrection) -> pa.Table:
        spec = self.spec
        drop = [c for c in (PART_COL,) if c in group.column_names]
        if drop:
            group = group.drop_columns(drop)
        part = kernels.sort_partition(group, spec.key, spec.ts, spec.tiebreak)
        if spec.dedup:
            keep = kernels.dedup_first_mask(part)
            if not keep.all():
                part = kernels.filter_sorted(part, keep)
        has_ctx = CTX_COL in group.column_names
        ctx_orig = (group.column(CTX_COL).to_numpy(zero_copy_only=False)
                    if has_ctx else np.zeros(group.num_rows, dtype=np.int8))
        ctx_sorted = ctx_orig[part.order]
        n_ctx = int((ctx_sorted == 1).sum())
        feats = _compute_split_columns(part, n_ctx, spec, corr)
        # output = real (non-ctx) surviving rows, original order
        keep_sorted = ctx_sorted == 0
        reduced = kernels.filter_sorted(part, keep_sorted)
        tbl = part.orig.take(pa.array(reduced.order, type=pa.int64()))
        for name, arr in feats.items():
            if isinstance(arr, np.ndarray):
                tbl = tbl.append_column(
                    name, pa.array(arr[keep_sorted], from_pandas=True))
            else:
                tbl = tbl.append_column(
                    name, pc.take(arr, pa.array(
                        np.flatnonzero(keep_sorted), type=pa.int64())))
        if has_ctx and CTX_COL in tbl.column_names:
            tbl = tbl.drop_columns([CTX_COL])
        return tbl


class _AsofKernel:
    """map_groups callable over the tagged union of events + spine rows.

    Emits one row per spine row: spine columns + matched event value
    columns (+ windowed features of the matched event when `spec` given).
    """

    def __init__(
        self,
        key: str,
        ts: str,
        tiebreak: str | None,
        value_cols: list[str],
        spine_cols: list[str],
        tolerance_us: int | None = None,
        spec: WindowSpec | None = None,
        dedup: bool = False,
        corrections: dict[int, SubCorrection] | None = None,
        exclude_feats: tuple[str, ...] = (),
        range_windows: dict[str, tuple[int, str | None]] | None = None,
        direction: str = "backward",
    ):
        self.key, self.ts, self.tiebreak = key, ts, tiebreak
        self.direction = direction
        self.value_cols = value_cols
        self.spine_cols = spine_cols
        self.tolerance_us = tolerance_us
        self.spec = spec
        self.dedup = dedup
        self.corrections = corrections or {}
        self.exclude_feats = set(exclude_feats)
        # name -> (window_us, value_col | None): per spine row, count (and
        # optionally sum of value_col) of events in [as_of_ts - W, as_of_ts]
        self.range_windows = range_windows or {}

    def __call__(self, group: pa.Table) -> pa.Table:
        """Multi-partition block: non-split partitions merge in one pass;
        each split sub merges with its fold correction."""
        if group.num_rows == 0:
            return self._one(group, None)
        pids = (group.column(PART_COL).to_numpy(zero_copy_only=False)
                if PART_COL in group.column_names else None)
        split_pids = (np.array(sorted(
            {p for p in np.unique(pids) if p in self.corrections}))
            if pids is not None and self.corrections else np.zeros(0))
        if len(split_pids) == 0:
            return self._one(group, None)
        is_split = np.isin(pids, split_pids)
        outs = []
        plain = group.filter(pa.array(~is_split))
        if plain.num_rows:
            outs.append(self._one(plain, None))
        for p in split_pids:
            sub = group.filter(pa.array(pids == p))
            outs.append(self._one(sub, self.corrections[int(p)]))
        return pa.concat_tables(outs, promote_options="default")

    def _range_agg(self, part, sp_codes, present, sp_ts, W: int,
                   vcol: str | None):
        """Per spine row: count (and optional sum of vcol) of events with
        the same key in [as_of_ts − W, as_of_ts] — the range-join kernel
        (vectorized composite binary search; SURVEY.md §2.4 J8 extended
        to true interval semantics)."""
        n_sp = len(sp_ts)
        if part.n == 0 or n_sp == 0:
            z = np.zeros(n_sp, dtype=np.int64)
            return z, np.full(n_sp, np.nan)
        all_min = min(int(part.ts.min()), int(sp_ts.min()))
        ev_rel = part.ts - all_min
        sp_rel = sp_ts - all_min
        span = max(int(ev_rel.max()), int(sp_rel.max()) if n_sp else 0)
        off = np.int64(span + 2)
        max_code = int(max(part.codes.max(),
                           sp_codes.max() if n_sp else 0))
        if (max_code + 1) * int(off) >= (1 << 62):
            raise OverflowError(
                "range-join composite overflow; partition too wide")
        comp_ev = part.codes * off + ev_rel
        spc = np.where(present, sp_codes, 0)
        lo = np.searchsorted(comp_ev,
                             spc * off + np.maximum(sp_rel - W, 0),
                             side="left")
        hi = np.searchsorted(comp_ev, spc * off + sp_rel, side="right")
        cnt = np.where(present, hi - lo, 0).astype(np.int64)
        vsum = np.full(n_sp, np.nan)
        if vcol is not None:
            x = _num_sorted(part, vcol)
            valid = ~np.isnan(x)
            cs = np.concatenate(([0.0], np.cumsum(np.where(valid, x, 0.0))))
            cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
            nval = cc[hi] - cc[lo]
            s = cs[hi] - cs[lo]
            vsum = np.where(present & (nval > 0), s, np.nan)
        return cnt, vsum

    def _one(self, group: pa.Table, corr: SubCorrection | None) -> pa.Table:
        side = (group.column(SIDE_COL).to_numpy(zero_copy_only=False)
                if group.num_rows else np.zeros(0, dtype=np.int8))
        drop = [c for c in (PART_COL, SIDE_COL) if c in group.column_names]
        if corr is None and CTX_COL in group.column_names:
            drop.append(CTX_COL)
        ev_tbl = group.filter(pa.array(side == 0)).drop_columns(drop)
        sp_tbl = group.filter(pa.array(side == 1)).drop_columns(drop)

        part = kernels.sort_partition(ev_tbl, self.key, self.ts, self.tiebreak)
        if self.dedup:
            keep = kernels.dedup_first_mask(part)
            if not keep.all():
                part = kernels.filter_sorted(part, keep)

        feats: dict[str, object] = {}
        if corr is not None:
            # split sub: ctx rows are real prior events with full payload —
            # valid as-of candidates AND window context; features computed
            # with fold corrections (sessions, ffill carry, moments).
            ctx_orig = (
                ev_tbl.column(CTX_COL).to_numpy(zero_copy_only=False)
                if CTX_COL in ev_tbl.column_names
                else np.zeros(ev_tbl.num_rows, dtype=np.int8))
            n_ctx = int((ctx_orig[part.order] == 1).sum())
            if self.spec is not None:
                feats = _compute_split_columns(part, n_ctx, self.spec, corr)
        elif self.spec is not None:
            feats = _compute_window_columns(part, self.spec)

        # shared code space: spine keys mapped into the partition's encoding
        sp_keys = sp_tbl.column(self.key).to_numpy(zero_copy_only=False)
        sp_codes, present = kernels.map_keys_to_codes(part.uniques, sp_keys)
        sp_ts = sp_tbl.column(self.ts).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if self.direction == "nearest":
            if corr is not None:
                # hot-split ctx rows duplicate PRIOR events only; a
                # nearest match near a sub boundary could need future
                # rows from the next sub — refuse rather than be wrong
                raise ValueError(
                    "direction='nearest' is not supported on hot-split "
                    "partitions (forward context is not duplicated); "
                    "disable split_hot_keys for this join")
            idx, valid = kernels.asof_merge_nearest(
                part.codes, part.ts, np.where(present, sp_codes, 0),
                sp_ts, self.tolerance_us)
        else:
            idx, valid = kernels.asof_merge(
                part.codes, part.ts, np.where(present, sp_codes, 0), sp_ts,
                self.tolerance_us)
        valid &= present

        out = sp_tbl.select(self.spine_cols)
        out = out.rename_columns(
            [c if c != self.ts else "as_of_ts" for c in self.spine_cols])
        for name, (W, vcol) in self.range_windows.items():
            cnt, vsum = self._range_agg(part, sp_codes, present, sp_ts,
                                        int(W), vcol)
            out = out.append_column(f"{name}_count", pa.array(cnt))
            if vcol is not None:
                out = out.append_column(f"{name}_sum",
                                        pa.array(vsum, from_pandas=True))
        safe_idx = np.clip(idx, 0, max(part.n - 1, 0))
        orig_idx = (part.order[safe_idx] if part.n
                    else np.zeros(len(idx), dtype=np.int64))
        for c in self.value_cols:
            col = ev_tbl.column(c)
            out = out.append_column(
                f"matched_{c}" if c == self.ts else c,
                kernels.take_with_mask(col, orig_idx, valid))
        for name, arr in feats.items():
            if name in self.exclude_feats:
                continue
            if isinstance(arr, np.ndarray):
                vals = (arr[safe_idx] if part.n
                        else np.zeros(len(idx), dtype=arr.dtype))
                if np.issubdtype(arr.dtype, np.floating):
                    col = pa.array(np.where(valid, vals, np.nan),
                                   from_pandas=True)
                else:
                    col = pa.array(vals, mask=~valid)
                out = out.append_column(name, col)
            else:
                out = out.append_column(
                    name, kernels.take_with_mask(arr, idx, valid))
        return out


# --------------------------------------------------------------------------
# public operators
# --------------------------------------------------------------------------

def _ensure_plan(ds, key, ts, plan, **plan_kwargs) -> PartitionPlan:
    if plan is None:
        plan = plan_partitions(ds, key, ts, **plan_kwargs)
    return plan


import os as _os

EXCHANGE = _os.environ.get("FE_EXCHANGE", "push")  # "push"|"groupby"|"hash"


def use_push_shuffle(ds):
    """Switch one dataset chain to the push-based sort shuffle (per-dataset
    context copy — the session default is untouched). Measured on the
    4M-row flagship: pull-based sort ANTI-scaled (52s@8cpu → 73s@32cpu),
    push-based scales (61s@8 → 25s@32); hash-shuffle was worse than push
    at both widths."""
    try:
        from ray.data.context import ShuffleStrategy

        ds.context.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except (ImportError, AttributeError):
        pass
    return ds


def _exchange_by_part(tagged, plan: PartitionPlan, kern_fn):
    """The engine's one all-to-all: co-locate rows by __part, then run the
    per-partition kernel (kernels handle blocks holding one or many
    complete partitions — they segment by entity internally)."""
    if EXCHANGE == "hash":
        try:
            from ray.data.context import ShuffleStrategy

            tagged.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            rp = tagged.repartition(num_blocks=plan.n_parts, keys=[PART_COL],
                                    sort=False)
            return rp.map_batches(kern_fn, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)
        except (ImportError, AttributeError):
            pass
    if EXCHANGE == "push":
        use_push_shuffle(tagged)
    return tagged.groupby(PART_COL).map_groups(
        kern_fn, batch_format="pyarrow")


class _AssignPart:
    """Adds __part; with a ctx_map also duplicates the boundary-context
    rows of split hot entities into their next sub, flagged __ctx=1 (full
    payload — these are the as-of / lag / rolling context carriers)."""

    def __init__(self, plan: PartitionPlan, ts: str | None, ctx_map=None):
        self.plan, self.ts, self.ctx_map = plan, ts, ctx_map

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_col = batch.column(self.plan.key)
        tsv = None
        if self.ts is not None and self.plan.hot_splits:
            tsv = batch.column(self.ts).cast(pa.int64()).to_numpy(
                zero_copy_only=False)
        pid = assign_partition_ids(key_col, self.plan, tsv)
        out = batch.append_column(PART_COL, pa.array(pid, type=pa.int32()))
        if not self.ctx_map:
            return out
        out = out.append_column(
            CTX_COL, pa.array(np.zeros(batch.num_rows, dtype=np.int8)))
        # map rows → ctx-key index through C++ dictionary codes: Python
        # work is O(unique keys in batch), never an object-equality scan
        # per split key per row (that was O(split_keys × rows) and became
        # the dominant cost once a 24M corpus produced ~27 split keys)
        kc = key_col.combine_chunks() if isinstance(
            key_col, pa.ChunkedArray) else key_col
        d = kc.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = d.dictionary.to_pylist()
        ctx_keys = list(self.ctx_map.keys())
        ctx_idx_of = {k: j for j, k in enumerate(ctx_keys)}
        code_to_ctx = np.array([ctx_idx_of.get(u, -1) for u in uniq],
                               dtype=np.int64)
        row_ctx = (code_to_ctx[codes] if len(codes)
                   else np.zeros(0, dtype=np.int64))
        if SIDE_COL in batch.column_names:
            side = batch.column(SIDE_COL).to_numpy(zero_copy_only=False)
            row_ctx = np.where(side == 0, row_ctx, -1)  # spine carries no ctx
        cand_rows = np.flatnonzero(row_ctx >= 0)
        if len(cand_rows) == 0:
            return out
        dup_rows_parts: list[np.ndarray] = []
        dup_pids_parts: list[np.ndarray] = []
        for j in np.unique(row_ctx[cand_rows]):
            cts, cpids = self.ctx_map[ctx_keys[int(j)]]
            rows = cand_rows[row_ctx[cand_rows] == j]
            rts = tsv[rows]
            lo = np.searchsorted(cts, rts, side="left")
            hi = np.searchsorted(cts, rts, side="right")
            n_dup = hi - lo
            hit = np.flatnonzero(n_dup > 0)
            if len(hit) == 0:
                continue
            # expand (row, lo..hi) ranges vectorized
            counts = n_dup[hit]
            rep_rows = np.repeat(rows[hit], counts)
            starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            within = (np.arange(int(counts.sum()), dtype=np.int64)
                      - np.repeat(starts, counts))
            rep_j = np.repeat(lo[hit], counts) + within
            dup_rows_parts.append(rep_rows)
            dup_pids_parts.append(cpids[rep_j])
        if not dup_rows_parts:
            return out
        dup_rows = np.concatenate(dup_rows_parts)
        dup_pids = np.concatenate(dup_pids_parts)
        dup = batch.take(pa.array(dup_rows, type=pa.int64()))
        dup = dup.append_column(
            PART_COL, pa.array(dup_pids.astype(np.int32)))
        dup = dup.append_column(
            CTX_COL, pa.array(np.ones(len(dup_rows), dtype=np.int8)))
        return pa.concat_tables([out, dup])


CTX_CAP_LIMIT = 1_000_000  # sanity bound on carried boundary context rows


def _split_state(ds, plan: PartitionPlan, spec: WindowSpec | None,
                 key: str, ts: str, tiebreak: str | None,
                 fused_asof: bool = False, dedup: bool = False,
                 extra_time_windows: list[int] | None = None):
    """Narrow pre-pass + driver fold when the plan sub-splits hot keys."""
    if not plan.hot_splits:
        return None, None
    if spec is not None:
        numeric = spec.numeric_cols()
        gap = spec.session_gap_us
        # fused as-of: the last ctx row is itself a matchable event whose
        # windowed features must be exact → it needs its own C predecessors
        ctx_rows = spec.context_rows + (spec.context_rows if fused_asof else 0)
        twins = [w for ws in spec.rolling_time.values() for w in ws]
        if spec.leads or spec.bfill or spec.deltas or spec.double_deltas:
            # forward context for split entities is not carried; reject
            # rather than silently emit wrong forward-looking features
            # at sub boundaries.
            raise ValueError(
                "lead/bfill/delta are not supported on sub-split hot "
                "entities; disable split_hot_keys or drop them")
    else:
        numeric, gap, ctx_rows, twins = [], None, 1, []
    twins = twins + list(extra_time_windows or [])
    if ctx_rows > CTX_CAP_LIMIT:
        # a row window this deep would make the boundary-context carry as
        # expensive as the data itself — refuse rather than silently
        # truncate the summary tail (ADVICE r01: ctx_cap must not clip)
        raise ValueError(
            f"window context ({ctx_rows} rows after fused doubling) exceeds "
            f"the hot-split context cap {CTX_CAP_LIMIT}; disable "
            "split_hot_keys or shrink the row windows")
    import sys as _sys
    import time as _time
    _timing = _os.environ.get("FE_PHASE_TIMING") == "1"
    _t0 = _time.time()
    summaries = splitstate.presummarize(
        ds, plan, key=key, ts=ts, tiebreak=tiebreak, numeric_cols=numeric,
        gap_us=gap, ctx_cap=max(8192, ctx_rows), dedup=dedup)
    if _timing:
        print(f"[split-state] presummarize: {_time.time() - _t0:.1f}s",
              file=_sys.stderr, flush=True)
        _t0 = _time.time()
    corr = splitstate.fold_corrections(
        summaries, plan, context_rows=ctx_rows, gap_us=gap,
        time_windows_us=twins)
    ctx_map = splitstate.build_ctx_map(corr)
    if _timing:
        print(f"[split-state] fold+ctx_map: {_time.time() - _t0:.1f}s",
              file=_sys.stderr, flush=True)
    return corr, ctx_map


def window_features(
    ds,
    spec: WindowSpec,
    *,
    plan: PartitionPlan | None = None,
    **plan_kwargs,
):
    """The windowed feature stack as one shuffle + one vectorized kernel."""
    plan = _ensure_plan(ds, spec.key, spec.ts, plan, **plan_kwargs)
    corrections, ctx_map = _split_state(ds, plan, spec, spec.key, spec.ts,
                                        spec.tiebreak, dedup=spec.dedup)
    tagged = ds.map_batches(
        _AssignPart(plan, spec.ts, ctx_map), batch_format="pyarrow",
        zero_copy_batch=True)
    kern = _WindowKernel(spec, corrections)

    def window_kernel(group: pa.Table) -> pa.Table:
        return kern(group)

    return _exchange_by_part(tagged, plan, window_kernel)


def _harmonize_batch(batch: pa.Table, schema: pa.Schema, side: int) -> pa.Table:
    """Project one batch onto a common schema (missing cols → nulls)."""
    arrays = []
    for f in schema:
        if f.name == SIDE_COL:
            arrays.append(pa.array(
                np.full(batch.num_rows, side, dtype=np.int8)))
        elif f.name in batch.column_names:
            col = batch.column(f.name)
            arrays.append(col.cast(f.type) if col.type != f.type else col)
        else:
            arrays.append(pa.nulls(batch.num_rows, type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def _harmonize(ds, schema: pa.Schema, side: int):
    """Project a dataset onto a common schema (missing cols → nulls)."""

    def fn(batch: pa.Table) -> pa.Table:
        return _harmonize_batch(batch, schema, side)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _pa_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset, robust to pandas-block datasets."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
        else:
            dt = np.dtype(t)
            if dt.kind == "M":
                fields.append(pa.field(n, pa.timestamp("us")))
            elif dt.kind == "O":
                fields.append(pa.field(n, pa.string()))
            else:
                fields.append(pa.field(n, pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def _union_schema(ev_schema: pa.Schema, sp_schema: pa.Schema,
                  key: str, ts: str, spine_ts: str) -> pa.Schema:
    fields = list(ev_schema)
    names = {f.name for f in fields}
    for f in sp_schema:
        name = ts if f.name == spine_ts else f.name
        if name not in names:
            fields.append(pa.field(name, f.type))
            names.add(name)
    fields.append(pa.field(SIDE_COL, pa.int8()))
    return pa.schema(fields)


def _build_asof(
    events, spine, *, key, ts, spine_ts, value_cols, tolerance_us,
    tiebreak, dedup, spec, plan, exclude_feats,
    range_windows: dict | None = None, direction: str = "backward",
    **plan_kwargs,
):
    """Shared construction for asof_join and the resumable lineage sink:
    (tagged union dataset, per-partition kernel callable, plan)."""
    ev_schema = _pa_schema(events)
    sp_schema = _pa_schema(spine)
    schema = _union_schema(ev_schema, sp_schema, key, ts, spine_ts)

    plan = _ensure_plan(events, key, ts, plan, **plan_kwargs)
    extra_tw = [int(w) for (w, _) in (range_windows or {}).values()]
    corrections, ctx_map = _split_state(events, plan, spec, key, ts, tiebreak,
                                        fused_asof=True, dedup=dedup,
                                        extra_time_windows=extra_tw)

    # ONE fused map per side: rename(spine) + harmonize + partition assign
    # (each extra map stage re-materializes every block in the object
    # store — fusing saves full passes over the payload)
    assign = _AssignPart(plan, ts, ctx_map)

    def ev_prep(batch: pa.Table) -> pa.Table:
        return assign(_harmonize_batch(batch, schema, 0))

    def sp_prep(batch: pa.Table) -> pa.Table:
        names = [ts if c == spine_ts else c for c in batch.column_names]
        batch = batch.rename_columns(names)
        return assign(_harmonize_batch(batch, schema, 1))

    ev_u = events.map_batches(ev_prep, batch_format="pyarrow",
                              zero_copy_batch=True)
    sp_u = spine.map_batches(sp_prep, batch_format="pyarrow",
                             zero_copy_batch=True)
    tagged = ev_u.union(sp_u)
    spine_cols = [ts if c == spine_ts else c for c in sp_schema.names]
    kern = _AsofKernel(
        key, ts, tiebreak, value_cols=value_cols, spine_cols=spine_cols,
        tolerance_us=tolerance_us, spec=spec, dedup=dedup,
        corrections=corrections, exclude_feats=exclude_feats,
        range_windows=range_windows, direction=direction)
    return tagged, kern, plan


def asof_join(
    events,
    spine,
    *,
    key: str,
    ts: str,
    spine_ts: str = "as_of_ts",
    value_cols: list[str],
    tolerance_us: int | None = None,
    tiebreak: str | None = None,
    dedup: bool = False,
    spec: WindowSpec | None = None,
    plan: PartitionPlan | None = None,
    exclude_feats: tuple[str, ...] = (),
    range_windows: dict[str, tuple[int, str | None]] | None = None,
    direction: str = "backward",
    **plan_kwargs,
):
    """Point-in-time backward as-of join (optionally fused with windows
    and spine-anchored range aggregates).

    Both sides are tagged with the SAME partition plan and unioned, so the
    whole operator costs exactly one all-to-all exchange; the per-partition
    kernel separates sides and runs the galloping binary-search merge.
    ``range_windows``: name -> (window_us, value_col|None) emits
    ``{name}_count`` (and ``{name}_sum``) of events in
    ``[as_of_ts − W, as_of_ts]`` per spine row — a true range/interval
    join fused into the same exchange.
    """
    if direction not in ("backward", "nearest"):
        raise ValueError("direction must be 'backward' or 'nearest' "
                         "(forward = backward on negated ts; see "
                         "queries.q_asof_forward)")
    if direction == "nearest" and spec is not None:
        raise ValueError("direction='nearest' cannot fuse trailing window "
                         "features (they are backward-anchored)")
    tagged, kern, plan = _build_asof(
        events, spine, key=key, ts=ts, spine_ts=spine_ts,
        value_cols=value_cols, tolerance_us=tolerance_us, tiebreak=tiebreak,
        dedup=dedup, spec=spec, plan=plan, exclude_feats=exclude_feats,
        range_windows=range_windows, direction=direction, **plan_kwargs)

    def asof_kernel(group: pa.Table) -> pa.Table:
        return kern(group)

    return _exchange_by_part(tagged, plan, asof_kernel)


def feature_stack(
    events,
    spine,
    spec: WindowSpec,
    *,
    value_cols: list[str],
    tolerance_us: int | None = None,
    dedup: bool = True,
    plan: PartitionPlan | None = None,
    **plan_kwargs,
):
    """The flagship: dedup + windowed features + as-of, one shuffle.

    Each spine row gets the matched event's payload and its windowed
    features. The zero-temporal-leakage rule (FIXTURES.md §5) shapes the
    output: lead/bfill specs are rejected outright, and two retrospective
    columns are excluded — ``session_len`` (the FULL session size counts
    events after the as-of point; ``session_event_idx`` is the non-leaky
    "session length so far") and ``{col}_z`` (entity-GLOBAL z-score moments
    include future events; ``{col}_ez`` — ``spec.expanding_zscore`` — is the
    non-leaky trailing z). Both retrospective forms remain available from
    :func:`window_features`.
    """
    if spec.leads or spec.bfill or spec.deltas or spec.double_deltas:
        raise ValueError(
            "lead/bfill/delta features read past the as-of boundary and "
            "cannot be emitted from feature_stack (zero-temporal-leakage "
            "rule)")
    leaky = ("session_len",) + tuple(f"{c}_z" for c in spec.zscore)
    return asof_join(
        events, spine, key=spec.key, ts=spec.ts, value_cols=value_cols,
        tolerance_us=tolerance_us, tiebreak=spec.tiebreak, dedup=dedup,
        spec=spec, plan=plan, exclude_feats=leaky, **plan_kwargs)


def _payload_join(a_tbl: pa.Table, b_tbl: pa.Table, key: str,
                  payload_cols: list[str],
                  b_seq: np.ndarray) -> pa.Table:
    """Exact (key, __match_seq) left-lookup of ``a_tbl`` rows into the
    payload rows of ``b_tbl`` — appends ``payload_cols`` (null where no
    match). ``a_tbl`` must carry an int64 ``__match_seq`` (-1 = none);
    ``b_seq`` is b's tiebreak as int64."""
    b_codes, b_uniq = kernels.entity_codes(b_tbl.column(key))
    order = np.lexsort((b_seq, b_codes))
    b_codes_s, b_seq_s = b_codes[order], b_seq[order]

    a_keys = a_tbl.column(key).to_numpy(zero_copy_only=False)
    a_codes, present = kernels.map_keys_to_codes(b_uniq, a_keys)
    a_seq = a_tbl.column("__match_seq").cast(pa.int64()).fill_null(
        -1).to_numpy(zero_copy_only=False).astype(np.int64)
    has_match = (a_seq >= 0) & present

    # exact (code, seq) lookup via composite searchsorted
    if len(b_codes_s):
        span = int(b_seq_s.max()) + 2 if len(b_seq_s) else 2
        comp_b = b_codes_s * span + b_seq_s
        comp_a = np.where(has_match, a_codes, 0) * span + np.clip(
            a_seq, 0, span - 2)
        pos = np.searchsorted(comp_b, comp_a)
        pos_c = np.clip(pos, 0, len(comp_b) - 1)
        found = has_match & (comp_b[pos_c] == comp_a)
        gather = order[pos_c]
    else:
        found = np.zeros(len(a_seq), dtype=bool)
        gather = np.zeros(len(a_seq), dtype=np.int64)
    out = a_tbl.drop_columns(["__match_seq"])
    for c in payload_cols:
        out = out.append_column(
            c, kernels.take_with_mask(b_tbl.column(c), gather, found))
    return out


class _AttachKernel:
    """Exact-match (key, tiebreak) payload attach for one co-shuffled block
    (late materialization phase C)."""

    def __init__(self, key: str, tiebreak: str, payload_cols: list[str]):
        self.key, self.tiebreak = key, tiebreak
        self.payload_cols = payload_cols

    def __call__(self, group: pa.Table) -> pa.Table:
        drop = [c for c in (PART_COL, SIDE_COL) if c in group.column_names]
        if group.num_rows == 0:
            side = np.zeros(0, dtype=np.int8)
        else:
            side = group.column(SIDE_COL).to_numpy(zero_copy_only=False)
        a_tbl = group.filter(pa.array(side == 0)).drop_columns(
            drop + [c for c in self.payload_cols if c in group.column_names])
        b_tbl = group.filter(pa.array(side == 1))
        b_seq = b_tbl.column(self.tiebreak).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return _payload_join(a_tbl, b_tbl, self.key, self.payload_cols,
                             b_seq)


SRC_RG_COL = "__src_rg"


def _narrow_rg_read(items: list[dict], columns: list[str]):
    """Narrow-column re-read per parquet ROW GROUP with each row stamped
    with its row group's ordinal (``__src_rg``) — the provenance that
    lets the attach phase route narrow result rows BACK to the payload
    row group that holds their matched event, so payload bytes never
    enter an exchange (see :func:`_provenance_attach`)."""
    import pyarrow.parquet as _pq

    import ray.data as rd

    tagged = [dict(it, rgid=i) for i, it in enumerate(items)]
    chunk_rows = 250_000

    def read_rg(batch: pa.Table):
        pf_cache: dict[str, _pq.ParquetFile] = {}
        for row in batch.to_pylist():
            pf = pf_cache.setdefault(row["path"],
                                     _pq.ParquetFile(row["path"]))
            for rb in pf.iter_batches(batch_size=chunk_rows,
                                      row_groups=[row["rg"]],
                                      columns=columns):
                t = pa.Table.from_batches([rb])
                yield t.append_column(
                    SRC_RG_COL,
                    pa.array(np.full(t.num_rows, row["rgid"],
                                     dtype=np.int32)))

    return (rd.from_items(tagged)
            .repartition(len(tagged))
            .map_batches(read_rg, batch_format="pyarrow"))


def _provenance_attach(mat, items: list[dict], *, key: str, tiebreak: str,
                       payload_cols: list[str], payload_paths: list[str]):
    """EXCHANGE-FREE payload attach (late materialization phase C,
    provenance-routed).

    Every narrow as-of output row carries ``__src_rg`` — the parquet row
    group its matched event came from (stamped at read time by
    :func:`_narrow_rg_read` and carried through the as-of all-to-all as
    one int32 value column). Grouping the narrow output by that ordinal
    routes each result row to a task that decodes EXACTLY its payload
    row group and joins locally by (key, tiebreak):

    - payload bytes move ZERO times — decoded once, joined, and handed
      straight to the sink in the same task (the Bloom + plan-routed
      co-shuffle this replaces moved every payload byte through one
      more all-to-all);
    - pruning is EXACT, not probabilistic: a row group with no matched
      rows never appears as a group, so it is never decoded — no Bloom
      false positives, no hit-test pre-pass;
    - the only exchange is the narrow output grouped by an int32
      (O(result rows × narrow width)).

    On a real cluster the narrow rows are what cross the network; each
    row-group task reads its payload shard from storage directly.
    Partitioning assumption: one row group's matched result rows fit one
    task (row groups are ~1M rows; a spine that fans one row group out
    >100× would need a (rg, seq-bucket) composite key instead).

    Unmatched rows (null ``__src_rg``) pass through with null payloads.
    Reference analog: FeaGet.py:116-144 re-drives ONLY missing files;
    here the unit is one row group and "missing" is exact.
    """
    import pyarrow.parquet as _pq

    schema = _pq.ParquetFile(sorted(payload_paths)[0]).schema_arrow
    ptypes = [(c, schema.field(c).type) for c in payload_cols]

    def fill_src(batch: pa.Table) -> pa.Table:
        src = batch.column(SRC_RG_COL)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src = pc.fill_null(pc.cast(src, pa.int32()),
                           pa.scalar(-1, type=pa.int32()))
        i = batch.column_names.index(SRC_RG_COL)
        return batch.set_column(i, SRC_RG_COL, src)

    def attach_group(g: pa.Table) -> pa.Table:
        rgid = int(g.column(SRC_RG_COL)[0].as_py())
        a = g.drop_columns([SRC_RG_COL])
        a = a.append_column(
            "__match_seq",
            pc.fill_null(pc.cast(a.column(tiebreak), pa.int64()),
                         pa.scalar(-1, type=pa.int64())))
        if rgid < 0:
            out = a.drop_columns(["__match_seq"])
            for c, t in ptypes:
                out = out.append_column(c, pa.nulls(out.num_rows, type=t))
            return out
        it = items[rgid]
        pf = _pq.ParquetFile(it["path"])
        b = pf.read_row_group(it["rg"], columns=[key, tiebreak]
                              + list(payload_cols))
        b_seq = b.column(tiebreak).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return _payload_join(a, b, key, list(payload_cols), b_seq)

    ds = mat.map_batches(fill_src, batch_format="pyarrow")
    use_push_shuffle(ds)
    return ds.groupby(SRC_RG_COL).map_groups(attach_group,
                                             batch_format="pyarrow")


def _list_rowgroups(paths: list[str]) -> list[dict]:
    """Parquet metadata only: one tiny dict per (file, row group)."""
    import pyarrow.parquet as _pq

    items = []
    for p in sorted(paths):
        md = _pq.ParquetFile(p).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            items.append({"path": p, "rg": i, "n_rows": rg.num_rows,
                          "total_bytes": rg.total_byte_size})
    return items


def payload_rowgroup_hits(paths: list[str], loc_ref, key: str,
                          tiebreak: str,
                          items: list[dict] | None = None) -> list[dict]:
    """Distributed narrow pre-pass over parquet ROW GROUPS: for each
    (file, row group), count locator-matched rows reading ONLY the
    (key, tiebreak) columns. Returns one tiny dict per row group
    ({path, rg, n_rows, n_hits, total_bytes}) — the pruning plan AND the
    bytes-read evidence (row groups with n_hits == 0 are never decoded
    by the payload read)."""
    import pyarrow.parquet as _pq

    import ray
    import ray.data as rd

    from .hashing import hash_str_array, mix64

    if items is None:
        items = _list_rowgroups(paths)
    if not items:
        return []

    def probe(batch: pa.Table) -> pa.Table:
        bl = ray.get(loc_ref)
        pf_cache: dict[str, _pq.ParquetFile] = {}
        hits = []
        for row in batch.to_pylist():
            pf = pf_cache.setdefault(row["path"],
                                     _pq.ParquetFile(row["path"]))
            t = pf.read_row_group(row["rg"], columns=[key, tiebreak])
            k = t.column(key).to_numpy(zero_copy_only=False)
            s = t.column(tiebreak).cast(pa.int64()).to_numpy(
                zero_copy_only=False).astype(np.int64)
            h = mix64(hash_str_array(k), s.astype(np.uint64))
            hits.append(int(bl.contains(h).sum()))
        return batch.append_column("n_hits", pa.array(hits,
                                                      type=pa.int64()))

    out = (rd.from_items(items)
           .repartition(min(len(items), 512))
           .map_batches(probe, batch_format="pyarrow")
           .to_pandas())
    return out.to_dict("records")


def _pruned_payload_read(paths: list[str], loc_ref, key: str,
                         tiebreak: str, columns: list[str], mark=None,
                         probe_rgs: int = 8):
    """Payload-side read that decodes ONLY locator-hit row groups: the
    narrow pre-pass plans, then one task per hit row group reads the
    payload columns and keeps the matched rows.

    Dense-workload probe: when matches blanket the corpus (the flagship
    bench: every row group hit), the full narrow pre-pass is pure
    overhead (~43 s over 26 GB at 32 CPUs, measured) — so ``probe_rgs``
    evenly-spaced row groups are hit-tested first, and if ALL of them
    contain matches the pre-pass is skipped and EVERY row group goes
    straight to the per-row-group direct read below. At 100% hits that
    read is simply a wide, evenly-sized decode of the corpus — measured
    2-4x faster at width 32 than re-reading through a Ray Data
    streaming-filter pipeline, and no slower at width 8 (disk floor).
    Any probed miss → selective workload → full pre-pass + pruned read."""
    import pyarrow.parquet as _pq

    import ray
    import ray.data as rd

    from .hashing import hash_str_array, mix64

    items = _list_rowgroups(paths)
    dense = False
    if probe_rgs and len(items) > 2 * probe_rgs:
        idx = np.linspace(0, len(items) - 1, probe_rgs).astype(int)
        probe = payload_rowgroup_hits(paths, loc_ref, key, tiebreak,
                                      items=[items[i] for i in idx])
        dense = bool(probe) and all(r["n_hits"] > 0 for r in probe)

    if dense:
        hit = items
        if mark is not None:
            mark(f"attach probe: {probe_rgs}/{probe_rgs} sampled row "
                 f"groups hit -> dense workload, pre-pass skipped; "
                 f"direct per-row-group read of all {len(items)} "
                 "row groups")
    else:
        recs = payload_rowgroup_hits(paths, loc_ref, key, tiebreak,
                                     items=items)
        hit = [r for r in recs if r["n_hits"] > 0]
        if mark is not None:
            b_tot = sum(r["total_bytes"] for r in recs)
            b_hit = sum(r["total_bytes"] for r in hit)
            n_match = sum(r["n_hits"] for r in hit)
            mark(f"attach pre-pass: {len(hit)}/{len(recs)} row groups hit "
                 f"({b_hit / max(b_tot, 1):.1%} of {b_tot >> 20} MiB; "
                 f"{n_match} matched rows)")
    if not hit:
        schema = _pq.ParquetFile(sorted(paths)[0]).schema_arrow
        empty = pa.table({c: pa.array([], type=schema.field(c).type)
                          for c in columns})
        return rd.from_arrow(empty)

    # Decode each hit row group INCREMENTALLY (~250k-row record batches,
    # the repo's measured right-size for payload blocks entering the
    # attach sort — BASELINE.md "read blocks sized by rows") and yield
    # filtered chunks: one whole-row-group table per task (≈1M rows of
    # payload) hands the downstream exchange oversized blocks and spikes
    # per-task memory — measured +37% on the 8-wide 96M attach phase.
    chunk_rows = 250_000

    def read_rg(batch: pa.Table):
        bl = ray.get(loc_ref)
        pf_cache: dict[str, _pq.ParquetFile] = {}
        for row in batch.to_pylist():
            pf = pf_cache.setdefault(row["path"],
                                     _pq.ParquetFile(row["path"]))
            for rb in pf.iter_batches(batch_size=chunk_rows,
                                      row_groups=[row["rg"]],
                                      columns=columns):
                t = pa.Table.from_batches([rb])
                k = t.column(key).to_numpy(zero_copy_only=False)
                s = t.column(tiebreak).cast(pa.int64()).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                h = mix64(hash_str_array(k), s.astype(np.uint64))
                out = t.filter(pa.array(bl.contains(h)))
                if out.num_rows:
                    yield out

    # one task per hit row group (items are tiny; the repartition cost is
    # nil) so the decode widens to the cluster
    return (rd.from_items(hit)
            .repartition(len(hit))
            .map_batches(read_rg, batch_format="pyarrow"))


def feature_stack_late(
    events,
    spine,
    spec: WindowSpec,
    *,
    payload_cols: list[str],
    value_cols: list[str],
    tolerance_us: int | None = None,
    dedup: bool = True,
    plan: PartitionPlan | None = None,
    payload_paths: list[str] | None = None,
    **plan_kwargs,
):
    """feature_stack with LATE payload MATERIALIZATION.

    Wide payload columns (token lists — the vast majority of the bytes)
    never go through the all-to-all: the windowed/as-of stack runs on the
    narrow columns only, then payloads are attached by an exact
    (key, tiebreak) join that re-uses the SAME partition plan — both sides
    are routed by the matched event's ts so even context-matched rows of
    sub-split hot entities land with their payload row. The payload side is
    pre-filtered by a broadcast BLOOM locator (~2 bytes per matched row —
    bounded at any scale; the filter is an optimization only, correctness
    comes from the exact join, so false positives are harmless).

    ``payload_paths`` (the events parquet files, when the caller has
    them) CONTRACT: the files must be the UNTRANSFORMED source of
    ``events`` — both the narrow pre-pass and the payload attach re-read
    them directly, so any filter/augmentation the caller applied to the
    passed ``events`` Dataset would be silently ignored. A row-count
    mismatch between ``events`` and the files raises ValueError; apply
    row filters by writing filtered parquet first, or pass
    ``payload_paths=None`` to run the (slower) exchange on the Dataset
    as given. Routing mechanics: the payload side goes through the
    ROW-GROUP-PRUNED reader —
    a narrow (key, tiebreak) pre-pass hit-tests every parquet row group
    against the locator and the payload columns are decoded ONLY for row
    groups containing matches (the reference's missing-file re-drive
    reading only what is needed, ``FeaGet.py:116-144``, at row-group
    granularity). On a selective spine this skips whole files; on a
    uniformly-matched corpus it degenerates to the full read and the
    pre-pass is the evidence that the phase is at the decode floor.

    Output rows equal feature_stack's (same columns up to order).
    """
    import time as _time

    import ray

    from .hashing import hash_str_array, mix64

    _t0 = _time.time()
    _timing = _os.environ.get("FE_PHASE_TIMING") == "1"

    def _mark(label):
        if _timing:
            print(f"[late-phase] {label}: +{_time.time() - _t0:.1f}s",
                  flush=True)

    if spec.tiebreak is None:
        raise ValueError("feature_stack_late requires a tiebreak column")
    narrow_cols = [c for c in _pa_schema(events).names
                   if c not in payload_cols]
    # Two attach strategies (equal outputs, tests force both):
    # - "exchange" (default): payload decodes per row group and rides ONE
    #   plan-routed co-shuffle with the narrow result. Fastest measured on
    #   a single box (96 s vs 169 s at 96M/32cpu warm): local plasma moves
    #   bytes at decode speed, and the payload sort overlaps the decode.
    # - "route": the narrow result is grouped by the matched event's
    #   source row group (__src_rg provenance) and payload decodes+joins
    #   in place — payload bytes NEVER enter an exchange and pruning is
    #   exact. The exchange moves ~34 GB (payload+narrow) per 96M rows
    #   where route moves ~8 GB (wide narrow rows only); on a multi-node
    #   cluster whose all-to-all crosses the NETWORK, that 4× byte cut is
    #   the dominant term — switch with FE_ATTACH_MODE=route there.
    route = (payload_paths is not None
             and _os.environ.get("FE_ATTACH_MODE", "exchange") == "route")
    if payload_paths is not None:
        # enforce the payload_paths contract (see docstring): the passed
        # events must be the untransformed read of these files, because
        # both the narrow pre-pass and the attach re-read them. For a
        # pure read both counts are metadata-only (cheap).
        import pyarrow.parquet as _pqv

        file_rows = sum(_pqv.ParquetFile(p).metadata.num_rows
                        for p in payload_paths)
        ev_rows = events.count()
        if ev_rows != file_rows:
            raise ValueError(
                f"feature_stack_late: events has {ev_rows} rows but "
                f"payload_paths holds {file_rows} — the files must be "
                "the untransformed source of `events` (write filtered "
                "parquet first, or pass payload_paths=None)")
    rg_items: list[dict] | None = None
    if route:
        # provenance-routed attach: the narrow re-read is per row group
        # (still a real pruned scan — payload columns never decode) and
        # stamps __src_rg so the attach can route result rows straight
        # back to their payload row group with NO payload exchange.
        rg_items = _list_rowgroups(payload_paths)
        narrow = _narrow_rg_read(rg_items, narrow_cols)
    elif payload_paths is not None:
        # Ray Data (2.49) has NO projection-pushdown rule: ReadParquet
        # followed by Project still DECODES every payload byte and then
        # drops it — measured at 96M rows, the "narrow" pre-pass and
        # as-of scans were each decoding the full 26 GB token corpus,
        # a width-independent floor that capped 8→32 scaling at ~0.5.
        # When the caller hands us the parquet files, re-read the
        # narrow columns with a real pruned scan (row groups of the
        # payload column are never touched).
        import pyarrow.parquet as _pq2

        import ray.data as _rd

        total_rows = sum(_pq2.ParquetFile(p).metadata.num_rows
                         for p in payload_paths)
        n_cpu = int(ray.cluster_resources().get("CPU", 8))
        n_blocks = max(2 * n_cpu, total_rows // 250_000)
        narrow = _rd.read_parquet(payload_paths, columns=narrow_cols,
                                  override_num_blocks=n_blocks)
    else:
        narrow = events.select_columns(narrow_cols)
    plan = _ensure_plan(narrow, spec.key, spec.ts, plan, **plan_kwargs)
    _mark("plan")

    emit = [c for c in value_cols if c not in payload_cols]
    if spec.tiebreak not in emit:
        emit.append(spec.tiebreak)
    if spec.ts not in emit:
        emit.append(spec.ts)
    if route:
        emit.append(SRC_RG_COL)
    outA = asof_join(
        narrow, spine, key=spec.key, ts=spec.ts, value_cols=emit,
        tolerance_us=tolerance_us, tiebreak=spec.tiebreak, dedup=dedup,
        spec=spec, plan=plan, exclude_feats=("session_len",))
    _mark("narrow asof built (incl split-state pre-pass)")
    mat = outA.materialize()  # narrow output only — payloads never shuffled
    _mark("narrow asof materialized")
    if _timing:
        import sys as _s
        print(mat.stats(), file=_s.stderr, flush=True)

    if route:
        out = _provenance_attach(
            mat, rg_items, key=spec.key, tiebreak=spec.tiebreak,
            payload_cols=list(payload_cols), payload_paths=payload_paths)
        _mark("attach pipeline built (lazy, provenance-routed: payload "
              "bytes never exchange; only matched row groups decode)")
        return out

    # broadcast Bloom locator (hash of key × matched tiebreak): bounded
    # memory (~2 B/matched row) instead of the exact hash array; false
    # positives only admit extra payload rows into the exact attach join.
    # Built DISTRIBUTED: each batch hashes its own keys and emits a full
    # bitmap partial; the driver only ORs the (few-MB) bitmaps — the
    # driver-side row iteration this replaces was a 40s serial phase at
    # 24M rows.
    from .hashing import Bloom

    n_rows = mat.count()
    bloom = Bloom(n_rows)
    m_words = len(bloom.words)

    def bloom_partial(b: pa.Table) -> pa.Table:
        part = Bloom(1)
        part.mask = bloom.mask
        part.words = np.zeros(m_words, dtype=np.uint64)
        k = b.column(spec.key).to_numpy(zero_copy_only=False)
        s = b.column(spec.tiebreak).cast(pa.int64()).fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ok = s >= 0
        if ok.any():
            part.add(mix64(hash_str_array(k[ok]), s[ok].astype(np.uint64)))
        return pa.table({"words": pa.array([part.words.tobytes()],
                                           type=pa.large_binary())})

    # batch_size 4M, not 1M: every partial allocates a full bitmap
    # (~2 B × matched rows — 48 MB at 24M rows), so partial COUNT is the
    # phase's memory-bandwidth bill; 4× fewer partials measured the
    # 32-wide phase from anti-scaling (6.5→21.9 s) back under the 8-wide
    # time. Narrow rows keep the 4M batch ≪ worker heap.
    for b in mat.select_columns([spec.key, spec.tiebreak]).map_batches(
            bloom_partial, batch_size=1 << 22,
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            buf = b.column("words")[i].as_py()
            bloom.words |= np.frombuffer(buf, dtype=np.uint64)
    loc_ref = ray.put(bloom)
    _mark("bloom locator built")

    payload_side_cols = [spec.key, spec.tiebreak, spec.ts] + list(payload_cols)

    # plain TASK fn, not an actor pool: it fuses with the parquet read and
    # widens with the cluster — the previous concurrency=(1, 8) actor pool
    # capped the 26 GB payload decode+filter at 8 workers however many
    # CPUs the cluster had, the single biggest width limiter of the
    # attach phase (VERDICT r3 #1: attach scaled 2.44× at 8→32). The
    # bloom travels via the object store (zero-copy local plasma get per
    # batch — the words array is a read-only numpy view, never pickled
    # into the closure).
    def _filter_payload(batch: pa.Table) -> pa.Table:
        bl = ray.get(loc_ref)
        k = batch.column(spec.key).to_numpy(zero_copy_only=False)
        s = batch.column(spec.tiebreak).cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = mix64(hash_str_array(k), s.astype(np.uint64))
        return batch.filter(pa.array(bl.contains(h)))

    if payload_paths is not None:
        payload = _pruned_payload_read(
            payload_paths, loc_ref, spec.key, spec.tiebreak,
            payload_side_cols, _mark)
    else:
        payload = events.select_columns(payload_side_cols).map_batches(
            _filter_payload, batch_format="pyarrow")

    # phase C: co-shuffle by the MATCHED event's (key, ts) under the plan
    a_schema = _pa_schema(mat)
    p_schema = _pa_schema(payload)
    fields = list(a_schema)
    names = {f.name for f in fields}
    fields.append(pa.field("__match_seq", pa.int64()))
    fields.append(pa.field("__route_ts", pa.int64()))
    for f in p_schema:
        if f.name not in names and f.name != spec.ts:
            fields.append(pa.field(f.name, f.type))
    fields.append(pa.field(SIDE_COL, pa.int8()))
    schema = pa.schema(fields)

    def prep_a(batch: pa.Table) -> pa.Table:
        seq = batch.column(spec.tiebreak).cast(pa.int64()).fill_null(-1)
        mts = batch.column("matched_" + spec.ts) \
            if ("matched_" + spec.ts) in batch.column_names \
            else batch.column("as_of_ts")
        route = mts.cast(pa.int64()).fill_null(0)
        aof = batch.column("as_of_ts").cast(pa.int64())
        route = pc.if_else(pc.is_valid(mts.combine_chunks()
                           if isinstance(mts, pa.ChunkedArray) else mts),
                           route, aof)
        b = batch.append_column("__match_seq", seq)
        b = b.append_column("__route_ts", route.cast(pa.int64()))
        return b

    def prep_p(batch: pa.Table) -> pa.Table:
        b = batch.append_column(
            "__match_seq", batch.column(spec.tiebreak).cast(pa.int64()))
        b = b.append_column(
            "__route_ts", batch.column(spec.ts).cast(pa.int64()))
        return b

    a_u = _harmonize(mat.map_batches(prep_a, batch_format="pyarrow"),
                     schema, side=0)
    p_u = _harmonize(payload.map_batches(prep_p, batch_format="pyarrow"),
                     schema, side=1)
    both = a_u.union(p_u)

    class _AssignByRoute:
        def __init__(self, plan_):
            self.plan = plan_

        def __call__(self, batch: pa.Table) -> pa.Table:
            tsv = batch.column("__route_ts").to_numpy(zero_copy_only=False)
            pid = assign_partition_ids(batch.column(spec.key), self.plan,
                                       tsv.astype(np.int64))
            return batch.append_column(PART_COL,
                                       pa.array(pid, type=pa.int32()))

    tagged = both.map_batches(_AssignByRoute(plan), batch_format="pyarrow",
                              zero_copy_batch=True)
    kern = _AttachKernel(spec.key, spec.tiebreak, list(payload_cols))

    def attach_kernel(group: pa.Table) -> pa.Table:
        g = kern(group)
        return g.drop_columns([c for c in ("__route_ts",)
                               if c in g.column_names])

    _mark("attach pipeline built (lazy)")
    return _exchange_by_part(tagged, plan, attach_kernel)
