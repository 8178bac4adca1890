"""Vectorized per-partition kernels (the engine's compute core).

Every windowed / point-in-time operator is expressed over one *sorted
partition*: an Arrow table holding complete entities (or time-contiguous
entity sub-ranges, see skew splitting in :mod:`partition`), sorted by
``(entity, ts, tiebreak)``. Kernels never loop over Python rows: they compute
**gather indices + validity masks** with numpy (searchsorted / cumsum /
reduceat / maximum.accumulate), and the caller materializes output columns
with ``pyarrow.compute.take`` — so arbitrarily wide payloads (the
``tokens: list<int32>`` column) move zero-copy through Arrow and are never
converted to Python objects.

This is the Ray-Data-native re-expression of the reference's per-utterance
sequence ops: delta/context windows (``FeaGet.py:287-290``) → lag/lead,
sliding CMVN (``IVector.py:348,508-514``) → rolling/z-score, the
``cep[start:stop]`` point-in-time cut (``IVector.py:796-800``) → as-of merge,
energy-gap VAD segmentation (``FeaGet.py:292-297``) → sessionize.

Semantics match :mod:`featureengineer_ray.oracle` exactly (tested).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NEG = np.int64(-1)


def _as_int64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/int column → int64 numpy (µs for timestamps)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_timestamp(t):
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _float_with_nan(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.cast(pa.float64()).to_numpy(zero_copy_only=False)


@dataclass
class SortedPartition:
    """A partition viewed in (entity code, ts, tiebreak) sorted order.

    The underlying Arrow table is NOT physically reordered — ``order`` maps
    sorted positions to original rows, so wide payloads (token lists) are
    never copied just to sort. Kernels operate on the small sorted int
    arrays; outputs are scattered back with ``inv`` / gathered with
    ``order`` (see engine helpers).
    """

    orig: pa.Table             # original (unsorted) rows
    order: np.ndarray          # sorted_pos -> original row index
    codes: np.ndarray          # int64 entity code per SORTED row
    ts: np.ndarray             # int64 µs per SORTED row
    seg_offsets: np.ndarray    # int64, len nseg+1; segment i = [off[i], off[i+1])
    seg_of_row: np.ndarray     # int64 segment index per SORTED row
    uniques: np.ndarray        # object array: code -> entity key value
    _inv: np.ndarray | None = None
    _sorted_tbl: pa.Table | None = None

    @property
    def n(self) -> int:
        return len(self.codes)

    @property
    def inv(self) -> np.ndarray:
        """original row index -> sorted position."""
        if self._inv is None:
            inv = np.empty(len(self.order), dtype=np.int64)
            inv[self.order] = np.arange(len(self.order), dtype=np.int64)
            self._inv = inv
        return self._inv

    @property
    def table(self) -> pa.Table:
        """The physically sorted table (materialized on first use — only
        tests and small paths need it; hot paths use orig + order)."""
        if self._sorted_tbl is None:
            self._sorted_tbl = self.orig.take(
                pa.array(self.order, type=pa.int64()))
        return self._sorted_tbl

    def sorted_column(self, name: str) -> pa.Array:
        col = self.orig.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pc.take(col, pa.array(self.order, type=pa.int64()))

    @property
    def row_seg_start(self) -> np.ndarray:
        return self.seg_offsets[self.seg_of_row]

    @property
    def row_seg_end(self) -> np.ndarray:
        return self.seg_offsets[self.seg_of_row + 1]


def entity_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """(codes, uniques) with lexicographically-ranked codes.

    Arrow dictionary_encode does the O(n) hashing in C++; only the UNIQUE
    values are then rank-sorted in numpy — same semantics as np.unique's
    return_inverse at a fraction of the cost for object arrays."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    raw = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dict_vals = d.dictionary.to_numpy(zero_copy_only=False)
    order = np.argsort(dict_vals, kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order), dtype=np.int64)
    return rank[raw] if len(raw) else raw, dict_vals[order]


def map_keys_to_codes(uniques: np.ndarray, keys: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Map key values into an existing (unsorted) code dictionary.

    Returns (codes, present): code -1 where the key is absent."""
    n_u = len(uniques)
    if n_u == 0:
        return (np.full(len(keys), -1, dtype=np.int64),
                np.zeros(len(keys), dtype=bool))
    u_order = np.argsort(uniques, kind="stable")
    u_sorted = uniques[u_order]
    pos = np.searchsorted(u_sorted, keys)
    pos = np.clip(pos, 0, n_u - 1)
    present = u_sorted[pos] == keys
    codes = np.where(present, u_order[pos], -1)
    return codes.astype(np.int64), present


def sort_partition(
    table: pa.Table, key: str, ts: str, tiebreak: str | None = None
) -> SortedPartition:
    """Index a table as a sorted (key, ts, tiebreak) view of its segments."""
    codes, uniq = entity_codes(table.column(key))
    tsv = _as_int64(table.column(ts))
    if tiebreak is not None:
        tb = _as_int64(table.column(tiebreak))
        order = np.lexsort((tb, tsv, codes))
    else:
        order = np.lexsort((tsv, codes))
    codes = codes[order]
    tsv = tsv[order]
    if len(codes):
        starts = np.flatnonzero(np.diff(codes)) + 1
        seg_offsets = np.concatenate(([0], starts, [len(codes)])).astype(np.int64)
    else:
        seg_offsets = np.zeros(1, dtype=np.int64)
    nseg = len(seg_offsets) - 1
    counts = np.diff(seg_offsets)
    seg_of_row = np.repeat(np.arange(nseg, dtype=np.int64), counts)
    return SortedPartition(table, order, codes, tsv, seg_offsets, seg_of_row,
                           uniq)


def filter_sorted(part: SortedPartition, keep: np.ndarray) -> SortedPartition:
    """A reduced sorted view keeping only rows where keep[sorted_pos] — no
    data movement (order is re-gathered; segments re-indexed)."""
    order = part.order[keep]
    codes = part.codes[keep]
    tsv = part.ts[keep]
    if len(codes):
        starts = np.flatnonzero(np.diff(codes)) + 1
        seg_offsets = np.concatenate(([0], starts, [len(codes)])).astype(np.int64)
    else:
        seg_offsets = np.zeros(1, dtype=np.int64)
    nseg = len(seg_offsets) - 1
    seg_of_row = np.repeat(np.arange(nseg, dtype=np.int64),
                           np.diff(seg_offsets))
    return SortedPartition(part.orig, order, codes, tsv, seg_offsets,
                           seg_of_row, part.uniques)


# --- lag / lead -----------------------------------------------------------

def lag_indices(part: SortedPartition, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Index of the k-th previous row within the entity; valid mask."""
    idx = np.arange(part.n, dtype=np.int64) - k
    valid = idx >= part.row_seg_start
    return idx, valid


def lead_indices(part: SortedPartition, k: int) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(part.n, dtype=np.int64) + k
    valid = idx < part.row_seg_end
    return idx, valid


def take_with_mask(col, idx: np.ndarray, valid: np.ndarray):
    """pc.take with null indices where invalid — works for any Arrow type."""
    indices = pa.array(np.where(valid, idx, _NEG), type=pa.int64(),
                       mask=~valid)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.take(col, indices)


# --- rolling (row-count window) ------------------------------------------

def rolling_rows(
    part: SortedPartition, x: np.ndarray, window: int
) -> dict[str, np.ndarray]:
    """Trailing `window`-row stats per entity; null-aware (nan inputs).

    Returns sum/mean/min/max/std(ddof=1)/count arrays (nan = null).
    """
    n = part.n
    i = np.arange(n, dtype=np.int64)
    start = np.maximum(i - window + 1, part.row_seg_start)
    valid = ~np.isnan(x)
    xv = np.where(valid, x, 0.0)
    cs = np.concatenate(([0.0], np.cumsum(xv)))
    cs2 = np.concatenate(([0.0], np.cumsum(xv * xv)))
    cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
    cnt = cc[i + 1] - cc[start]
    s = cs[i + 1] - cs[start]
    s2 = cs2[i + 1] - cs2[start]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
        var = np.where(
            cnt >= 2, np.maximum(s2 - s * s / np.maximum(cnt, 1), 0.0) / np.maximum(cnt - 1, 1), np.nan
        )
        std = np.sqrt(var)
    # min/max: O(n·w) only when needed, via strided windows on small w;
    # for large w fall back to pandas' C deque rolling per segment.
    mn, mx = _rolling_min_max(x, valid, start, i, part.seg_of_row, window)
    out_sum = np.where(cnt > 0, s, np.nan)
    return {
        "sum": out_sum, "mean": mean, "min": mn, "max": mx,
        "std": std, "count": cnt.astype(np.float64),
    }


def _rolling_min_max(x, valid, start, i, seg_of_row, window):
    n = len(x)
    mn = np.full(n, np.nan)
    mx = np.full(n, np.nan)
    if n == 0:
        return mn, mx
    w = int(np.max(i - start + 1))  # effective max window length
    xin = np.where(valid, x, np.nan)
    if w <= 128:
        pad = np.full(w - 1, np.nan)
        padded = np.concatenate((pad, xin))
        win = np.lib.stride_tricks.sliding_window_view(padded, w)
        # row r of win = xin[r-w+1 : r+1]; keep only the last `offs[r]` slots
        offs = (i - start + 1).astype(np.int64)
        col = np.arange(w)
        mask = col[None, :] >= (w - offs[:, None])
        vals = np.where(mask, win, np.nan)
        allnan = np.all(np.isnan(vals), axis=1)
        safe = np.where(allnan[:, None], 0.0, vals)
        with np.errstate(invalid="ignore"):
            mn = np.where(allnan, np.nan, np.nanmin(safe, axis=1))
            mx = np.where(allnan, np.nan, np.nanmax(safe, axis=1))
        return mn, mx
    # large windows: the same O(n log n) sparse table the time-RANGE path
    # uses — each row's window is exactly the index range [start, i+1)
    # (segment bounds are already folded into `start`), so two table
    # lookups answer every row. Replaces the per-partition pandas
    # groupby().rolling() hop, the last pandas call on the window hot
    # path (VERDICT r3 nit #3); NaN semantics match (all-null window →
    # NaN, min_periods=1).
    return _range_min_max(xin, start.astype(np.int64),
                          (i + 1).astype(np.int64))


# --- rolling (time-range window) -----------------------------------------

def _range_min_max(xin: np.ndarray, lo: np.ndarray, hi: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """nan-aware min/max over arbitrary index ranges [lo, hi), hi > lo.

    Sparse table (O(n log n) build, O(1) per query): level k holds
    fmin/fmax over [i, i+2^k); a range query combines two overlapping
    power-of-two spans. np.fmin/fmax skip NaN, so an all-null window
    yields NaN — the same null semantics as the cumsum stats."""
    n = len(xin)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    length = hi - lo
    kmax = int(np.floor(np.log2(max(int(length.max()), 1))))
    mins = [xin]
    maxs = [xin]
    for k in range(1, kmax + 1):
        h = 1 << (k - 1)
        mins.append(np.fmin(mins[-1][:-h], mins[-1][h:]))
        maxs.append(np.fmax(maxs[-1][:-h], maxs[-1][h:]))
    k_of = np.floor(np.log2(length)).astype(np.int64)
    mn = np.empty(n)
    mx = np.empty(n)
    for k in range(kmax + 1):
        rows = k_of == k
        if not rows.any():
            continue
        span = 1 << k
        a, b = lo[rows], hi[rows] - span
        mn[rows] = np.fmin(mins[k][a], mins[k][b])
        mx[rows] = np.fmax(maxs[k][a], maxs[k][b])
    return mn, mx


def _rolling_time_core(ts: np.ndarray, seg_of_row: np.ndarray,
                       x: np.ndarray, window_us: int
                       ) -> dict[str, np.ndarray]:
    """Stats over [ts-W, ts] per segment for rows with known ts (sorted
    by (segment, ts)). ts made globally monotonic via the composite-key
    trick so two global searchsorteds bound every row's window."""
    n = len(ts)
    if n == 0:
        z = np.zeros(0)
        return {"sum": z, "mean": z.copy(), "min": z.copy(),
                "max": z.copy(), "std": z.copy(), "count": z.copy()}
    rel = ts - ts.min()
    off = np.int64(int(rel.max()) + window_us + 2)
    nseg = int(seg_of_row.max()) + 1
    if nseg * int(off) >= (1 << 62):
        raise OverflowError("composite key overflow; partition too wide")
    comp = rel + seg_of_row * off
    lo = np.searchsorted(comp, comp - window_us, side="left")
    hi = np.searchsorted(comp, comp, side="right")
    valid = ~np.isnan(x)
    xv = np.where(valid, x, 0.0)
    cs = np.concatenate(([0.0], np.cumsum(xv)))
    cs2 = np.concatenate(([0.0], np.cumsum(xv * xv)))
    cc = np.concatenate(([0], np.cumsum(valid.astype(np.int64))))
    cnt = cc[hi] - cc[lo]
    s = cs[hi] - cs[lo]
    s2 = cs2[hi] - cs2[lo]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
        var = np.where(
            cnt >= 2,
            np.maximum(s2 - s * s / np.maximum(cnt, 1), 0.0)
            / np.maximum(cnt - 1, 1), np.nan)
        std = np.sqrt(var)
    mn, mx = _range_min_max(np.where(valid, x, np.nan), lo, hi)
    return {"sum": np.where(cnt > 0, s, np.nan), "mean": mean,
            "min": mn, "max": mx, "std": std,
            "count": cnt.astype(np.float64)}


def rolling_time(
    part: SortedPartition, x: np.ndarray, window_us: int
) -> dict[str, np.ndarray]:
    """Trailing [ts-W, ts] stats per entity (RANGE semantics incl. equal-ts
    peers): sum/mean/min/max/std(ddof=1)/count — the sliding-CMVN stat set
    (``IVector.py:348,508-514``) on the time axis. Null-aware on BOTH
    axes: nan x values are excluded from every window; rows with null ts
    (part.ts is float/NaN then) are excluded from all windows and get
    NaN stats themselves."""
    tsf = np.asarray(part.ts, dtype=np.float64)
    fin = np.isfinite(tsf)
    if fin.all():
        return _rolling_time_core(
            np.asarray(part.ts).astype(np.int64), part.seg_of_row, x,
            window_us)
    n = part.n
    out = {k: np.full(n, np.nan) for k in ("sum", "mean", "min", "max",
                                           "std")}
    out["count"] = np.zeros(n)
    idx = np.flatnonzero(fin)
    if len(idx):
        sub = _rolling_time_core(tsf[idx].astype(np.int64),
                                 part.seg_of_row[idx], x[idx], window_us)
        for k, v in sub.items():
            out[k][idx] = v
    return out


# --- fill -----------------------------------------------------------------

def ffill_indices(part: SortedPartition, valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Index of last valid row at-or-before each row within the entity."""
    i = np.arange(part.n, dtype=np.int64)
    li = np.where(valid, i, _NEG)
    li = np.maximum.accumulate(li)
    ok = (li >= 0) & (li >= part.row_seg_start)
    return li, ok


def bfill_indices(part: SortedPartition, valid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    i = np.arange(part.n, dtype=np.int64)
    ri = np.where(valid[::-1], np.arange(part.n, dtype=np.int64), _NEG)
    ri = np.maximum.accumulate(ri)[::-1]
    ni = np.where(ri >= 0, part.n - 1 - ri, _NEG)
    ok = (ni >= 0) & (ni < part.row_seg_end)
    return ni, ok


# --- sessionize -----------------------------------------------------------

def sessionize(part: SortedPartition, gap_us: int) -> dict[str, np.ndarray]:
    """session_idx (1-based per entity), session_event_idx, session_len,
    session_key (partition-global ordinal usable as a group key)."""
    n = part.n
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return {"session_idx": z, "session_event_idx": z, "session_len": z,
                "session_key": z}
    i = np.arange(n, dtype=np.int64)
    prev_ts = np.empty(n, dtype=np.int64)
    prev_ts[1:] = part.ts[:-1]
    prev_ts[0] = 0
    is_seg_start = i == part.row_seg_start
    new = is_seg_start | ((part.ts - prev_ts) > gap_us)
    skey = np.cumsum(new.astype(np.int64))  # 1-based global session ordinal
    first_skey_in_seg = skey[part.seg_offsets[:-1]]
    session_idx = skey - first_skey_in_seg[part.seg_of_row] + 1
    sess_starts = np.flatnonzero(new)
    session_event_idx = i - sess_starts[skey - 1] + 1
    counts = np.diff(np.concatenate((sess_starts, [n])))
    session_len = counts[skey - 1]
    return {
        "session_idx": session_idx,
        "session_event_idx": session_event_idx,
        "session_len": session_len,
        "session_key": skey,
    }


# --- per-entity z-score (CMVN analog) ------------------------------------

def zscore(part: SortedPartition, x: np.ndarray) -> np.ndarray:
    """(x - mean)/std(ddof=1) over the entity's own rows; nan where undefined."""
    valid = ~np.isnan(x)
    xv = np.where(valid, x, 0.0)
    offs = part.seg_offsets
    if part.n == 0:
        return np.zeros(0)
    s = np.add.reduceat(xv, offs[:-1])
    s2 = np.add.reduceat(xv * xv, offs[:-1])
    c = np.add.reduceat(valid.astype(np.float64), offs[:-1])
    # reduceat quirk: empty segments impossible here (every seg has ≥1 row)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / c
        var = np.maximum(s2 - s * s / c, 0.0) / np.maximum(c - 1, 1)
        std = np.sqrt(var)
        stdr = std[part.seg_of_row]
        z = (x - mean[part.seg_of_row]) / stdr
    bad = (c[part.seg_of_row] < 2) | (stdr == 0.0) | ~valid
    z[bad] = np.nan
    return z


def expanding_zscore(part: SortedPartition, x: np.ndarray) -> np.ndarray:
    """Trailing/expanding z: (x_i - mean(x[seg_start..i])) / std(ddof=1 over
    the same prefix). Uses ONLY rows at-or-before i within the entity, so it
    is safe to emit through a point-in-time as-of join (zero temporal
    leakage), unlike :func:`zscore` whose moments span the whole entity."""
    n = part.n
    if n == 0:
        return np.zeros(0)
    valid = ~np.isnan(x)
    xv = np.where(valid, x, 0.0)
    cs = np.cumsum(xv)
    cs2 = np.cumsum(xv * xv)
    cc = np.cumsum(valid.astype(np.float64))
    start = part.row_seg_start
    base = np.maximum(start - 1, 0)
    has_base = start > 0
    b_s = np.where(has_base, cs[base], 0.0)
    b_s2 = np.where(has_base, cs2[base], 0.0)
    b_c = np.where(has_base, cc[base], 0.0)
    c = cc - b_c
    s = cs - b_s
    s2 = cs2 - b_s2
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / c
        var = np.maximum(s2 - s * s / c, 0.0) / np.maximum(c - 1, 1)
        std = np.sqrt(var)
        z = (x - mean) / std
    z[(c < 2) | (std == 0.0) | ~valid] = np.nan
    return z


def expanding_zscore_with_prefix(
    x: np.ndarray, prefix: tuple[float, float, float]
) -> np.ndarray:
    """Expanding z over ONE entity segment whose history starts with the
    given (count, sum, sumsq) prefix — the hot-entity sub-split path (the
    prefix is the exact fold over all earlier time-range subs)."""
    p_c, p_s, p_s2 = prefix
    valid = ~np.isnan(x)
    xv = np.where(valid, x, 0.0)
    c = np.cumsum(valid.astype(np.float64)) + p_c
    s = np.cumsum(xv) + p_s
    s2 = np.cumsum(xv * xv) + p_s2
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / c
        var = np.maximum(s2 - s * s / c, 0.0) / np.maximum(c - 1, 1)
        std = np.sqrt(var)
        z = (x - mean) / std
    z[(c < 2) | (std == 0.0) | ~valid] = np.nan
    return z


# --- as-of merge ----------------------------------------------------------

def asof_merge(
    ev_codes: np.ndarray,
    ev_ts: np.ndarray,
    sp_codes: np.ndarray,
    sp_ts: np.ndarray,
    tolerance_us: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Backward as-of: for each spine row, index of the latest event row with
    the same code and ``ev_ts <= sp_ts`` (ties → last in sort order).

    ``ev_codes/ev_ts`` must be sorted by (code, ts, tiebreak); codes of both
    sides must come from one shared encoding. Returns (idx, valid) per spine
    row. Vectorized galloping/binary search via a composite monotonic key
    (the sorted-partition merge of SURVEY.md §7.3 step 4 / J9).
    """
    if len(ev_codes) == 0:
        return (np.full(len(sp_codes), -1, dtype=np.int64),
                np.zeros(len(sp_codes), dtype=bool))
    all_min = min(int(ev_ts.min()), int(sp_ts.min()) if len(sp_ts) else 0)
    ev_rel = ev_ts - all_min
    sp_rel = sp_ts - all_min
    span = max(int(ev_rel.max()), int(sp_rel.max()) if len(sp_rel) else 0)
    off = np.int64(span + 2)
    max_code = int(max(ev_codes.max(), sp_codes.max() if len(sp_codes) else 0))
    if (max_code + 1) * int(off) >= (1 << 62):
        # fallback: per-spine-row binary search inside the code's segment
        return _asof_merge_segmented(ev_codes, ev_ts, sp_codes, sp_ts, tolerance_us)
    comp_ev = ev_codes * off + ev_rel
    comp_sp = sp_codes * off + sp_rel
    idx = np.searchsorted(comp_ev, comp_sp, side="right") - 1
    safe = np.maximum(idx, 0)
    valid = (idx >= 0) & (ev_codes[safe] == sp_codes)
    if tolerance_us is not None:
        valid &= (sp_ts - ev_ts[safe]) <= tolerance_us
    return idx, valid


def asof_merge_nearest(
    ev_codes: np.ndarray,
    ev_ts: np.ndarray,
    sp_codes: np.ndarray,
    sp_ts: np.ndarray,
    tolerance_us: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """NEAREST as-of: for each spine row, the same-code event minimizing
    |ev_ts − sp_ts|; distance ties prefer the backward (≤) candidate.

    Tie rule within a side (several events at the winning ts): backward
    takes the LAST in (code, ts, tiebreak) sort order, forward the FIRST
    — i.e. max tiebreak looking back, min tiebreak looking forward —
    matching the two directional primitives it composes. Same composite
    searchsorted machinery as `asof_merge`, one extra binary search."""
    n = len(ev_codes)
    if n == 0:
        return (np.full(len(sp_codes), -1, dtype=np.int64),
                np.zeros(len(sp_codes), dtype=bool))
    idxb, validb = asof_merge(ev_codes, ev_ts, sp_codes, sp_ts, None)
    all_min = min(int(ev_ts.min()), int(sp_ts.min()) if len(sp_ts) else 0)
    ev_rel = ev_ts - all_min
    sp_rel = sp_ts - all_min
    span = max(int(ev_rel.max()), int(sp_rel.max()) if len(sp_rel) else 0)
    off = np.int64(span + 2)
    max_code = int(max(ev_codes.max(), sp_codes.max() if len(sp_codes) else 0))
    if (max_code + 1) * int(off) >= (1 << 62):
        idxf, validf = _asof_merge_fwd_segmented(ev_codes, ev_ts,
                                                 sp_codes, sp_ts)
    else:
        comp_ev = ev_codes * off + ev_rel
        comp_sp = sp_codes * off + sp_rel
        idxf = np.searchsorted(comp_ev, comp_sp, side="left")
        safe_f = np.minimum(idxf, n - 1)
        validf = (idxf < n) & (ev_codes[safe_f] == sp_codes)
    safe_b = np.maximum(idxb, 0)
    safe_f = np.minimum(idxf, n - 1)
    db = np.where(validb, sp_ts - ev_ts[safe_b], np.int64(1 << 62))
    df = np.where(validf, ev_ts[safe_f] - sp_ts, np.int64(1 << 62))
    use_b = validb & (db <= df)
    idx = np.where(use_b, idxb, idxf)
    valid = validb | validf
    if tolerance_us is not None:
        valid &= np.minimum(db, df) <= tolerance_us
    return np.where(valid, idx, -1), valid


def _asof_merge_fwd_segmented(ev_codes, ev_ts, sp_codes, sp_ts):
    seg_start = np.searchsorted(ev_codes, sp_codes, side="left")
    seg_end = np.searchsorted(ev_codes, sp_codes, side="right")
    idx = np.full(len(sp_codes), -1, dtype=np.int64)
    for r in range(len(sp_codes)):  # rare fallback path
        lo, hi = seg_start[r], seg_end[r]
        if lo == hi:
            continue
        j = lo + np.searchsorted(ev_ts[lo:hi], sp_ts[r], side="left")
        if j < hi:
            idx[r] = j
    return idx, idx >= 0


def _asof_merge_segmented(ev_codes, ev_ts, sp_codes, sp_ts, tolerance_us):
    seg_start = np.searchsorted(ev_codes, sp_codes, side="left")
    seg_end = np.searchsorted(ev_codes, sp_codes, side="right")
    idx = np.full(len(sp_codes), -1, dtype=np.int64)
    for r in range(len(sp_codes)):  # rare fallback path
        lo, hi = seg_start[r], seg_end[r]
        if lo == hi:
            continue
        j = lo + np.searchsorted(ev_ts[lo:hi], sp_ts[r], side="right") - 1
        if j >= lo:
            idx[r] = j
    valid = idx >= 0
    safe = np.maximum(idx, 0)
    if tolerance_us is not None:
        valid &= (sp_ts - ev_ts[safe]) <= tolerance_us
    return idx, valid


# --- dedup ----------------------------------------------------------------

def dedup_first_mask(part: SortedPartition) -> np.ndarray:
    """Keep-mask for the first row of each (entity, ts) pair — first in
    tiebreak order (reference keeps first, PrepareData.py:647-658)."""
    n = part.n
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = np.ones(n, dtype=bool)
    keep[1:] = (np.diff(part.codes) != 0) | (np.diff(part.ts) != 0)
    return keep
