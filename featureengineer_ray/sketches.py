"""Mergeable sketches for cardinality and frequency at 100 TB scale.

Exact `distinct_users_per_type` (A8) and `vocab_top_terms` (A4-over-text)
shuffle one row per distinct value — fine while distincts fit a shuffle,
wrong when the distinct set itself is web-scale (billions of unique terms /
ids). These are the bounded-state alternatives:

- **HyperLogLog** (`approx_distinct`): per-batch 2^p-byte register arrays,
  merged with an element-wise max — the all-to-all moves
  O(groups × batches) fixed-size register rows, never the value stream.
  Flajolet et al. 2007 + the small-range linear-counting correction.
- **Two-pass heavy hitters** (`heavy_hitters`): pass 1 truncates each
  block's exact counts to its local top-m ("lossy" SpaceSaving-style
  partials, shuffle bounded to m rows per block) and keeps each block's
  dropped-tail bound; candidates whose partial sum + total possible
  undercount still reaches the provisional k-th count are recounted
  EXACTLY in pass 2 against a broadcast candidate set. Output is exact
  top-k whenever the per-block bound certifies the candidate set (the
  usual Misra-Gries/SpaceSaving merge guarantee), and the certificate is
  returned so callers can assert it.

Reference parity: the reference's statistics accumulators are exact
gathers (SURVEY.md §2.7 A1-A8, `mpiIV.py` partial reduce); the sketches
are the beyond-reference scale path for the same questions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import hashing

# --- HyperLogLog ----------------------------------------------------------

_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(int(np.log2(m)), 0.7213 / (1 + 1.079 / m))


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 (binary-search shifts, no
    float log2 — float64 is inexact near 2^53+)."""
    v = v.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1 << s)
        bl[m] += s
        v = np.where(m, v >> np.uint64(s), v)
    return bl + v.astype(np.int64)  # +1 where the residual bit is set


def hll_partial(h: np.ndarray, p: int = 14) -> np.ndarray:
    """Register array (uint8[2^p]) for one batch of 64-bit hashes."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    h = np.asarray(h, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # rank (1-based) of the first set bit in the remaining 64-p bits
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    nbits = (64 - _bit_length_u64(rest) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, nbits)
    return regs


def hll_merge(regs: np.ndarray) -> np.ndarray:
    """Merge a (k, m) stack of register arrays: element-wise max."""
    return np.maximum.reduce(np.asarray(regs, dtype=np.uint8), axis=0)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range correction."""
    m = len(regs)
    regs = np.asarray(regs, dtype=np.float64)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, group_cols: list[str], value_col: str,
                    p: int = 14, seed: int = 0):
    """Approximate COUNT(DISTINCT value) per group via mergeable HLL.

    map_batches emits one (group, registers) row per group per batch
    (2^p bytes each); one tiny groupby merges registers with max and
    estimates. The raw value stream never enters the shuffle — this is
    the A8 scale path when distincts don't fit an exact exchange.
    Standard error ≈ 1.04/sqrt(2^p) (~0.8% at p=14).
    """
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        h = hashing.hash_pa_array(batch.column(value_col), seed=seed)
        keys = [batch.column(c) for c in group_cols]
        # group rows of this batch by the group_cols tuple
        import pandas as pd

        kdf = pd.DataFrame({c: k.to_pandas() for c, k in zip(group_cols, keys)})
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(kdf) if len(group_cols) > 1
            else kdf[group_cols[0]], sort=False)
        out_keys: dict[str, list] = {c: [] for c in group_cols}
        out_regs = []
        for g in range(len(uniques)):
            regs = hll_partial(h[codes == g], p)
            if len(group_cols) > 1:
                for c, v in zip(group_cols, uniques[g]):
                    out_keys[c].append(v)
            else:
                out_keys[group_cols[0]].append(uniques[g])
            out_regs.append(regs)
        cols = {c: pa.array(out_keys[c]) for c in group_cols}
        cols["__regs"] = pa.array(
            [r.tobytes() for r in out_regs], type=pa.binary(m))
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finalize(group: pa.Table) -> pa.Table:
        stack = np.stack([np.frombuffer(b, dtype=np.uint8)
                          for b in group.column("__regs").to_pylist()])
        est = hll_estimate(hll_merge(stack))
        cols = {c: group.column(c).slice(0, 1) for c in group_cols}
        cols["approx_n"] = pa.array([int(round(est))], type=pa.int64())
        return pa.table(cols)

    return partials.groupby(group_cols).map_groups(
        finalize, batch_format="pyarrow")


# --- two-pass heavy hitters ----------------------------------------------


def heavy_hitters(term_partials, k: int, *, local_m: int = 4096,
                  term_col: str = "term", count_col: str = "n"):
    """Exact-when-certified top-k over an unbounded term domain.

    ``term_partials``: Dataset of per-block (term, n) EXACT partial counts
    (e.g. `text.term_frequencies`' map side). Pass 1 truncates each block
    to its top ``local_m`` terms and records the dropped-tail bound (the
    local_m-th count); the shuffle therefore moves ≤ local_m rows per
    block regardless of vocabulary size. Candidates that could still
    reach the provisional k-th count (partial_sum + Σ per-block bounds)
    are recounted exactly in pass 2 via a broadcast candidate set.

    Returns (topk_dataset, certified): ``certified`` is True when the
    Misra-Gries-style bound proves no dropped term can displace the k-th
    — callers (and the pytest oracle) assert it on test data.
    """
    import ray

    def truncate(batch: pa.Table) -> pa.Table:
        n = batch.column(count_col).to_numpy(zero_copy_only=False)
        if len(n) <= local_m:
            bound = 0
            keep = np.arange(len(n))
        else:
            order = np.argsort(-n, kind="stable")
            keep = order[:local_m]
            bound = int(n[order[local_m]])
        out = batch.take(pa.array(keep, type=pa.int64()))
        # bound carried on the FIRST row only, so Σ __bound over all rows
        # is exactly Σ of one per-block dropped-tail bound
        bcol = np.zeros(len(keep), dtype=np.int64)
        if len(bcol):
            bcol[0] = bound
        return out.append_column("__bound", pa.array(bcol))

    pass1 = term_partials.map_batches(truncate, batch_format="pyarrow")

    # small driver-side reduce over the truncated partials (≤ m×blocks rows)
    pdf = pass1.to_pandas()
    if len(pdf) == 0:
        empty = pa.table({term_col: pa.array([], type=pa.string()),
                          count_col: pa.array([], type=pa.int64())})
        return ray.data.from_arrow(empty), True
    total_bound = int(pdf["__bound"].sum())
    sums = (pdf.groupby(term_col, sort=False)[count_col].sum()
            .sort_values(ascending=False, kind="stable"))
    kth = int(sums.iloc[min(k, len(sums)) - 1]) if len(sums) else 0
    cand = sums[sums + total_bound >= kth].index.to_numpy()
    # Exactness certificate: partial sums are undercounts, so the
    # provisional k-th ≤ the exact k-th. Any seen non-candidate's true
    # count ≤ partial + total_bound < kth; any never-seen term's true
    # count ≤ total_bound. Both displacement routes are closed iff:
    certified = (total_bound == 0
                 or (len(sums) >= k and total_bound < kth))

    cand_ref = ray.put(np.sort(cand.astype(str)))

    def recount(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        terms = batch.column(term_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cands, terms.astype(str))
        pos = np.clip(pos, 0, len(cands) - 1)
        mask = cands[pos] == terms.astype(str)
        return batch.filter(pa.array(mask))

    from . import relational

    exact = relational.grouped_agg(
        term_partials.map_batches(recount, batch_format="pyarrow"),
        [term_col], {count_col: (count_col, "sum")})
    top = relational.top_k(exact, k, by=[count_col, term_col],
                           descending=[True, False])
    return top, certified


class QuantileSketch:
    """Deterministic mergeable quantile sketch (Munro-Paterson /
    MRL-style compactor ladder): level-i buffer holds ≤ k values each
    standing for 2^i originals; a full level sorts, keeps alternating
    elements deterministically, and promotes them up. Rank error is
    bounded by ~N/k per query (ε ≈ 1/k · log₂(N/k) worst case for this
    simple ladder — set k accordingly), memory O(k · log(N/k)), and —
    unlike random-sampling sketches — the result is REPRODUCIBLE across
    runs and merge orders of the same multiset fed in the same block
    order.

    The bounded-state alternative to `relational.exact_percentiles`
    (which is exact but needs two extra narrow passes): one streaming
    pass, partials merged associatively — the shape `grouped_agg` moves.
    """

    def __init__(self, k: int = 1024):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0)]

    def add(self, vals: np.ndarray) -> None:
        if not len(vals):
            return
        self.levels[0] = np.concatenate(
            [self.levels[0], np.asarray(vals, dtype=np.float64)])
        self._compact()

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > 2 * self.k:
                buf = np.sort(self.levels[i])
                if len(buf) % 2:          # keep the odd element at level i
                    self.levels[i] = buf[-1:]
                    buf = buf[:-1]
                else:
                    self.levels[i] = np.zeros(0)
                promoted = buf[::2]       # deterministic alternation
                if i + 1 == len(self.levels):
                    self.levels.append(np.zeros(0))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, buf in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append(np.zeros(0))
            self.levels[i] = np.concatenate([self.levels[i], buf])
        self._compact()
        return self

    def serialize(self) -> bytes:
        import io

        bio = io.BytesIO()
        np.savez(bio, *(self.levels), k=np.int64(self.k))
        return bio.getvalue()

    @classmethod
    def deserialize(cls, blob: bytes) -> "QuantileSketch":
        import io

        with np.load(io.BytesIO(blob)) as z:
            s = cls(int(z["k"]))
            s.levels = [z[f"arr_{i}"] for i in range(len(z.files) - 1)]
        return s

    def quantiles(self, qs: list[float]) -> np.ndarray:
        vals, weights = [], []
        for i, buf in enumerate(self.levels):
            if len(buf):
                vals.append(buf)
                weights.append(np.full(len(buf), 1 << i, dtype=np.int64))
        if not vals:
            return np.full(len(qs), np.nan)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        out = np.empty(len(qs))
        for j, q in enumerate(qs):
            r = min(max(int(np.ceil(q * total)), 1), int(total))
            out[j] = v[np.searchsorted(cum, r, side="left")]
        return out


def approx_quantiles(ds, col: str, qs: list[float], *, k: int = 1024):
    """ONE narrow streaming pass: each batch folds into a per-task
    QuantileSketch partial; serialized partials (KB-sized, independent of
    rows) reach the driver and merge associatively. Returns a pyarrow
    table (q, value)."""

    def partial(batch: pa.Table) -> pa.Table:
        s = QuantileSketch(k)
        s.add(batch.column(col).to_numpy(zero_copy_only=False)
              .astype(np.float64))
        return pa.table({"sk": pa.array([s.serialize()],
                                        type=pa.large_binary())})

    merged = QuantileSketch(k)
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            merged.merge(QuantileSketch.deserialize(
                b.column("sk")[i].as_py()))
    vals = merged.quantiles([float(q) for q in qs])
    return pa.table({"q": pa.array([float(q) for q in qs],
                                   type=pa.float64()),
                     "value": pa.array(vals, type=pa.float64())})


# --- Count-Min sketch -------------------------------------------------------

CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)


def cms_partial(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """Count-Min counters for one batch of value hashes: a (depth×width)
    int64 array flattened row-major. Counters are pure sums, so merge =
    element-wise add — exactly associative/commutative int64 arithmetic,
    layout-independent at any parallelism (Cormode & Muthukrishnan
    2005)."""
    c = np.zeros(depth * width, dtype=np.int64)
    for r in range(depth):
        idx = (hashing.mix64(h, np.uint64(CMS_SEEDS[r]))
               % np.uint64(width)).astype(np.int64)
        np.add.at(c, r * width + idx, 1)
    return c


def cms_estimate(counters: np.ndarray, h: np.ndarray, depth: int,
                 width: int) -> np.ndarray:
    """Point-frequency estimates: min over the depth rows. Never
    undercounts; overcount ≤ ⌈e·N/width⌉ per query with probability
    ≥ 1 − e^(−depth) over the seed choice."""
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        idx = (hashing.mix64(h, np.uint64(CMS_SEEDS[r]))
               % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, counters[r * width + idx])
    return est


def cms_count(ds, value_col: str, *, depth: int = 4, width: int = 16384):
    """Distributed Count-Min build over a value column: each batch emits
    ONE fixed-size (depth×width×8 B) counter row — independent of row
    count, the bounded-state frequency path when the distinct set is
    web-scale — reduced by the 32-way distributed combine (driver pulls
    O(32) rows). Returns the merged int64 counter vector."""
    from .combine import combine_sum
    from .hashing import hash_str_array

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        h = hash_str_array(vals)
        c = cms_partial(h, depth, width)
        return pa.table({"c": pa.array([c.astype(np.float64)])})

    out = combine_sum(ds.map_batches(partial, batch_format="pyarrow"),
                      ["c"], zeros={"c": np.zeros(depth * width)})
    return np.rint(out["c"]).astype(np.int64)
