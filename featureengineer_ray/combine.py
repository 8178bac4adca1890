"""Distributed sum-combine of constant-width partial streams.

The r3 verdict flagged the EM reducers folding ONE partial row per BLOCK
on the driver (``gmm.suff_stats``, ``tv._reduce_partials``): O(blocks)
rows × ``.as_py()`` per field is GBs through the driver per iteration at
~10⁶ blocks (100 TB scale). This module generalizes the shape the repo
already uses for the planning scan (``partition._merge_sample_partials``):
tag each partial row with a deterministic part id, fold each part
vectorized in a worker (``groupby("__cpart").map_groups``), and let the
driver sum only ``COMBINE_WIDTH`` pre-folded rows — the pull is O(32)
regardless of block count.

Determinism: float addition is not associative, so fold order must not
depend on task arrival order (the gmm/tv resume ≡ straight tests assert
bit-exact equality). Inside each part the rows are sorted by a
full-content hash before summing; the driver folds the ≤ COMBINE_WIDTH
part rows in part-id order. Same input rows → same bits, independent of
scheduling. (Results still legitimately differ across BLOCK LAYOUTS —
each block's partial is itself an order-sensitive float sum — exactly as
the previous driver fold did.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import mix64

COMBINE_WIDTH = 32

_SEED = np.uint64(0xA5A5DEADBEEF5A5A)


def _col_matrix(col, n: int) -> np.ndarray:
    """Constant-width list column → (n, w) float64 matrix (zero-copy of
    the flat values buffer when possible)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)[offs[0]:offs[-1]]
    if n == 0:
        return np.zeros((0, 0))
    w = offs[1] - offs[0]
    if not (np.diff(offs) == w).all():
        raise ValueError("combine_sum: list column is not constant-width")
    return np.ascontiguousarray(vals, dtype=np.float64).reshape(n, w)


def _content_hash(batch: pa.Table, columns: list[str]) -> np.ndarray:
    """Vectorized per-row hash over the FULL payload of ``columns`` —
    the deterministic sort/part key (collision ⇒ two rows fold in
    arbitrary relative order; at 64 bits that is ~2⁻⁶⁴ per pair, and
    hash-equal identical rows sum identically either way)."""
    n = batch.num_rows
    acc = np.full(n, _SEED, dtype=np.uint64)
    for name in columns:
        col = batch.column(name)
        typ = batch.schema.field(name).type
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            m = _col_matrix(col, n)
            if m.shape[1]:
                h = mix64(m.view(np.uint64),
                          np.arange(m.shape[1], dtype=np.uint64)[None, :])
                acc = mix64(acc, np.bitwise_xor.reduce(h, axis=1))
        elif pa.types.is_floating(typ):
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            acc = mix64(acc, v.view(np.uint64))
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
            acc = mix64(acc, v.view(np.uint64))
    return acc


def combine_sum(partials, columns: list[str],
                zeros: dict[str, np.ndarray | float | int] | None = None,
                *, width: int = COMBINE_WIDTH) -> dict | None:
    """Sum every row of ``partials`` per column, with a ``width``-way
    distributed pre-fold so the driver pulls ≤ ``width`` rows.

    ``columns``: the payload columns (list<float64> summed element-wise;
    float64/int64 scalars summed). ``zeros``: per-column zero values of
    the right shape (also the result for an empty stream); omit it when
    the caller cannot know the widths upfront — an EMPTY stream then
    returns None.
    """
    def _tag(batch: pa.Table) -> pa.Table:
        h = _content_hash(batch, columns)
        return batch.append_column(
            "__cpart", pa.array((h % np.uint64(width)).astype(np.int32)))

    def _fold(part: pa.Table) -> pa.Table:
        pid = part.column("__cpart")[0].as_py()
        part = part.drop_columns(["__cpart"])
        order = np.argsort(_content_hash(part, columns), kind="stable")
        out: dict[str, pa.Array] = {}
        for name in columns:
            typ = part.schema.field(name).type
            col = part.column(name)
            if pa.types.is_list(typ) or pa.types.is_large_list(typ):
                s = _col_matrix(col, part.num_rows)[order].sum(axis=0)
                out[name] = pa.array([s.tolist()],
                                     type=pa.list_(pa.float64()))
            elif pa.types.is_floating(typ):
                v = col.to_numpy(zero_copy_only=False).astype(np.float64)
                out[name] = pa.array([float(v[order].sum())],
                                     type=pa.float64())
            else:
                v = col.to_numpy(zero_copy_only=False).astype(np.int64)
                out[name] = pa.array([int(v[order].sum())], type=pa.int64())
        out["__cpart"] = pa.array([pid], type=pa.int32())
        return pa.table(out)

    folded = (partials.map_batches(_tag, batch_format="pyarrow")
              .groupby("__cpart")
              .map_groups(_fold, batch_format="pyarrow")
              .to_pandas())
    if len(folded) == 0:
        if zeros is None:
            return None
        return {k: (np.asarray(z, dtype=np.float64).copy()
                    if isinstance(z, np.ndarray) else z)
                for k, z in zeros.items()}
    folded = folded.sort_values("__cpart", kind="stable")
    result: dict = {}
    for name in columns:
        vals = folded[name].to_numpy()
        if vals.dtype == object:  # list column → element-wise vector sum
            acc = (np.asarray(zeros[name], dtype=np.float64).copy()
                   if zeros is not None
                   else np.zeros_like(np.asarray(vals[0],
                                                 dtype=np.float64)))
            for v in vals:
                acc = acc + np.asarray(v, dtype=np.float64)
            result[name] = acc
        elif np.issubdtype(vals.dtype, np.integer):
            base = int(zeros[name]) if zeros is not None else 0
            result[name] = base + int(vals.sum())
        else:
            s = float(zeros[name]) if zeros is not None else 0.0
            for v in vals:
                s += float(v)
            result[name] = s
    return result
