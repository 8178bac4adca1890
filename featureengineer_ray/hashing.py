"""Stable, vectorized 64-bit hashing.

Every piece of derived randomness in the engine (synthetic data generation,
derived timestamps, hash partitioning, MinHash/SimHash, salting) flows through
these functions so that the engine, the row-at-a-time oracle, and re-runs at
different parallelism levels always agree bit-for-bit.

Two layers:

- ``splitmix64`` / ``mix64``: pure-numpy avalanche mixing over uint64 arrays
  (the SplitMix64 finalizer, public domain constants). Fully vectorized; used
  wherever the inputs are already integers.
- ``hash_str`` / ``hash_str_array``: BLAKE2b-based 64-bit digests of strings.
  Python-level per unique value; callers dictionary-encode first so cost is
  O(unique), not O(rows).

Reference parity note: the reference keys everything on opaque utterance
strings (``FeaGet.py:90-101``); our string hash plays the same "stable key
identity" role, made explicit and collision-checked at 64 bits.
"""

from __future__ import annotations

import hashlib

import numpy as np

_U64 = np.uint64

_C1 = _U64(0xBF58476D1CE4E5B9)
_C2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray | int) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (or scalar). Vectorized."""
    z = np.asarray(x, dtype=_U64)
    with np.errstate(over="ignore"):
        z = (z + _GOLDEN) & _U64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> _U64(30))) * _C1
        z = (z ^ (z >> _U64(27))) * _C2
        z = z ^ (z >> _U64(31))
    return z


def mix64(*parts: np.ndarray | int) -> np.ndarray:
    """Combine several uint64 arrays/scalars into one stable hash stream."""
    acc = splitmix64(np.asarray(parts[0], dtype=_U64))
    for p in parts[1:]:
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ (np.asarray(p, dtype=_U64) + _GOLDEN))
    return acc


def hash_str(s: str, seed: int = 0) -> int:
    """Stable 64-bit hash of one string (BLAKE2b-8 with seed in the person)."""
    h = hashlib.blake2b(
        s.encode("utf-8"), digest_size=8, person=seed.to_bytes(8, "little")
    )
    return int.from_bytes(h.digest(), "little")


def hash_str_array(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash per element of a string array.

    Dictionary-encodes first: only unique strings are hashed in Python, then
    scattered back — O(unique) Python work, O(n) numpy work.
    """
    arr = np.asarray(values)
    uniq, inv = np.unique(arr, return_inverse=True)
    hu = np.fromiter(
        (hash_str(u if isinstance(u, str) else str(u), seed) for u in uniq),
        dtype=_U64, count=len(uniq),
    )
    return hu[inv]


def hash_pa_array(col, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash per element of an Arrow (string/int) column.

    Dictionary-encodes in C++ so only unique values are hashed in Python —
    the fast path for per-batch partition assignment."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = d.dictionary.to_pylist()
    hu = np.fromiter(
        (hash_str(u if isinstance(u, str) else str(u), seed) for u in uniq),
        dtype=_U64, count=len(uniq),
    )
    return hu[idx] if len(idx) else np.zeros(0, dtype=_U64)


def hash_values(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of a numpy array BY VALUE (not position).

    Numeric dtypes go through ``mix64`` on their 64-bit view (O(n) numpy);
    strings/objects through :func:`hash_str_array` (O(unique) Python).
    Used for deterministic row sampling so the decision depends on the
    sampled value, not its batch position — positional sampling picks the
    same row indices in every batch, which biases estimates on ordered
    data (ADVICE r2)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return mix64(arr.astype(np.int64).view(_U64), _U64(seed))
    if arr.dtype.kind == "f":
        return mix64(arr.astype(np.float64).view(_U64), _U64(seed))
    if arr.dtype.kind == "M":  # datetime64
        return mix64(arr.astype("datetime64[us]").astype(np.int64).view(_U64),
                     _U64(seed))
    return hash_str_array(arr, seed)


def uniform_from_hash(h: np.ndarray, mod: int) -> np.ndarray:
    """Map uint64 hashes into [0, mod) as int64 (deterministic 'randint')."""
    return (h % _U64(mod)).astype(np.int64)


class Bloom:
    """Vectorized Bloom filter over uint64 hashes (k=4 derived probes).

    ~`bits_per_key` bits of memory per inserted key regardless of key
    count — the bounded-memory replacement for an exact locator-hash set
    (false positives only admit extra rows into a downstream exact join).
    """

    K = 4

    def __init__(self, n_keys: int, bits_per_key: int = 16):
        m = 1 << max(10, int(np.ceil(np.log2(max(n_keys, 1)
                                             * bits_per_key))))
        self.mask = _U64(m - 1)
        self.words = np.zeros(m // 64, dtype=np.uint64)

    def _probes(self, h: np.ndarray) -> np.ndarray:
        """(K × n) bit positions per hash."""
        out = np.empty((self.K, len(h)), dtype=np.uint64)
        x = np.asarray(h, dtype=_U64)
        for i in range(self.K):
            x = splitmix64(x ^ _U64(0xB10F + i))
            out[i] = x & self.mask
        return out

    def add(self, h: np.ndarray) -> None:
        pos = self._probes(h).reshape(-1)
        np.bitwise_or.at(self.words, (pos >> _U64(6)).astype(np.int64),
                         _U64(1) << (pos & _U64(63)))

    def contains(self, h: np.ndarray) -> np.ndarray:
        pos = self._probes(h)
        hit = np.ones(len(h), dtype=bool)
        for i in range(self.K):
            w = self.words[(pos[i] >> _U64(6)).astype(np.int64)]
            hit &= (w >> (pos[i] & _U64(63))) & _U64(1) != 0
        return hit
