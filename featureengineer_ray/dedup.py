"""Deduplication: exact (reference parity, PrepareData.py:647-658) and the
near-duplicate family a 100 TB training-data pipeline needs (MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup).

Scale shapes:

- **Exact**: hash-partition on the dedup key (`groupby`) + per-group
  first-in-order winner — one shuffle of (key-hash, order, payload).
- **MinHash+LSH**: per-batch vectorized shingle→minhash (numpy), explode to
  (band_id, band_hash, doc_id) rows — `groupby(band)` only moves the tiny
  signature rows, never documents; candidate pairs are verified with exact
  n-gram Jaccard on a broadcast lookup of the candidate docs only.
- **SimHash**: 64-bit fingerprint per doc from token hashes, vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import hash_str_array, mix64, splitmix64


def _n_parts(default: int = 32) -> int:
    try:
        import ray

        return max(8, 2 * int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return default


def exact_dedup(ds, keys: list[str], order: list[str]):
    """Keep the first row per `keys` combination, ordered by `order`.

    Reference semantics: first occurrence wins (PrepareData.py:649).
    One hash-partition shuffle on the key columns; each partition then
    dedups ALL of its key groups in one vectorized pass (per-key
    map_groups calls would pay Python overhead per group — the key
    cardinality can approach the row count)."""
    import pyarrow as pa

    P = _n_parts()

    def assign(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in keys:
            vals = batch.column(k).to_numpy(zero_copy_only=False)
            h = mix64(h, hash_str_array(vals))
        return batch.append_column(
            "__part", pa.array((h % np.uint64(P)).astype(np.int32)))

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="stable")
        g = g.drop_duplicates(subset=keys, keep="first")
        return g.drop(columns=["__part"])

    tagged = ds.map_batches(assign, batch_format="pyarrow")
    from .engine import use_push_shuffle

    use_push_shuffle(tagged)
    return tagged.groupby("__part").map_groups(dedup_part,
                                               batch_format="pandas")


# --------------------------------------------------------------------------
# shingling + MinHash
# --------------------------------------------------------------------------

def _char_shingle_hashes(texts: np.ndarray, k: int, seed: int) -> list[np.ndarray]:
    """Per text: uint64 hashes of its k-char shingles (vectorized per text)."""
    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out.append(splitmix64(
                np.frombuffer(b.tobytes().ljust(8, b"\0"), dtype=np.uint64)))
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        # fold k bytes into uint64 lanes then mix (vectorized rolling hash)
        acc = np.zeros(len(win), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc = acc * np.uint64(1099511628211) + win[:, j].astype(np.uint64)
        out.append(splitmix64(mix64(acc, np.uint64(seed))))
    return out


def minhash_signatures(
    texts: np.ndarray, num_perm: int = 64, k: int = 5, seed: int = 1
) -> np.ndarray:
    """(n_docs × num_perm) uint64 MinHash signature matrix.

    Universal-hash permutations: h_i(x) = splitmix64(x ^ mix(i)); the min
    over a doc's shingle set per permutation.
    """
    perm_salt = splitmix64(np.arange(num_perm, dtype=np.uint64) + np.uint64(seed))
    sig = np.full((len(texts), num_perm), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    for r, sh in enumerate(_char_shingle_hashes(texts, k, seed)):
        if len(sh) == 0:
            continue
        u = np.unique(sh)
        with np.errstate(over="ignore"):
            m = splitmix64(u[:, None] ^ perm_salt[None, :])
        sig[r] = m.min(axis=0)
    return sig


def minhash_explode(
    batch: pa.Table, *, id_col: str, text_col: str,
    num_perm: int = 64, bands: int = 16, k: int = 5, seed: int = 1,
) -> pa.Table:
    """Per-batch: docs → (band_id, band_hash, doc_id) signature rows."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_numpy(zero_copy_only=False)
    sig = minhash_signatures(texts, num_perm=num_perm, k=k, seed=seed)
    rows_per_band = num_perm // bands
    n = len(ids)
    band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
    doc_ids = np.repeat(ids, bands)
    bh = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            acc = np.uint64(1469598103934665603) * np.ones(n, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = splitmix64(acc ^ seg[:, j])
            bh[:, b] = acc
    return pa.table({
        "band_id": pa.array(band_ids),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        "doc_id": pa.array(doc_ids),
    })


def ngram_set(text: str, k: int = 5) -> set:
    return {text[i:i + k] for i in range(max(1, len(text) - k + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


def minhash_candidate_pairs(
    ds, *, id_col: str, text_col: str, num_perm: int = 64, bands: int = 16,
    k: int = 5, seed: int = 1,
):
    """LSH candidate pairs with shared-band counts (pandas DataFrame).

    One shuffle of the tiny signature rows only — documents never move.
    Each hash partition generates the pairs of ALL its (band, hash)
    buckets in one vectorized pass (triu per bucket segment); the final
    shared-band count is a driver-side reduce over the (small) candidate
    pair set."""
    P = _n_parts()

    def explode_assign(batch: pa.Table) -> pa.Table:
        sig = minhash_explode(batch, id_col=id_col, text_col=text_col,
                              num_perm=num_perm, bands=bands, k=k, seed=seed)
        h = mix64(sig.column("band_id").to_numpy(zero_copy_only=False)
                  .astype(np.uint64),
                  sig.column("band_hash").to_numpy(zero_copy_only=False)
                  .view(np.uint64))
        return sig.append_column(
            "__part", pa.array((h % np.uint64(P)).astype(np.int32)))

    def pairs_vec(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"id_a": [], "id_b": []})
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (np.diff(bid) != 0) | (np.diff(bh) != 0)
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [n]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            a, b = np.triu_indices(m, 1)
            out_a.append(ids[s + a])
            out_b.append(ids[s + b])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    tagged = ds.map_batches(explode_assign, batch_format="pyarrow")
    from .engine import use_push_shuffle

    use_push_shuffle(tagged)
    cand = tagged.groupby("__part").map_groups(pairs_vec,
                                               batch_format="pandas")
    pdf = cand.to_pandas()  # candidate pairs ≪ corpus by construction
    if len(pdf) == 0:
        return pd.DataFrame(columns=["id_a", "id_b", "n_bands"])
    out = pdf.groupby(["id_a", "id_b"], sort=True).size().reset_index(
        name="n_bands")
    return out


def verify_jaccard_pairs(
    pairs_df: pd.DataFrame, docs: pd.DataFrame, *, id_col: str,
    text_col: str, k: int = 5, threshold: float = 0.7,
) -> pd.DataFrame:
    """Exact n-gram Jaccard over the (small) candidate set; driver-side."""
    texts = docs.set_index(id_col)[text_col]
    sets: dict = {}
    out = []
    for _, row in pairs_df.iterrows():
        a, b = row["id_a"], row["id_b"]
        for x in (a, b):
            if x not in sets:
                sets[x] = ngram_set(texts.loc[x], k)
        j = jaccard(sets[a], sets[b])
        if j >= threshold:
            out.append({"id_a": a, "id_b": b, "jaccard": j})
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(texts: np.ndarray, seed: int = 2) -> np.ndarray:
    """64-bit SimHash over word-token hashes (vectorized bit counting)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for r, t in enumerate(texts):
        words = t.lower().split()
        if not words:
            continue
        hs = hash_str_array(np.array(words, dtype=object), seed=seed)
        bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                fp |= np.uint64(1) << np.uint64(i)
        out[r] = fp
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b)
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------

def embedding_near_dup_pairs(
    ds, *, id_col: str, vec_col: str, threshold: float = 0.95,
    n_lsh_bits: int = 8, seed: int = 3,
):
    """Near-duplicate vector pairs via random-hyperplane LSH bucketing +
    exact cosine within buckets (one shuffle of (bucket, id, vec))."""

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        vecs = np.stack(batch.column(vec_col).to_pandas().to_numpy())
        dim = vecs.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_lsh_bits))
        bits = (vecs @ planes) > 0
        bucket = (bits * (1 << np.arange(n_lsh_bits))).sum(axis=1)
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64)),
            id_col: pa.array(ids),
            vec_col: batch.column(vec_col).combine_chunks()
            if isinstance(batch.column(vec_col), pa.ChunkedArray)
            else batch.column(vec_col),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        vecs = np.stack(g[vec_col].to_numpy())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        v = vecs / norms
        sims = v @ v.T
        a, b = np.triu_indices(len(ids), 1)
        hit = sims[a, b] >= threshold
        order = np.argsort(ids)
        rank = np.empty(len(ids), dtype=np.int64)
        rank[order] = np.arange(len(ids))
        ia, ib = ids[a[hit]], ids[b[hit]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({
            "id_a": lo, "id_b": hi,
            "cosine": sims[a[hit], b[hit]],
        })

    return ds.map_batches(bucketize, batch_format="pyarrow").groupby(
        "bucket").map_groups(pairs, batch_format="pandas")
