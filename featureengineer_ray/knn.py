"""Similarity search over an embedding column (list<float>).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and emits
  per-batch top-k partials; a final tiny reduce merges them. No shuffle of
  the corpus.
- :func:`ivf_topk` — scale path: corpus bucketed by nearest of C sampled
  centroids (one `groupby`), queries probe only their nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds, queries: pd.DataFrame, *, id_col: str, vec_col: str,
    query_id_col: str | None = None, k: int = 5,
):
    """Exact cosine top-k of every corpus row against every query row.

    Returns a small pandas DataFrame (query_id, neighbor id, cosine, rank),
    rank 1-based by (cosine desc, neighbor id asc) — deterministic ties.
    """
    import ray

    qid_col = query_id_col or id_col
    qids = queries[qid_col].to_numpy()
    qm = _normalize(np.stack(queries[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((qids, qm))

    class _Partial:
        def __init__(self):
            self.qids, self.qm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vecs = np.stack(batch.column(vec_col).to_pandas().to_numpy()).astype(np.float64)
            sims = _normalize(vecs) @ self.qm.T  # (n × q)
            n, q = sims.shape
            kk = min(k, n)
            # per-query local top-k (argpartition then exact sort)
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk × q)
            rows = part.reshape(-1)
            cols = np.repeat(np.arange(q)[None, :], kk, axis=0).reshape(-1)
            return pa.table({
                "query_id": pa.array(self.qids[cols]),
                "neighbor_id": pa.array(ids[rows]),
                "cosine": pa.array(sims[rows, cols]),
            })

    partials = ds.map_batches(_Partial, batch_format="pyarrow",
                              concurrency=(1, 8))
    df = partials.to_pandas()  # small: ≤ k × q × n_batches rows
    df = df.sort_values(["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df


def ivf_topk(
    ds, queries: pd.DataFrame, *, id_col: str, vec_col: str,
    query_id_col: str | None = None, k: int = 5, n_centroids: int = 16,
    n_probe: int = 4, seed: int = 7,
):
    """IVF-style ANN: centroids from a deterministic sample; corpus rows
    shuffle once into their nearest-centroid bucket; each query scans only
    its `n_probe` nearest buckets. Recall < 1 by design (scale path)."""
    import ray

    qid_col = query_id_col or id_col
    sample = ds.limit(max(n_centroids * 20, 256)).to_pandas()
    sm = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    cents = _normalize(sm[rng.choice(len(sm), size=min(n_centroids, len(sm)),
                                     replace=False)])
    qids = queries[qid_col].to_numpy()
    qm = _normalize(np.stack(queries[vec_col].to_numpy()).astype(np.float64))
    q_buckets = np.argsort(-(qm @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, qm, cents, q_buckets))

    def assign(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch.column(vec_col).to_pandas().to_numpy()).astype(np.float64)
        b = np.argmax(_normalize(vecs) @ cents.T, axis=1)
        return batch.append_column("__bucket", pa.array(b.astype(np.int64)))

    class _Scan:
        def __init__(self):
            self.qids, self.qm, self.cents, self.qb = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("__bucket").to_numpy(zero_copy_only=False)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            vecs = _normalize(np.stack(
                batch.column(vec_col).to_pandas().to_numpy()).astype(np.float64))
            outs = {"query_id": [], "neighbor_id": [], "cosine": []}
            for qi in range(len(self.qids)):
                probe = set(self.qb[qi])
                m = np.isin(bids, list(probe))
                if not m.any():
                    continue
                sims = vecs[m] @ self.qm[qi]
                kk = min(k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                outs["query_id"].extend([self.qids[qi]] * kk)
                outs["neighbor_id"].extend(ids[m][top])
                outs["cosine"].extend(sims[top])
            return pa.table({k2: pa.array(np.asarray(v))
                             for k2, v in outs.items()})

    partials = ds.map_batches(assign, batch_format="pyarrow").map_batches(
        _Scan, batch_format="pyarrow", concurrency=(1, 8))
    df = partials.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(columns=["query_id", "neighbor_id", "cosine", "rank"])
    df = df.sort_values(["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df
