"""Iterative model-fit lifecycle: broadcast → E-partials → reduce →
M-step → re-broadcast, with a persisted artifact per iteration and
resume-from-checkpoint.

This is the engine's analog of the reference's core training loop — the
total-variability EM iteration (``IVector.py:131-244``, MPI variant
``mpiIV.py:443-533``) which broadcasts the current model, accumulates
per-shard E-step partials, reduces them, updates the model, and writes a
per-iteration artifact (``T_2048_it-{i}.h5``, ``IVector.py:239-244``).
Demonstrated here as k-means over an embedding column; the
partial-accumulate/reduce shape is the generic piece.

Scale shape: the model (k × d centroids) is broadcast once per iteration
via ``ray.put``; each batch emits (k, k×d, 1) partial sums — map-side
combined, so the reduce moves k·(d+2) numbers per batch regardless of
corpus size; the corpus itself is re-streamed once per iteration and
never materialized.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _ckpt_path(ckpt_dir: str, it: int) -> str:
    return os.path.join(ckpt_dir, f"model_it-{it}.json")


def _write_ckpt(ckpt_dir: str, it: int, centroids: np.ndarray,
                inertia: float, counts: np.ndarray) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = _ckpt_path(ckpt_dir, it) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"iteration": it, "inertia": inertia,
                   "counts": [int(c) for c in counts],
                   "centroids": centroids.tolist()}, f)
    os.replace(tmp, _ckpt_path(ckpt_dir, it))  # atomic (lineage-style)


def load_ckpt(ckpt_dir: str, it: int) -> dict:
    with open(_ckpt_path(ckpt_dir, it)) as f:
        return json.load(f)


def latest_ckpt(ckpt_dir: str) -> int | None:
    """Highest complete iteration artifact, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    its = []
    for f in os.listdir(ckpt_dir):
        if f.startswith("model_it-") and f.endswith(".json"):
            its.append(int(f[len("model_it-"):-len(".json")]))
    return max(its) if its else None


def _init_centroids(ds, vec_col: str, k: int, seed: int) -> np.ndarray:
    # unbiased hash-sample (layout-invariant), not limit(): on a corpus
    # clustered by source, limit() reads one corner of the distribution
    from .vecops import sample_vectors

    m = sample_vectors(ds, vec_col=vec_col, n=max(k * 20, 256), seed=seed)
    rng = np.random.default_rng(seed)
    return m[rng.choice(len(m), size=min(k, len(m)), replace=False)].copy()


def _em_step(ds, centroids: np.ndarray, vec_col: str
             ) -> tuple[np.ndarray, np.ndarray, float]:
    """One broadcast + partial-accumulate + reduce: returns
    (new centroids, assignment counts, total inertia)."""
    import ray

    k, d = centroids.shape
    ref = ray.put(centroids)

    # task fn, not an actor pool: the model travels via the object store
    # (zero-copy local ray.get per batch) and the op fuses with the read —
    # no per-iteration pool spin-up
    def _partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            from .vecops import vec_matrix

            v = vec_matrix(batch.column(vec_col), batch.num_rows)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c
            d2 = (-2.0 * (v @ c.T)
                  + (c * c).sum(axis=1)[None, :])
            a = np.argmin(d2, axis=1)
            xsq = (v * v).sum(axis=1)
            inertia = float((xsq + d2[np.arange(len(a)), a]).sum())
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            sums = np.zeros((k, d))
            np.add.at(sums, a, v)
            return pa.table({
                "cnt": pa.array([cnt.tolist()], type=pa.list_(pa.float64())),
                "sums": pa.array([sums.reshape(-1).tolist()],
                                 type=pa.list_(pa.float64())),
                "inertia": pa.array([inertia], type=pa.float64()),
            })

    cnt = np.zeros(k)
    sums = np.zeros(k * d)
    inertia = 0.0
    for b in ds.map_batches(_partial,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i in range(b.num_rows):
            cnt += np.asarray(b.column("cnt")[i].as_py())
            sums += np.asarray(b.column("sums")[i].as_py())
            inertia += float(b.column("inertia")[i].as_py())
    new = centroids.copy()
    nz = cnt > 0
    new[nz] = sums.reshape(k, d)[nz] / cnt[nz][:, None]
    return new, cnt.astype(np.int64), inertia


def kmeans_fit(
    ds_factory, *, vec_col: str, k: int = 8, iters: int = 3,
    ckpt_dir: str, seed: int = 13, resume: bool = True,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Fit k-means with one artifact per iteration and exact resume.

    ``ds_factory`` is a zero-arg callable returning a fresh Dataset (each
    EM iteration re-streams the input — a Dataset is consumed per pass).
    With ``resume=True`` the latest ``model_it-{i}.json`` is loaded and
    iterations continue from i+1; a finished run is a no-op. Every
    iteration is a pure function of the previous centroids, so resumed
    and straight-through runs are bit-identical (tested)."""
    start = -1
    history: list[dict] = []
    if resume:
        last = latest_ckpt(ckpt_dir)
        if last is not None:
            start = last
            for i in range(last + 1):
                c = load_ckpt(ckpt_dir, i)
                history.append({"iteration": i, "inertia": c["inertia"]})
            centroids = np.asarray(load_ckpt(ckpt_dir, last)["centroids"])
    if start < 0:
        centroids = _init_centroids(ds_factory(), vec_col, k, seed)
    counts = np.zeros(k, dtype=np.int64)
    for it in range(start + 1, iters):
        centroids, counts, inertia = _em_step(ds_factory(), centroids,
                                              vec_col)
        _write_ckpt(ckpt_dir, it, centroids, inertia, counts)
        history.append({"iteration": it, "inertia": inertia})
    return centroids, pd.DataFrame(history)


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str,
                  out_col: str = "cluster"):
    """Tag every row with its nearest-centroid id (broadcast model)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        from .vecops import vec_matrix

        v = vec_matrix(batch.column(vec_col), batch.num_rows)
        d2 = (-2.0 * (v @ c.T)
              + (c * c).sum(axis=1)[None, :])
        return batch.append_column(
            out_col, pa.array(np.argmin(d2, axis=1).astype(np.int64)))

    return ds.map_batches(_assign, batch_format="pyarrow")
