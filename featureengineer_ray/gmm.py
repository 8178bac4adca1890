"""Soft-posterior diagonal-GMM sufficient statistics and EM fit.

This is the engine's counterpart of the reference's single most
load-bearing compute pattern: per record, log Gaussian likelihoods
against a broadcast mixture -> log-sum-exp -> posteriors ``pp`` ->
zeroth/first/second-order sufficient statistics, reduced across workers
(``IVector.py:705-730`` worker kernel, ``mpiIV.py:443-496`` MPI reduce of
the w/mu/invcov accumulators, ``IVector.py:239-244`` per-iteration
checkpoint artifacts). The reference runs it over MPI ranks on HDF5
shards; here the model is broadcast once per iteration via ``ray.put``,
each Arrow batch emits one constant-width partial row
(k·(2d+2)+2 doubles, independent of batch size — map-side combined by
construction), and the driver reduces the partial stream. The corpus is
re-streamed once per iteration and never materialized.

Numerics: everything is float64; the log-sum-exp subtracts the per-row
max so posteriors are exact even when every component log-likelihood is
far below exp's underflow range.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_LOG2PI = float(np.log(2.0 * np.pi))


@dataclass
class DiagGmm:
    """Diagonal-covariance Gaussian mixture: weights (k,), means (k,d),
    inverse variances (k,d)."""

    w: np.ndarray
    mu: np.ndarray
    invcov: np.ndarray

    @property
    def k(self) -> int:
        return len(self.w)

    @property
    def d(self) -> int:
        return self.mu.shape[1]

    def log_const(self) -> np.ndarray:
        """Per-component additive constant: log w + ½Σlog λ − d/2·log 2π
        − ½·μᵀΛμ (the x-independent part of the expanded quadratic)."""
        return (np.log(self.w)
                + 0.5 * np.log(self.invcov).sum(axis=1)
                - 0.5 * self.d * _LOG2PI
                - 0.5 * (self.mu * self.mu * self.invcov).sum(axis=1))

    def to_dict(self) -> dict:
        return {"w": self.w.tolist(), "mu": self.mu.tolist(),
                "invcov": self.invcov.tolist()}

    @staticmethod
    def from_dict(d: dict) -> "DiagGmm":
        return DiagGmm(np.asarray(d["w"], dtype=np.float64),
                       np.asarray(d["mu"], dtype=np.float64),
                       np.asarray(d["invcov"], dtype=np.float64))


def default_model(d: int = 64, k: int = 4, seed: int = 11) -> DiagGmm:
    """Deterministic fixed model for the hash-checked ``gmm_stats`` query.

    Parameters are rounded to 4 decimals so their repr() literals parse
    to bit-identical doubles in both numpy and DuckDB SQL."""
    rng = np.random.default_rng(seed)
    w = np.asarray([0.1, 0.2, 0.3, 0.4][:k], dtype=np.float64)
    w = w / w.sum()
    # means at ±0.3 with tight variances discriminate on the near-
    # isotropic synthetic embeddings (argmax assignments split 4 ways
    # instead of collapsing onto one component)
    mu = np.round(rng.normal(0.0, 0.3, size=(k, d)), 4)
    var = np.round(rng.uniform(0.05, 0.3, size=(k, d)), 4)
    return DiagGmm(w=w, mu=mu, invcov=1.0 / var)


def log_posteriors(v: np.ndarray, model: DiagGmm
                   ) -> tuple[np.ndarray, np.ndarray]:
    """(n,d) rows -> posteriors pp (n,k) and per-row log-evidence (n,).

    lp[i,c] = const_c + x·(μΛ)_c − ½·x²·Λ_c ; log-sum-exp over c.
    Mirrors the reference kernel: ``compute_log_posterior_probabilities``
    + ``sum_log_probabilities`` (``IVector.py:713-719``)."""
    m1 = model.mu * model.invcov                      # (k, d)
    lp = (model.log_const()[None, :]
          + v @ m1.T
          - 0.5 * ((v * v) @ model.invcov.T))         # (n, k)
    m = lp.max(axis=1)
    ex = np.exp(lp - m[:, None])
    s = ex.sum(axis=1)
    logsum = m + np.log(s)
    pp = ex / s[:, None]
    return pp, logsum


@dataclass
class SuffStats:
    """Reduced E-step accumulators (the reference's stat0/stat1 plus the
    second-order stats its UBM M-step needs: ``mpiIV.py:468-488``)."""

    stat0: np.ndarray   # (k,)   Σᵢ pp[i,c]
    stat1: np.ndarray   # (k,d)  Σᵢ pp[i,c]·xᵢ
    stat2: np.ndarray   # (k,d)  Σᵢ pp[i,c]·xᵢ²
    llk_w: np.ndarray   # (k,)   Σᵢ pp[i,c]·logsumᵢ  (posterior-split llk)
    llk: float          # Σᵢ logsumᵢ
    n: int


def suff_stats(ds, model: DiagGmm, *, vec_col: str) -> SuffStats:
    """One distributed E-step: broadcast the model, accumulate per-batch
    partials map-side, then a 32-way distributed combine so the driver
    pulls O(32) pre-folded rows — NOT one row per block (the Ray analog
    of ``comm.Reduce`` in ``mpiIV.py:469-496``; VERDICT r3 #2: the
    per-block driver fold was GBs per EM iteration at ~10⁶ blocks)."""
    import ray

    k, d = model.k, model.d
    ref = ray.put(model)

    def _partial(batch: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        mod = ray.get(ref)
        v = vec_matrix(batch.column(vec_col), batch.num_rows)
        pp, logsum = log_posteriors(v, mod)
        s0 = pp.sum(axis=0)
        s1 = pp.T @ v
        s2 = pp.T @ (v * v)
        lw = pp.T @ logsum
        return pa.table({
            "s0": pa.array([s0.tolist()], type=pa.list_(pa.float64())),
            "s1": pa.array([s1.reshape(-1).tolist()],
                           type=pa.list_(pa.float64())),
            "s2": pa.array([s2.reshape(-1).tolist()],
                           type=pa.list_(pa.float64())),
            "lw": pa.array([lw.tolist()], type=pa.list_(pa.float64())),
            "llk": pa.array([float(logsum.sum())], type=pa.float64()),
            "n": pa.array([batch.num_rows], type=pa.int64()),
        })

    from .combine import combine_sum

    out = ds.map_batches(_partial, batch_format="pyarrow")
    s = combine_sum(out, ["s0", "s1", "s2", "lw", "llk", "n"],
                    zeros={"s0": np.zeros(k), "s1": np.zeros(k * d),
                           "s2": np.zeros(k * d), "lw": np.zeros(k),
                           "llk": 0.0, "n": 0})
    return SuffStats(stat0=s["s0"], stat1=s["s1"].reshape(k, d),
                     stat2=s["s2"].reshape(k, d), llk_w=s["lw"],
                     llk=s["llk"], n=s["n"])


def m_step(st: SuffStats, *, var_floor: float = 1e-8) -> DiagGmm:
    """UBM maximization from reduced stats (``mpiIV.py:505-521`` shape):
    w = stat0/n, μ = stat1/stat0, σ² = stat2/stat0 − μ² (floored)."""
    k = len(st.stat0)
    nz = st.stat0 > 0
    w = st.stat0 / max(st.n, 1)
    w = np.where(nz, w, 1.0 / k)
    w = w / w.sum()
    mu = np.where(nz[:, None], st.stat1 / np.maximum(st.stat0, 1e-300)[:, None],
                  0.0)
    var = st.stat2 / np.maximum(st.stat0, 1e-300)[:, None] - mu * mu
    var = np.maximum(var, var_floor)
    var = np.where(nz[:, None], var, 1.0)
    return DiagGmm(w=w, mu=mu, invcov=1.0 / var)


# --- fit lifecycle (iterfit pattern: artifact per iteration + resume) ----

def _ckpt_path(ckpt_dir: str, it: int) -> str:
    return os.path.join(ckpt_dir, f"gmm_it-{it}.json")


def _write_ckpt(ckpt_dir: str, it: int, model: DiagGmm, llk: float,
                n: int) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = _ckpt_path(ckpt_dir, it) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"iteration": it, "llk": llk, "n": n,
                   **model.to_dict()}, f)
    os.replace(tmp, _ckpt_path(ckpt_dir, it))


def load_ckpt(ckpt_dir: str, it: int) -> dict:
    with open(_ckpt_path(ckpt_dir, it)) as f:
        return json.load(f)


def latest_ckpt(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    its = [int(f[len("gmm_it-"):-len(".json")]) for f in os.listdir(ckpt_dir)
           if f.startswith("gmm_it-") and f.endswith(".json")]
    return max(its) if its else None


def init_model(ds, *, vec_col: str, k: int, seed: int) -> DiagGmm:
    """Data-driven deterministic init: k means from an unbiased
    hash-sample of the corpus (layout-invariant — not the first blocks),
    shared global variance, uniform weights."""
    from .vecops import sample_vectors

    m = sample_vectors(ds, vec_col=vec_col, n=max(k * 32, 256), seed=seed)
    rng = np.random.default_rng(seed)
    mu = m[rng.choice(len(m), size=min(k, len(m)), replace=False)].copy()
    var = np.maximum(m.var(axis=0), 1e-8)
    return DiagGmm(w=np.full(k, 1.0 / k),
                   mu=mu, invcov=np.tile(1.0 / var, (k, 1)))


def gmm_fit(ds_factory, *, vec_col: str, k: int = 4, iters: int = 3,
            ckpt_dir: str, seed: int = 13, resume: bool = True,
            ) -> tuple[DiagGmm, list[dict]]:
    """EM-fit a diagonal GMM with one persisted artifact per iteration
    and exact resume (``IVector.py:239-244``). ``ds_factory`` returns a
    fresh Dataset per pass. Each iteration is a pure function of the
    previous model, so a resumed run is bit-identical to a straight run
    (tested). Returns (model, history of per-iteration mean llk)."""
    start = -1
    history: list[dict] = []
    model: DiagGmm | None = None
    if resume:
        last = latest_ckpt(ckpt_dir)
        if last is not None:
            start = last
            for i in range(last + 1):
                c = load_ckpt(ckpt_dir, i)
                history.append({"iteration": i, "llk": c["llk"],
                                "n": c["n"]})
            model = DiagGmm.from_dict(load_ckpt(ckpt_dir, last))
    if model is None:
        model = init_model(ds_factory(), vec_col=vec_col, k=k, seed=seed)
    for it in range(start + 1, iters):
        st = suff_stats(ds_factory(), model, vec_col=vec_col)
        model = m_step(st)
        _write_ckpt(ckpt_dir, it, model, st.llk, st.n)
        history.append({"iteration": it, "llk": st.llk, "n": st.n})
    return model, history


# --- mixture-splitting UBM growth (EM_split lifecycle) --------------------
#
# The reference trains its UBM 1 → 2048 gaussians by iterative component
# splitting with an artifact per split level (lifecycle driver
# ``IVector.py:539-586``: save ``ubm_{n}g.h5``, ``_split_ditribution()``,
# re-run EM; MPI variant ``mpiIV.py:433-453``). The split recipe is the
# standard public one (each Gaussian splits in two along its
# maximum-variance axis); the E/M machinery is exactly `suff_stats` +
# `m_step` above, so this is a lifecycle wrapper, not a new kernel.

def split_model(model: DiagGmm, scale: float = 1.0) -> DiagGmm:
    """Double the component count: each Gaussian becomes two at
    μ ± scale·σ along its max-variance dimension, halved weights,
    copied covariances. Vectorized (no per-component Python loop)."""
    var = 1.0 / model.invcov
    j = np.argmax(var, axis=1)
    rows = np.arange(model.k)
    shift = np.zeros_like(model.mu)
    shift[rows, j] = scale * np.sqrt(var[rows, j])
    return DiagGmm(w=np.concatenate([model.w, model.w]) * 0.5,
                   mu=np.vstack([model.mu - shift, model.mu + shift]),
                   invcov=np.vstack([model.invcov, model.invcov]))


def _split_ckpt_path(ckpt_dir: str, k: int, it: int) -> str:
    return os.path.join(ckpt_dir, f"gmm_k{k}_it-{it}.json")


def latest_split_ckpt(ckpt_dir: str) -> tuple[int, int] | None:
    """(k, iteration) of the furthest checkpoint on the ladder, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for f in os.listdir(ckpt_dir):
        if f.startswith("gmm_k") and "_it-" in f and f.endswith(".json"):
            k_s, it_s = f[len("gmm_k"):-len(".json")].split("_it-")
            cand = (int(k_s), int(it_s))
            if best is None or cand > best:
                best = cand
    return best


def gmm_fit_split(ds_factory, *, vec_col: str, target_k: int,
                  iters_per_level: int = 2, ckpt_dir: str,
                  split_scale: float = 1.0, resume: bool = True,
                  var_floor: float = 1e-8,
                  ) -> tuple[DiagGmm, list[dict]]:
    """EM_split UBM growth: k=1 (one exact global-moments M-step) →
    split → EM ×``iters_per_level`` → split → ... until ``target_k``
    (a power of two), checkpointing ``gmm_k{n}_it-{i}.json`` per
    iteration per level. Every step is a pure function of the previous
    model, so a run resumed from ANY mid-ladder checkpoint is
    bit-identical to a straight run (tested). Returns (model, history
    rows {k, iteration, llk, n})."""
    if target_k < 1 or (target_k & (target_k - 1)) != 0:
        raise ValueError("target_k must be a power of two")
    os.makedirs(ckpt_dir, exist_ok=True)

    def _save(k: int, it: int, model: DiagGmm, llk: float, n: int):
        tmp = _split_ckpt_path(ckpt_dir, k, it) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": k, "iteration": it, "llk": llk, "n": n,
                       **model.to_dict()}, f)
        os.replace(tmp, _split_ckpt_path(ckpt_dir, k, it))

    history: list[dict] = []
    model: DiagGmm | None = None
    start_k, start_it = 1, -1
    if resume:
        last = latest_split_ckpt(ckpt_dir)
        if last is not None:
            start_k, start_it = last
            with open(_split_ckpt_path(ckpt_dir, *last)) as f:
                c = json.load(f)
            model = DiagGmm.from_dict(c)
            # rebuild history from the persisted ladder (ordered walk)
            k = 1
            while k <= start_k:
                for i in range(iters_per_level):
                    p = _split_ckpt_path(ckpt_dir, k, i)
                    if os.path.exists(p):
                        with open(p) as f:
                            cc = json.load(f)
                        history.append({"k": k, "iteration": i,
                                        "llk": cc["llk"], "n": cc["n"]})
                k *= 2
    if model is None:
        # k=1: the E-step posterior is identically 1 whatever the model
        # params, so ONE pass + M-step yields the exact global moments
        from .vecops import sample_vectors

        probe = sample_vectors(ds_factory(), vec_col=vec_col, n=4, seed=1)
        d_probe = probe.shape[1]
        init = DiagGmm(w=np.ones(1), mu=np.zeros((1, d_probe)),
                       invcov=np.ones((1, d_probe)))
        st = suff_stats(ds_factory(), init, vec_col=vec_col)
        model = m_step(st, var_floor=var_floor)
        _save(1, 0, model, st.llk, st.n)
        history.append({"k": 1, "iteration": 0, "llk": st.llk, "n": st.n})
        start_k, start_it = 1, 0

    k = start_k
    it0 = start_it + 1
    while True:
        # finish the current level's remaining EM iterations
        # (level 1 is the exact moments fit — a single iteration)
        level_iters = 1 if k == 1 else iters_per_level
        for i in range(it0, level_iters):
            st = suff_stats(ds_factory(), model, vec_col=vec_col)
            model = m_step(st, var_floor=var_floor)
            _save(k, i, model, st.llk, st.n)
            history.append({"k": k, "iteration": i, "llk": st.llk,
                            "n": st.n})
        if k >= target_k:
            break
        model = split_model(model, scale=split_scale)
        k *= 2
        it0 = 0
    return model, history


def entity_suff_stats(ds, model: DiagGmm, *, vec_col: str,
                      entity_col: str,
                      target_rows_per_part: int = 1_000_000,
                      carry_cols: list[str] | None = None):
    """Per-ENTITY zeroth/first-order statistics under a broadcast model —
    the reference's per-utterance StatServer accumulation
    (``IVector.py:705-730``: ``stat0 = pp.sum(0)``, ``stat1 = cepᵀ·pp``
    per show), re-expressed as one data-sized hash exchange.

    Per batch: posteriors, then per-(entity, component) partial sums via
    k segment-reduceat passes (k is small; no per-entity Python calls).
    Partials — one row per entity per batch, width k·(d+1)+1 — shuffle
    by entity hash; each partition merges ALL of its entities in one
    vectorized pass. Returns a Dataset with columns
    (entity, n, stat0: list<k>, stat1: list<k·d>).

    ``carry_cols``: per-entity-CONSTANT metadata columns (e.g. a class
    label) carried through the exchange — first value per entity. This
    is how downstream consumers get entity→label without a rows-sized
    side pull (VERDICT r3 #1: q_ivector_det materialized one label row
    per CORPUS row on the driver)."""
    import ray

    from .hashing import hash_values
    from .partition import estimate_rows, hash_shuffle_width

    k, d = model.k, model.d
    ref = ray.put(model)
    est = estimate_rows(ds, entity_col)
    P = hash_shuffle_width(est, target_rows_per_part)

    def _lists(s0: np.ndarray, s1: np.ndarray) -> tuple[pa.Array, pa.Array]:
        m = len(s0)
        off0 = pa.array(np.arange(m + 1, dtype=np.int64) * k)
        off1 = pa.array(np.arange(m + 1, dtype=np.int64) * (k * d))
        a0 = pa.ListArray.from_arrays(
            off0.cast(pa.int32()), pa.array(s0.reshape(-1)))
        a1 = pa.ListArray.from_arrays(
            off1.cast(pa.int32()), pa.array(s1.reshape(-1)))
        return a0, a1

    def _partial(batch: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        mod = ray.get(ref)
        ents = batch.column(entity_col).to_numpy(zero_copy_only=False)
        v = vec_matrix(batch.column(vec_col), batch.num_rows)
        pp, _ = log_posteriors(v, mod)
        uniq, inv = np.unique(ents, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        inv_s = inv[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(inv_s)) + 1)).astype(np.int64)
        m = len(uniq)
        s0 = np.empty((m, k))
        s1 = np.empty((m, k, d))
        pp_s, v_s = pp[order], v[order]
        for c in range(k):
            s0[:, c] = np.add.reduceat(pp_s[:, c], starts)
            s1[:, c, :] = np.add.reduceat(v_s * pp_s[:, c:c + 1], starts,
                                          axis=0)
        n_e = np.diff(np.concatenate((starts, [len(inv_s)])))
        a0, a1 = _lists(s0, s1.reshape(m, k * d))
        h = hash_values(uniq)
        cols = {
            entity_col: pa.array(uniq,
                                 type=batch.schema.field(entity_col).type),
            "n": pa.array(n_e.astype(np.int64)),
            "stat0": a0,
            "stat1": a1,
        }
        first_idx = pa.array(order[starts]) if m else pa.array(
            np.zeros(0, dtype=np.int64))
        for cc in (carry_cols or []):
            cols[cc] = batch.column(cc).take(first_idx)
        cols["__part"] = pa.array((h % np.uint64(P)).astype(np.int32))
        return pa.table(cols)

    def _merge(part: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        ents = part.column(entity_col).to_numpy(zero_copy_only=False)
        n = part.column("n").to_numpy(zero_copy_only=False)
        s0 = vec_matrix(part.column("stat0"), part.num_rows)
        s1 = vec_matrix(part.column("stat1"), part.num_rows)
        uniq, inv = np.unique(ents, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        inv_s = inv[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(inv_s)) + 1)).astype(np.int64)
        m = len(uniq)
        ms0 = np.add.reduceat(s0[order], starts, axis=0)
        ms1 = np.add.reduceat(s1[order], starts, axis=0)
        mn = np.add.reduceat(n[order].astype(np.int64), starts)
        a0, a1 = _lists(ms0, ms1)
        cols = {
            entity_col: pa.array(uniq,
                                 type=part.schema.field(entity_col).type),
            "n": pa.array(mn.astype(np.int64)),
            "stat0": a0,
            "stat1": a1,
        }
        first_idx = pa.array(order[starts]) if m else pa.array(
            np.zeros(0, dtype=np.int64))
        for cc in (carry_cols or []):
            cols[cc] = part.column(cc).take(first_idx)
        return pa.table(cols)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return partials.groupby("__part").map_groups(
        lambda g: _merge(g.drop_columns(["__part"])),
        batch_format="pyarrow")


def gmm_assign(ds, model: DiagGmm, *, vec_col: str,
               out_col: str = "comp", loglik_col: str | None = "loglik"):
    """Tag every row with its max-posterior component (and optionally the
    row log-evidence) under a broadcast model — the scoring counterpart
    of :func:`suff_stats` (the reference applies the trained UBM the
    same way before extraction, ``IVector.py:705-719``)."""
    import ray

    ref = ray.put(model)

    def _assign(batch: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        mod = ray.get(ref)
        v = vec_matrix(batch.column(vec_col), batch.num_rows)
        pp, logsum = log_posteriors(v, mod)
        batch = batch.append_column(
            out_col, pa.array(np.argmax(pp, axis=1).astype(np.int64)))
        if loglik_col is not None:
            batch = batch.append_column(loglik_col, pa.array(logsum))
        return batch

    return ds.map_batches(_assign, batch_format="pyarrow")


def stats_table(ds, model: DiagGmm, *, vec_col: str,
                digits: int = 6) -> pa.Table:
    """Per-component reduced statistics as a small Arrow table — the
    hash-checkable surface of the E-step: (comp, stat0, stat1_sum,
    llk_w), rounded for cross-engine float stability."""
    st = suff_stats(ds, model, vec_col=vec_col)
    return pa.table({
        "comp": pa.array(np.arange(model.k, dtype=np.int64)),
        "stat0": pa.array(np.round(st.stat0, digits)),
        "stat1_sum": pa.array(np.round(st.stat1.sum(axis=1), digits)),
        "llk_w": pa.array(np.round(st.llk_w, digits)),
    })
