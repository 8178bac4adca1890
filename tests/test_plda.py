"""PLDA trainer + LLR scorer (the reference's sidekit-delegated scorer,
IVector.py:1432-1434, reimplemented from the public formulation):
distributed EM == straight numpy EM, planted-subspace recovery,
LLR == direct joint-Gaussian log-density difference, resume ≡ straight,
and same-class trials outscore different-class trials."""

import numpy as np
import pandas as pd
import pytest

from featureengineer_ray import plda


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _corpus(C=12, per=30, d=8, R_true=3, noise=0.5, seed=13):
    """Data drawn FROM a PLDA model: x = mu + F h_c + eps."""
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal(d) * 0.3
    F_true = rng.standard_normal((d, R_true))
    h = rng.standard_normal((C, R_true))
    lab = np.repeat(np.arange(C), per)
    x = mu[None, :] + h[lab] @ F_true.T \
        + rng.standard_normal((C * per, d)) * noise
    df = pd.DataFrame({
        "vec_id": np.arange(C * per, dtype="int64"),
        "label": lab.astype("int64"),
        "embedding": list(x.astype("float64")),
    })
    return df, mu, F_true


def _numpy_em(df, rank, iters, seed=37):
    """Straight driver-side EM — the oracle for the distributed fit."""
    X = np.stack(df["embedding"].to_numpy())
    lab = df["label"].to_numpy()
    N, d = X.shape
    mu = X.mean(axis=0)
    Xc = X - mu
    S = Xc.T @ Xc
    classes = np.unique(lab)
    n_i = np.array([(lab == c).sum() for c in classes], dtype=np.float64)
    f_i = np.stack([X[lab == c].sum(axis=0) for c in classes])
    model = plda.plda_init(mu, S, N, rank, seed)
    F, Sigma = model.F, model.Sigma
    for _ in range(iters):
        FtLam = np.linalg.solve(Sigma, F).T
        G = FtLam @ F
        fc = f_i - n_i[:, None] * mu[None, :]
        _, Cacc, Racc = plda._estep_batch(n_i, fc, FtLam, G)
        F = np.linalg.solve(Racc.T, Cacc.T).T
        Sigma = (S - F @ Cacc.T) / N
        Sigma = 0.5 * (Sigma + Sigma.T)
    return plda.PldaModel(mu, F, Sigma), (N, mu, S)


def _fit_distributed(rd, df, rank, iters, ckpt_dir, parts=5):
    from featureengineer_ray import vecops

    d = len(df["embedding"].iloc[0])
    ds = rd.from_pandas(df).repartition(parts)
    N, mu, cov = vecops.vector_moments(ds, vec_col="embedding")
    S = cov * (N - 1)

    def factory():
        return plda.class_sum_stats(
            rd.from_pandas(df[["embedding", "label"]]).repartition(parts),
            vec_col="embedding", label_col="label", d=d)

    return plda.plda_fit(factory, (N, mu, S), rank=rank, iters=iters,
                         ckpt_dir=ckpt_dir)


def test_class_sum_stats_match_numpy(rd):
    df, _, _ = _corpus()
    d = len(df["embedding"].iloc[0])
    out = plda.class_sum_stats(
        rd.from_pandas(df).repartition(6), vec_col="embedding",
        label_col="label", d=d).to_pandas()
    out = out.sort_values("label").reset_index(drop=True)
    X = np.stack(df["embedding"].to_numpy())
    lab = df["label"].to_numpy()
    assert len(out) == len(np.unique(lab))
    for _, row in out.iterrows():
        sel = lab == row["label"]
        assert row["n"] == sel.sum()
        np.testing.assert_allclose(np.asarray(row["stat0"]), [sel.sum()],
                                   rtol=1e-12)
        np.testing.assert_allclose(np.asarray(row["stat1"]),
                                   X[sel].sum(axis=0), rtol=1e-9)


def test_plda_fit_matches_numpy_em(rd, tmp_path):
    df, _, _ = _corpus()
    want, _ = _numpy_em(df, rank=3, iters=4)
    got = _fit_distributed(rd, df, 3, 4, str(tmp_path / "p"))
    np.testing.assert_allclose(got.mu, want.mu, rtol=1e-9)
    np.testing.assert_allclose(got.F, want.F, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(got.Sigma, want.Sigma, rtol=1e-7,
                               atol=1e-9)


def test_plda_fit_recovers_planted_subspace(rd, tmp_path):
    df, _, F_true = _corpus(C=40, per=25, noise=0.3, seed=5)
    model = _fit_distributed(rd, df, 3, 8, str(tmp_path / "p"))
    qa, _ = np.linalg.qr(model.F)
    qb, _ = np.linalg.qr(F_true)
    s = np.linalg.svd(qa.T @ qb, compute_uv=False)
    assert s.min() > 0.9, s
    # within-class covariance ~ noise² I
    eig = np.linalg.eigvalsh(model.Sigma)
    assert 0.05 < eig.min() and eig.max() < 0.2, eig


def test_llr_equals_direct_gaussian_logpdf():
    rng = np.random.default_rng(3)
    d, R = 6, 2
    F = rng.standard_normal((d, R))
    A = rng.standard_normal((d, d)) * 0.3
    model = plda.PldaModel(rng.standard_normal(d), F,
                           A @ A.T + np.eye(d) * 0.4)
    X1 = rng.standard_normal((50, d)) + model.mu
    X2 = rng.standard_normal((50, d)) + model.mu

    def logpdf(z, cov):
        sign, ld = np.linalg.slogdet(cov)
        q = (z @ np.linalg.inv(cov) * z).sum(axis=1)
        return -0.5 * (len(cov) * np.log(2 * np.pi) + ld + q)

    Sa = F @ F.T
    St = Sa + model.Sigma
    a, b = X1 - model.mu, X2 - model.mu
    joint = np.block([[St, Sa], [Sa, St]])
    want = (logpdf(np.hstack([a, b]), joint)
            - logpdf(a, St) - logpdf(b, St))
    got = plda.llr_pairs(model, X1, X2)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_plda_score_separates_classes(rd, tmp_path):
    df, _, _ = _corpus(C=8, per=40, noise=0.4, seed=9)
    model = _fit_distributed(rd, df, 3, 6, str(tmp_path / "p"))
    X = np.stack(df["embedding"].to_numpy())
    lab = df["label"].to_numpy()
    classes = np.unique(lab)
    M = np.stack([X[lab == c].mean(axis=0) for c in classes])
    out = plda.plda_score(
        rd.from_pandas(df[["vec_id", "embedding"]]).repartition(4),
        model, M, classes, vec_col="embedding",
        id_cols=["vec_id"], enroll_id_col="pred", digits=None
    ).to_pandas()
    top = out.loc[out.groupby("vec_id")["llr"].idxmax()]
    top = top.set_index("vec_id")["pred"]
    truth = df.set_index("vec_id")["label"]
    acc = float((top.loc[truth.index] == truth).mean())
    assert acc > 0.95, acc
    # distributed scorer == driver-side pair formula on a sample
    sub = df.head(20)
    Xs = np.stack(sub["embedding"].to_numpy())
    for j, c in enumerate(classes[:3]):
        want = plda.llr_pairs(model, Xs, np.repeat(M[j][None, :], 20, 0))
        got = out[out["pred"] == c].set_index("vec_id").loc[
            sub["vec_id"], "llr"].to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)


def test_plda_fit_resumes_exactly(rd, tmp_path):
    df, _, _ = _corpus(C=6, per=20, d=5, seed=2)
    full = _fit_distributed(rd, df, 2, 4, str(tmp_path / "a"))
    _fit_distributed(rd, df, 2, 2, str(tmp_path / "b"))
    res = _fit_distributed(rd, df, 2, 4, str(tmp_path / "b"))
    np.testing.assert_allclose(res.F, full.F, rtol=1e-12)
    np.testing.assert_allclose(res.Sigma, full.Sigma, rtol=1e-12)
    again = _fit_distributed(rd, df, 2, 4, str(tmp_path / "b"))
    np.testing.assert_allclose(again.F, full.F, rtol=1e-12)
