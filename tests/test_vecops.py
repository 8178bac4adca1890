"""Vector ops (project/whiten/length-norm), metrics sink, and the
iterative k-means lifecycle — numpy-oracle conformance + resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import iterfit, metrics, vecops


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


@pytest.fixture(scope="module")
def vec_df():
    rng = np.random.default_rng(17)
    # anisotropic, shifted — whitening has real work to do
    A = rng.standard_normal((12, 12)) * np.linspace(0.2, 3.0, 12)
    vecs = rng.standard_normal((400, 12)) @ A + rng.standard_normal(12) * 5
    return pd.DataFrame({"vec_id": np.arange(400),
                         "embedding": list(vecs.astype("float64"))})


def test_project_matches_numpy(rd, vec_df):
    m = np.random.default_rng(1).standard_normal((12, 4))
    out = vecops.project(rd.from_pandas(vec_df).repartition(3), m,
                         vec_col="embedding").to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    got = np.stack(out["embedding_proj"].to_numpy())
    exp = np.stack(vec_df["embedding"].to_numpy()) @ m
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_vector_moments_match_numpy(rd, vec_df):
    n, mean, cov = vecops.vector_moments(
        rd.from_pandas(vec_df).repartition(5), vec_col="embedding")
    v = np.stack(vec_df["embedding"].to_numpy())
    assert n == len(v)
    np.testing.assert_allclose(mean, v.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(cov, np.cov(v.T, ddof=1), rtol=1e-7)


def test_whiten_identity_covariance(rd, vec_df):
    out = vecops.whiten(rd.from_pandas(vec_df).repartition(3),
                        vec_col="embedding").to_pandas()
    w = np.stack(out["embedding_white"].to_numpy())
    cov = np.cov(w.T, ddof=1)
    np.testing.assert_allclose(cov, np.eye(12), atol=1e-6)
    assert np.abs(w.mean(axis=0)).max() < 1e-9


def test_length_norm_unit(rd, vec_df):
    out = vecops.length_norm(rd.from_pandas(vec_df), vec_col="embedding"
                             ).to_pandas()
    u = np.stack(out["embedding_unit"].to_numpy())
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0, rtol=1e-12)


def test_standardize_dims_matches_numpy(rd, vec_df):
    out = vecops.standardize_dims(rd.from_pandas(vec_df).repartition(3),
                                  id_col="vec_id", vec_col="embedding"
                                  ).to_pandas()
    out = out.sort_values(["vec_id", "dim_idx"]).reset_index(drop=True)
    v = np.stack(vec_df["embedding"].to_numpy())
    z = (v - v.mean(axis=0)) / v.std(axis=0, ddof=1)
    np.testing.assert_allclose(out["value_std"].to_numpy(),
                               np.round(z.reshape(-1), 6), atol=2e-6)


def test_det_curve_and_eer(rd):
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((600, 8)).astype("float64")
    lab = rng.integers(0, 10, 600).astype("int32")
    df = pd.DataFrame({"embedding": list(vecs), "label": lab})
    curve = metrics.det_curve(rd.from_pandas(df).repartition(4))
    # cumulative sweep invariants
    assert (np.diff(curve["cum_tp"]) >= 0).all()
    assert (np.diff(curve["cum_fp"]) >= 0).all()
    assert curve["cum_tp"].iloc[-1] == (lab % 2 == 0).sum()
    assert curve["cum_fp"].iloc[-1] == (lab % 2 == 1).sum()
    # fnr falls / fpr rises as the threshold sweeps down
    assert (np.diff(curve["fnr"]) <= 1e-12).all()
    assert (np.diff(curve["fpr"]) >= -1e-12).all()
    eer = metrics.eer_summary(curve)
    assert len(eer) == 1
    d = np.abs(curve["fnr"] - curve["fpr"])
    assert np.isclose(
        np.abs(eer["fnr"].iloc[0] - eer["fpr"].iloc[0]), d.min())


def test_roc_auc_matches_pairwise_oracle(rd):
    """Exact bucketed AUC == the O(P·N) pairwise Mann–Whitney count
    (ties at equal bucket count half), on a corpus small enough to
    enumerate every (pos, neg) pair."""
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"embedding": list(rng.standard_normal((300, 8))),
                       "label": rng.integers(0, 10, 300).astype("int32")})
    curve = metrics.det_curve(rd.from_pandas(df).repartition(5))
    auc = metrics.roc_auc(curve)

    # naive oracle: recompute every row's bucket score on the driver
    vecs = np.stack(df["embedding"].to_numpy())
    norm = np.sqrt((vecs * vecs).sum(axis=1))
    norm[norm == 0] = 1.0
    bucket = np.floor(vecs[:, 0] / norm * 50.0).astype(np.int64)
    pos = (df["label"].to_numpy() % 2 == 0)
    pb, nb = bucket[pos], bucket[~pos]
    wins = (pb[:, None] > nb[None, :]).sum()
    ties = (pb[:, None] == nb[None, :]).sum()
    expect = (wins + 0.5 * ties) / (len(pb) * len(nb))
    assert auc["n_pos"].iloc[0] == len(pb)
    assert auc["n_neg"].iloc[0] == len(nb)
    assert np.isclose(auc["auc"].iloc[0], np.round(expect, 6), atol=5e-7)
    # degenerate curve: every score identical -> AUC = 0.5
    one = pd.DataFrame({"bucket": [0], "n_pos": [3], "n_neg": [4],
                        "cum_tp": [3], "cum_fp": [4],
                        "fnr": [0.0], "fpr": [1.0]})
    assert metrics.roc_auc(one)["auc"].iloc[0] == 0.5


def test_metrics_artifact_sink(rd, tmp_path):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"embedding": list(rng.standard_normal((200, 8))),
                       "label": rng.integers(0, 10, 200).astype("int32")})
    curve = metrics.det_curve(rd.from_pandas(df))
    out = str(tmp_path / "metrics")
    s1 = metrics.write_metrics_artifact(curve, out)
    assert (tmp_path / "metrics" / "curve.parquet").exists()
    assert (tmp_path / "metrics" / "_SUCCESS.json").exists()
    svg = (tmp_path / "metrics" / "curve.svg").read_text()
    assert svg.startswith("<svg") and "polyline" in svg
    assert svg == metrics.det_curve_svg(curve)  # deterministic bytes
    # idempotent resume: second call is a no-op returning the same summary
    s2 = metrics.write_metrics_artifact(curve.iloc[:1], out)
    assert s1 == s2


def test_small_file_consolidation(rd, tmp_path):
    """S6: many tiny parquet files → consolidated output with far fewer
    files and identical content."""
    import os

    import pyarrow.parquet as pq

    src = tmp_path / "tiny"
    src.mkdir()
    for i in range(40):
        pq.write_table(
            pa.table({"k": np.arange(5) + i * 5,
                      "v": np.arange(5.0) + i}), str(src / f"f{i:03d}.parquet"))
    out = tmp_path / "consolidated"
    ds = rd.read_parquet(str(src))
    ds.repartition(2).write_parquet(str(out))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert 1 <= len(files) <= 4
    got = pq.read_table(str(out)).to_pandas().sort_values("k")
    assert list(got["k"]) == list(range(200))


def test_mahalanobis_scores_match_numpy(rd, vec_df):
    """‖L(x−μ)‖² == (x−μ)ᵀ LᵀL (x−μ) against a direct numpy loop."""
    rng = np.random.default_rng(8)
    mu = rng.normal(0, 1, 12)
    L = rng.normal(0, 0.5, (5, 12))
    out = vecops.mahalanobis_scores(
        rd.from_pandas(vec_df).repartition(3), mu, L,
        vec_col="embedding", digits=None).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    v = np.stack(vec_df["embedding"].to_numpy())
    W = L.T @ L
    exp = np.einsum("nd,de,ne->n", v - mu, W, v - mu)
    np.testing.assert_allclose(out["maha"].to_numpy(), exp, rtol=1e-9)


def test_kmeans_converges_and_resumes(rd, vec_df, tmp_path):
    def factory():
        return rd.from_pandas(vec_df).repartition(3)

    ck1 = str(tmp_path / "straight")
    c_full, h_full = iterfit.kmeans_fit(
        factory, vec_col="embedding", k=5, iters=3, ckpt_dir=ck1)
    inert = h_full["inertia"].to_numpy()
    assert (np.diff(inert) <= 1e-6).all(), "inertia must not increase"
    assert iterfit.latest_ckpt(ck1) == 2  # one artifact per iteration

    # resume: 1 iteration, then continue to 3 — must equal the straight run
    ck2 = str(tmp_path / "resumed")
    iterfit.kmeans_fit(factory, vec_col="embedding", k=5, iters=1,
                       ckpt_dir=ck2)
    assert iterfit.latest_ckpt(ck2) == 0
    c_res, h_res = iterfit.kmeans_fit(
        factory, vec_col="embedding", k=5, iters=3, ckpt_dir=ck2)
    # partial-reduce arrival order may differ between runs → 1-ulp drift
    np.testing.assert_allclose(c_res, c_full, rtol=1e-12)
    np.testing.assert_allclose(h_res["inertia"], h_full["inertia"],
                               rtol=1e-12)

    # a finished run is a pure no-op
    c_again, _ = iterfit.kmeans_fit(
        factory, vec_col="embedding", k=5, iters=3, ckpt_dir=ck2)
    np.testing.assert_allclose(c_again, c_full, rtol=1e-12)


def test_lda_fit_matches_numpy_oracle(rd):
    """Distributed scatter partials == direct numpy LDA on the same data;
    projection separates the planted classes."""
    import numpy as np
    import pyarrow as pa

    from featureengineer_ray import vecops

    rng = np.random.RandomState(11)
    d, per = 12, 120
    centers = rng.randn(3, d) * 4.0
    X = np.vstack([centers[c] + rng.randn(per, d) for c in range(3)])
    y = np.repeat(np.arange(3), per)
    t = pa.table({"vec_id": pa.array(np.arange(len(y), dtype=np.int64)),
                  "embedding": vecops._list_col(X),
                  "label": pa.array(y.astype(np.int64))})
    got = vecops.lda_fit(rd.from_arrow(t).repartition(5),
                         vec_col="embedding", label_col="label", out_dim=2)

    # direct oracle, identical math on the driver
    mu = X.mean(axis=0)
    sw = np.zeros((d, d)); sb = np.zeros((d, d))
    for c in range(3):
        xc = X[y == c]; mc = xc.mean(axis=0)
        sw += (xc - mc).T @ (xc - mc)
        sb += len(xc) * np.outer(mc - mu, mc - mu)
    sw += 1e-6 * np.trace(sw) / d * np.eye(d)
    L = np.linalg.cholesky(sw); li = np.linalg.inv(L)
    m = li @ sb @ li.T
    w, vecs = np.linalg.eigh((m + m.T) / 2.0)
    proj = li.T @ vecs[:, np.argsort(w)[::-1][:2]]
    sign = np.sign(proj[np.abs(proj).argmax(axis=0), np.arange(2)])
    sign[sign == 0] = 1.0
    exp = proj * sign
    np.testing.assert_allclose(got, exp, rtol=1e-8, atol=1e-10)

    # projected class centroids are far apart vs within-class spread
    Z = X @ got
    cent = np.array([Z[y == c].mean(axis=0) for c in range(3)])
    within = max(np.linalg.norm(Z[y == c] - cent[c], axis=1).mean()
                 for c in range(3))
    between = min(np.linalg.norm(cent[a] - cent[b])
                  for a in range(3) for b in range(a + 1, 3))
    assert between > 3 * within


def test_spectral_norm_matches_numpy_reference(rd):
    """Distributed EFR (iterated whiten + length-norm) equals a
    driver-side numpy implementation of the same recursion, and each
    whitening stage actually whitens (identity covariance before the
    length norm)."""
    from featureengineer_ray import vecops

    rng = np.random.default_rng(12)
    A = rng.standard_normal((6, 6))
    vecs = rng.standard_normal((400, 6)) @ A + rng.standard_normal(6) * 3
    df = pd.DataFrame({"vec_id": np.arange(400),
                       "embedding": list(vecs)})

    def factory():
        return rd.from_pandas(df).repartition(5)

    params = vecops.estimate_spectral_norm(factory, vec_col="embedding",
                                           iters=3, eps=0.0)
    got = (vecops.spectral_norm(factory(), params, vec_col="embedding")
           .to_pandas().sort_values("vec_id"))
    gm = np.stack(got["embedding_sn"].to_numpy())

    # numpy reference of the same recursion
    x = vecs.copy()
    for it in range(3):
        mean = x.mean(axis=0)
        cov = np.cov(x, rowvar=False, ddof=1)
        W = np.linalg.inv(np.linalg.cholesky(cov)).T
        np.testing.assert_allclose(params[it][0], mean, rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(params[it][1], W, rtol=1e-7, atol=1e-9)
        y = (x - mean) @ W
        # whitening check: identity covariance at every stage
        np.testing.assert_allclose(np.cov(y, rowvar=False, ddof=1),
                                   np.eye(6), atol=1e-8)
        x = y / np.linalg.norm(y, axis=1, keepdims=True)
    np.testing.assert_allclose(gm, x, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.linalg.norm(gm, axis=1), 1.0, rtol=1e-12)


def test_pca_fit_matches_numpy_oracle(rd):
    """Distributed one-pass PCA == direct numpy eig of the sample
    covariance; components recover the planted high-variance axes."""
    rng = np.random.RandomState(13)
    d, n = 10, 600
    # planted: dims 2 and 7 carry 30x/12x the variance of the rest
    scales = np.ones(d); scales[2], scales[7] = 30.0, 12.0
    X = rng.randn(n, d) * scales
    t = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": list(X)})
    mean, comp, var = vecops.pca_fit(
        rd.from_pandas(t).repartition(6), vec_col="embedding", out_dim=3)

    cov = np.cov(X, rowvar=False, ddof=1)
    comp0, var0 = vecops.pca_solve(cov, 3)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    assert np.allclose(var, var0, rtol=1e-9)
    assert np.allclose(comp, comp0, atol=1e-9)
    # top components align with the planted axes
    assert np.abs(comp[2, 0]) > 0.99
    assert np.abs(comp[7, 1]) > 0.99
    # explained variances descend
    assert var[0] >= var[1] >= var[2]
