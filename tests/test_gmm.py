"""Soft-posterior GMM sufficient statistics + EM fit (the reference's
T1/A2 core kernel, ``IVector.py:705-730`` / ``mpiIV.py:443-533``):
numpy-oracle conformance, llk monotonicity, resume ≡ straight run, and
layout-invariance of the unbiased hash sampler on an adversarial
sorted-by-source corpus."""

import numpy as np
import pandas as pd
import pytest

from featureengineer_ray import gmm, iterfit, knn
from featureengineer_ray.vecops import sample_vectors


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def _planted(n_per=200, k=3, dim=8, seed=5, spread=4.0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * spread
    vecs = np.concatenate([
        centers[c] + rng.standard_normal((n_per, dim)) * (0.5 + 0.3 * c)
        for c in range(k)])
    src = np.repeat(np.arange(k), n_per)
    return pd.DataFrame({"vec_id": np.arange(len(vecs)),
                         "source": src,
                         "embedding": list(vecs.astype("float64"))})


def test_suff_stats_match_numpy_oracle(rd):
    df = _planted()
    model = gmm.default_model(d=8, k=4, seed=3)
    ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(4)
    st = gmm.suff_stats(ds, model, vec_col="embedding")

    v = np.stack(df["embedding"].to_numpy())
    pp, ls = gmm.log_posteriors(v, model)
    assert st.n == len(df)
    np.testing.assert_allclose(st.stat0, pp.sum(axis=0), rtol=1e-10)
    np.testing.assert_allclose(st.stat1, pp.T @ v, rtol=1e-10)
    np.testing.assert_allclose(st.stat2, pp.T @ (v * v), rtol=1e-10)
    np.testing.assert_allclose(st.llk_w, pp.T @ ls, rtol=1e-10)
    np.testing.assert_allclose(st.llk, ls.sum(), rtol=1e-10)
    # posteriors are a proper distribution: stat0 sums to n
    np.testing.assert_allclose(st.stat0.sum(), len(df), rtol=1e-10)


def test_suff_stats_block_count_invariant(rd):
    """The E-step reduce goes through the 32-way distributed combine:
    the driver pull is O(32) folded rows however many blocks the corpus
    splits into, and the reduced stats agree across layouts (block
    partials are order-sensitive float sums, so equality is allclose at
    1e-10, not bitwise)."""
    df = _planted()
    model = gmm.default_model(d=8, k=4, seed=3)
    pdf = df[["vec_id", "embedding"]]
    st1 = gmm.suff_stats(rd.from_pandas(pdf), model, vec_col="embedding")
    st16 = gmm.suff_stats(rd.from_pandas(pdf).repartition(16), model,
                          vec_col="embedding")
    assert st1.n == st16.n == len(df)
    np.testing.assert_allclose(st1.stat0, st16.stat0, rtol=1e-10)
    np.testing.assert_allclose(st1.stat1, st16.stat1, rtol=1e-10)
    np.testing.assert_allclose(st1.stat2, st16.stat2, rtol=1e-10)
    np.testing.assert_allclose(st1.llk, st16.llk, rtol=1e-10)


def test_log_posteriors_underflow_safe():
    """Rows far from every component still get exact posteriors — the
    log-sum-exp max-shift is the reference's sum_log_probabilities."""
    model = gmm.DiagGmm(w=np.array([0.5, 0.5]),
                        mu=np.array([[0.0, 0.0], [1.0, 1.0]]),
                        invcov=np.ones((2, 2)))
    v = np.array([[1e4, 1e4]])  # lp ≈ -1e8: exp() underflows without shift
    pp, ls = gmm.log_posteriors(v, model)
    assert np.isfinite(ls).all()
    np.testing.assert_allclose(pp.sum(axis=1), 1.0)
    assert pp[0, 1] > pp[0, 0]  # nearer component wins


def test_gmm_fit_monotone_and_resumes(rd, tmp_path):
    df = _planted()

    def factory():
        return rd.from_pandas(df[["embedding"]]).repartition(3)

    ck1 = str(tmp_path / "straight")
    m_full, h_full = gmm.gmm_fit(factory, vec_col="embedding", k=3,
                                 iters=3, ckpt_dir=ck1)
    llk = np.array([h["llk"] for h in h_full])
    assert (np.diff(llk) >= -1e-6).all(), f"llk must not decrease: {llk}"
    assert gmm.latest_ckpt(ck1) == 2  # one artifact per iteration

    # resume after 1 iteration must equal the straight run
    ck2 = str(tmp_path / "resumed")
    gmm.gmm_fit(factory, vec_col="embedding", k=3, iters=1, ckpt_dir=ck2)
    assert gmm.latest_ckpt(ck2) == 0
    m_res, h_res = gmm.gmm_fit(factory, vec_col="embedding", k=3, iters=3,
                               ckpt_dir=ck2)
    np.testing.assert_allclose(m_res.mu, m_full.mu, rtol=1e-12)
    np.testing.assert_allclose(m_res.w, m_full.w, rtol=1e-12)
    np.testing.assert_allclose(m_res.invcov, m_full.invcov, rtol=1e-12)

    # a finished run is a pure no-op
    m_again, _ = gmm.gmm_fit(factory, vec_col="embedding", k=3, iters=3,
                             ckpt_dir=ck2)
    np.testing.assert_allclose(m_again.mu, m_full.mu, rtol=1e-12)

    # the fit actually learns the planted structure: with 3 well-separated
    # clusters of equal size, weights end up near 1/3 each
    assert m_full.w.min() > 0.15 and m_full.w.max() < 0.55


def test_gmm_fit_split_ladder_monotone_and_resumes(rd, tmp_path):
    """EM_split lifecycle: llk is monotone within each level (EM
    guarantee) and the per-level FINAL llk is non-decreasing up the
    ladder (more components fit at least as well); a run resumed from a
    mid-ladder checkpoint is bit-identical to a straight run."""
    df = _planted(n_per=150, k=4, dim=6, seed=8)

    def factory():
        return rd.from_pandas(df[["vec_id", "embedding"]]).repartition(4)

    d1 = str(tmp_path / "straight")
    m1, h1 = gmm.gmm_fit_split(factory, vec_col="embedding", target_k=4,
                               iters_per_level=3, ckpt_dir=d1)
    assert m1.k == 4
    h = pd.DataFrame(h1)
    assert sorted(h["k"].unique()) == [1, 2, 4]
    for _, sub in h.groupby("k"):
        llks = sub.sort_values("iteration")["llk"].to_numpy()
        assert (np.diff(llks) >= -1e-9 * np.abs(llks[:-1])).all()
    finals = h.sort_values(["k", "iteration"]).groupby("k")["llk"].last()
    f = finals.loc[[1, 2, 4]].to_numpy()
    assert (np.diff(f) >= -1e-9 * np.abs(f[:-1])).all()

    # resume: stop the ladder at k=2, continue to k=4 in the same dir
    d2 = str(tmp_path / "resumed")
    gmm.gmm_fit_split(factory, vec_col="embedding", target_k=2,
                      iters_per_level=3, ckpt_dir=d2)
    m2, h2 = gmm.gmm_fit_split(factory, vec_col="embedding", target_k=4,
                               iters_per_level=3, ckpt_dir=d2)
    assert m2.k == 4
    assert m1.mu.tobytes() == m2.mu.tobytes()
    assert m1.w.tobytes() == m2.w.tobytes()
    assert m1.invcov.tobytes() == m2.invcov.tobytes()
    assert [(r["k"], r["iteration"]) for r in h2] \
        == [(r["k"], r["iteration"]) for r in h1]

    # artifact-per-level naming matches the reference lifecycle shape
    import os

    files = sorted(os.listdir(d1))
    assert "gmm_k1_it-0.json" in files and "gmm_k4_it-2.json" in files


def test_split_model_doubles_components():
    m = gmm.default_model(d=8, k=4, seed=3)
    s = gmm.split_model(m)
    assert s.k == 8 and s.mu.shape == (8, 8)
    np.testing.assert_allclose(s.w.sum(), 1.0)
    np.testing.assert_allclose(s.w, np.concatenate([m.w, m.w]) * 0.5)
    # the two children straddle the parent mean along ONE axis
    var = 1.0 / m.invcov
    j = np.argmax(var, axis=1)
    for c in range(4):
        dlt = s.mu[c + 4] - s.mu[c]
        nz = np.flatnonzero(dlt)
        assert list(nz) == [j[c]]
        np.testing.assert_allclose(
            dlt[j[c]], 2.0 * np.sqrt(var[c, j[c]]))
        np.testing.assert_allclose((s.mu[c] + s.mu[c + 4]) / 2, m.mu[c])


def test_mstep_recovers_planted_parameters(rd):
    """On well-separated clusters, a few EM steps recover per-cluster
    means and (heteroscedastic) variances."""
    df = _planted(n_per=300, spread=8.0)
    v = np.stack(df["embedding"].to_numpy())
    model = gmm.init_model(
        __import__("ray").data.from_pandas(df[["embedding"]]).repartition(3),
        vec_col="embedding", k=3, seed=1)
    for _ in range(6):
        pp, _ = gmm.log_posteriors(v, model)
        st = gmm.SuffStats(stat0=pp.sum(0), stat1=pp.T @ v,
                           stat2=pp.T @ (v * v), llk_w=pp.T @ np.zeros(len(v)),
                           llk=0.0, n=len(v))
        model = gmm.m_step(st)
    # each planted cluster center is close to some component mean
    centers = np.stack([v[df["source"] == c].mean(axis=0) for c in range(3)])
    d2 = ((centers[:, None, :] - model.mu[None, :, :]) ** 2).sum(axis=2)
    assert (d2.min(axis=1) < 0.5).all(), d2.min(axis=1)


# --- adversarial layout: corpus sorted by source (VERDICT r2 #3) ----------

def test_sample_vectors_unbiased_on_sorted_corpus(rd):
    """With the corpus SORTED by cluster, limit()-style sampling sees one
    cluster only; the hash sampler must cover all of them uniformly-ish,
    identically across layouts."""
    df = _planted(n_per=400, k=4, seed=9)  # already ordered by source
    ds = rd.from_pandas(df[["embedding"]]).repartition(8)
    s = sample_vectors(ds, vec_col="embedding", n=200, seed=2)
    assert len(s) == 200
    # classify each sampled vector to its nearest planted center
    v = np.stack(df["embedding"].to_numpy())
    centers = np.stack([v[df["source"] == c].mean(axis=0) for c in range(4)])
    lab = np.argmin(((s[:, None, :] - centers[None, :, :]) ** 2).sum(2), 1)
    counts = np.bincount(lab, minlength=4)
    assert (counts > 20).all(), f"sample misses clusters: {counts}"
    # layout-invariant: shuffled corpus yields the same sample set
    s2 = sample_vectors(ds.random_shuffle(seed=4), vec_col="embedding",
                        n=200, seed=2)
    assert np.array_equal(np.sort(s, axis=0), np.sort(s2, axis=0))


def test_kmeans_and_ivf_on_sorted_corpus(rd, tmp_path):
    """kmeans init + IVF centroids must work when blocks are cluster-pure
    (the normal layout at scale): inertia monotone, recall@5 ≥ 0.9."""
    df = _planted(n_per=250, k=4, dim=8, seed=11, spread=6.0)

    def factory():
        return rd.from_pandas(df[["vec_id", "embedding"]]).repartition(8)

    _, hist = iterfit.kmeans_fit(factory, vec_col="embedding", k=4,
                                 iters=3, ckpt_dir=str(tmp_path / "km"))
    inert = hist["inertia"].to_numpy()
    assert (np.diff(inert) <= 1e-6).all()

    queries = df.iloc[[0, 260, 510, 760, 999]][["vec_id", "embedding"]]
    queries = queries.reset_index(drop=True)
    exact = knn.brute_force_topk(factory(), queries, id_col="vec_id",
                                 vec_col="embedding", k=5)
    approx = knn.ivf_topk(factory(), queries, id_col="vec_id",
                          vec_col="embedding", k=5, n_centroids=8,
                          n_probe=3)
    hits = tot = 0
    for qid in queries["vec_id"]:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.9, f"recall {hits}/{tot} on sorted corpus"
