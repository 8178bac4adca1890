"""Module tests for relational / dedup / text / knn / multimodal ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import dedup as dd
from featureengineer_ray import knn, multimodal, relational, text


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd

    return rd


def test_broadcast_join_inner_left(rd):
    left = rd.from_items([{"k": i % 5, "v": i} for i in range(100)])
    small = pd.DataFrame({"k": [0, 1, 2], "name": ["a", "b", "c"]})
    inner = relational.broadcast_join(left, small, on="k").to_pandas()
    assert len(inner) == 60 and set(inner["name"]) == {"a", "b", "c"}
    left2 = rd.from_items([{"k": i % 5, "v": i} for i in range(100)])
    l = relational.broadcast_join(left2, small, on="k", how="left").to_pandas()
    assert len(l) == 100 and l["name"].isna().sum() == 40


def test_semi_anti_join(rd):
    ds = rd.from_items([{"k": i} for i in range(20)])
    semi = relational.semi_join(ds, {3, 5, 7}, on="k").to_pandas()
    assert sorted(semi["k"]) == [3, 5, 7]
    ds2 = rd.from_items([{"k": i} for i in range(20)])
    anti = relational.semi_join(ds2, set(range(15)), on="k",
                                anti=True).to_pandas()
    assert sorted(anti["k"]) == [15, 16, 17, 18, 19]


def test_grouped_agg_matches_pandas(rd):
    df = pd.DataFrame({
        "g": np.arange(1000) % 7,
        "x": np.arange(1000, dtype="float64") * 1.5,
    })
    got = relational.grouped_agg(
        rd.from_pandas(df).repartition(5), ["g"],
        {"x_sum": ("x", "sum"), "x_min": ("x", "min"),
         "x_mean": ("x", "mean")}, count_alias="n",
    ).to_pandas().sort_values("g").reset_index(drop=True)
    exp = df.groupby("g").agg(
        x_sum=("x", "sum"), x_min=("x", "min"), x_mean=("x", "mean"),
        n=("x", "size")).reset_index()
    for c in ["x_sum", "x_min", "x_mean", "n"]:
        np.testing.assert_allclose(got[c], exp[c], rtol=1e-12)


def test_grouped_top_k(rd):
    df = pd.DataFrame({"g": np.arange(100) % 4, "x": np.arange(100)})
    got = relational.grouped_top_k(
        rd.from_pandas(df), ["g"], 3, by=["x"], descending=[True],
    ).to_pandas()
    exp = df.sort_values("x", ascending=False).groupby("g").head(3)
    assert sorted(got["x"]) == sorted(exp["x"])


def test_exact_dedup_keeps_first(rd):
    df = pd.DataFrame({
        "k": [1, 1, 2, 2, 3], "ord": [5, 2, 1, 9, 0],
        "val": ["late", "early", "first", "second", "only"]})
    got = dd.exact_dedup(rd.from_pandas(df), keys=["k"],
                         order=["ord"]).to_pandas().sort_values("k")
    assert list(got["val"]) == ["early", "first", "only"]


def test_minhash_finds_near_duplicates(rd):
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest looking for food") * 3
    near = base.replace("quick", "swift")  # high Jaccard
    far = "completely different text about embeddings and shuffles " * 6
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, far]})
    pairs = dd.minhash_candidate_pairs(rd.from_pandas(df), id_col="doc_id",
                                       text_col="text")
    assert ((pairs["id_a"] == 1) & (pairs["id_b"] == 2)).any()
    verified = dd.verify_jaccard_pairs(pairs, df, id_col="doc_id",
                                       text_col="text", threshold=0.5)
    assert len(verified) >= 1 and verified.iloc[0]["jaccard"] > 0.5
    # far doc must not pair with anything at the verify threshold
    assert not ((verified["id_a"] == 3) | (verified["id_b"] == 3)).any()


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog " * 4
    b = a.replace("dog", "cat")
    c = "totally unrelated content with other words entirely " * 4
    fps = dd.simhash64(np.array([a, b, c], dtype=object))
    d_ab = dd.hamming64(np.array([fps[0]]), np.array([fps[1]]))[0]
    d_ac = dd.hamming64(np.array([fps[0]]), np.array([fps[2]]))[0]
    assert d_ab < d_ac


def test_tokenizer_deterministic_and_consistent():
    tbl = pa.table({"text": ["Hello, world!", "", "a b c"]})
    tok = text.Tokenizer()
    out1, out2 = tok(tbl), text.Tokenizer()(tbl)
    assert out1.column("tokens").to_pylist() == out2.column("tokens").to_pylist()
    n_tok = out1.column("n_tok").to_pylist()
    assert n_tok == [4, 0, 3]  # hello , world ! / (empty) / a b c


def test_knn_brute_force_matches_numpy(rd):
    rng = np.random.default_rng(5)
    corpus = pd.DataFrame({
        "vec_id": np.arange(50),
        "embedding": [rng.standard_normal(8).astype("float32")
                      for _ in range(50)]})
    queries = corpus.head(3).copy()
    got = knn.brute_force_topk(
        rd.from_pandas(corpus).repartition(4), queries, id_col="vec_id",
        vec_col="embedding", k=4)
    cm = np.stack(corpus["embedding"].to_numpy()).astype(np.float64)
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    for qi in range(3):
        sims = cm @ cm[qi]
        order = np.lexsort((np.arange(50), -sims))[:4]
        mine = got[got["query_id"] == qi].sort_values("rank")
        np.testing.assert_array_equal(mine["neighbor_id"].to_numpy(), order)


def test_multimodal_stub_pipeline(rd):
    docs = rd.from_items([{"doc_id": i, "text": f"payload {i}" * (i + 1)}
                          for i in range(10)])
    out = multimodal.media_pipeline(docs, batch_size=4).to_pandas()
    assert len(out) == 10
    assert (out["n_bytes"] > 0).all()
    assert (out["height"] == 32).all()
    # deterministic fake decode
    out2 = multimodal.media_pipeline(
        rd.from_items([{"doc_id": i, "text": f"payload {i}" * (i + 1)}
                       for i in range(10)]), batch_size=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True),
        out2.sort_values("media_id").reset_index(drop=True))


def test_decode_stub_raises_without_fake():
    ext = multimodal.MediaFeatureExtractor(use_stub_decode=False)
    tbl = pa.table({"payload": [b"xxx"], "media_id": [1]})
    with pytest.raises(NotImplementedError):
        ext(tbl)
