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


def test_global_rank_matches_pandas(rd):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "id": np.arange(5000),
        # duplicated values → ties must resolve by the id tiebreaker
        "score": np.round(rng.random(5000) * 100, 1),
    })
    got = relational.global_rank(
        rd.from_pandas(df).repartition(7), by=["score", "id"],
        descending=[True, False], n_parts=11,
    ).to_pandas().sort_values("id").reset_index(drop=True)
    exp = df.sort_values(["score", "id"], ascending=[False, True],
                         kind="stable")
    exp["rank"] = np.arange(1, len(exp) + 1)
    exp = exp.sort_values("id").reset_index(drop=True)
    np.testing.assert_array_equal(got["rank"].to_numpy(),
                                  exp["rank"].to_numpy())


def test_grouped_top_k(rd):
    df = pd.DataFrame({"g": np.arange(100) % 4, "x": np.arange(100)})
    got = relational.grouped_top_k(
        rd.from_pandas(df), ["g"], 3, by=["x"], descending=[True],
    ).to_pandas()
    exp = df.sort_values("x", ascending=False).groupby("g").head(3)
    assert sorted(got["x"]) == sorted(exp["x"])


def test_bloom_filter():
    from featureengineer_ray.hashing import Bloom, splitmix64

    keys = splitmix64(np.arange(50_000, dtype=np.uint64))
    other = splitmix64(np.arange(50_000, 120_000, dtype=np.uint64))
    b = Bloom(len(keys))
    b.add(keys)
    assert b.contains(keys).all()  # no false negatives, ever
    fp = b.contains(other).mean()
    assert fp < 0.02, fp  # ~0.2% expected at 16 bits/key, k=4


def test_hash_shuffle_width_data_sized():
    from featureengineer_ray.partition import hash_shuffle_width

    floor = hash_shuffle_width(None)
    assert hash_shuffle_width(1000) == floor
    assert hash_shuffle_width(10_000_000_000) == 4096  # capped
    grown = hash_shuffle_width(500_000_000)
    assert grown == 500  # 500M rows / 1M target
    assert hash_shuffle_width(500_000_000, target_rows_per_part=100_000) \
        == 4096


def test_estimate_rows_metadata_and_scan(rd):
    from featureengineer_ray.partition import estimate_rows

    ds = rd.read_parquet("/root/testdata/sf0.001/nation.parquet")
    assert estimate_rows(ds, "n_name") == 25  # metadata, no scan
    mapped = ds.map_batches(lambda b: b, batch_format="pyarrow")
    assert estimate_rows(mapped, "n_name") == 25  # narrow counting pass


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
    verified = dd.verify_jaccard_distributed(
        rd.from_pandas(df), pairs, id_col="doc_id", text_col="text",
        threshold=0.5)
    assert len(verified) >= 1 and verified.iloc[0]["jaccard"] > 0.5
    # far doc must not pair with anything at the verify threshold
    assert not ((verified["id_a"] == 3) | (verified["id_b"] == 3)).any()


def test_minhash_distributed_verify_matches_driver_oracle(rd):
    """Distributed verify == driver-side exact-ngram verify on the real
    sf0.001 documents table (pins the scale-safe path's pair set)."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    docs_ds = rd.read_parquet(f"{sf}/documents.parquet",
                              columns=["doc_id", "text"])
    pairs = dd.minhash_candidate_pairs(docs_ds, id_col="doc_id",
                                       text_col="text")
    got = dd.verify_jaccard_distributed(
        rd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]),
        pairs, id_col="doc_id", text_col="text", threshold=0.5)
    docs_df = pq.read_table(f"{sf}/documents.parquet",
                            columns=["doc_id", "text"]).to_pandas()
    exp = dd.verify_jaccard_pairs(pairs, docs_df, id_col="doc_id",
                                  text_col="text", threshold=0.5)
    exp = exp.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(got["id_a"]) == list(exp["id_a"])
    assert list(got["id_b"]) == list(exp["id_b"])
    np.testing.assert_allclose(got["jaccard"], exp["jaccard"], rtol=1e-12)


def test_minhash_bucket_cap_bounds_pairs(rd):
    """A degenerate bucket (many identical docs) must produce at most
    cap·(cap-1)/2 pairs, not m²/2."""
    same = "identical boilerplate text repeated across many documents " * 4
    df = pd.DataFrame({"doc_id": np.arange(40),
                       "text": [same] * 40})
    pairs = dd.minhash_candidate_pairs(
        rd.from_pandas(df), id_col="doc_id", text_col="text", bucket_cap=8)
    # each (band,hash) bucket contributes at most C(8,2)=28 pairs; dedup
    # across bands leaves at most 28 unique pairs, never C(40,2)=780
    assert len(pairs) <= 28
    involved = set(pairs["id_a"]) | set(pairs["id_b"])
    assert involved <= set(range(8))


def test_simhash_near_dup_lsh_exact_vs_bruteforce(rd):
    """4×16 banding must find EXACTLY the hamming≤3 pairs (pigeonhole) —
    compared against brute force over all pairs of the sf0.001 docs."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = dd.simhash_near_dup_pairs(
        rd.read_parquet(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"]),
        id_col="doc_id", text_col="text")
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    fp = dd.simhash64(t.column("text").to_numpy(zero_copy_only=False))
    a, b = np.triu_indices(len(ids), 1)
    d = dd.hamming64(fp[a], fp[b])
    hit = d <= 3
    exp = pd.DataFrame({
        "id_a": np.minimum(ids[a[hit]], ids[b[hit]]),
        "id_b": np.maximum(ids[a[hit]], ids[b[hit]]),
        "hamming": d[hit].astype("int64"),
    }).sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"id_a": exp["id_a"].dtype}),
                                  exp.astype({"id_a": exp["id_a"].dtype}))


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog " * 4
    b = a.replace("dog", "cat")
    c = "totally unrelated content with other words entirely " * 4
    fps = dd.simhash64(np.array([a, b, c], dtype=object))
    d_ab = dd.hamming64(np.array([fps[0]]), np.array([fps[1]]))[0]
    d_ac = dd.hamming64(np.array([fps[0]]), np.array([fps[2]]))[0]
    assert d_ab < d_ac


TEXTS = np.array([
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "der und die das ist nicht ein zu mit der der der",
    "a",
    "exactly8",          # one full 8-byte lane
    "exactly8bytes!!",   # 15 bytes: lane + 7-byte padded tail
    "le la les et est une que pour dans le",
    "x" * 1000,
    "Mixed CASE With   punctuation!!! and numbers 12345 ...",
    "short",
    "the " * 200,
], dtype=object)


def _naive_fingerprint(texts, seed=9):
    """Round-1 per-doc chain — pins the vectorized version bit-for-bit."""
    from featureengineer_ray.hashing import splitmix64

    fps = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        acc = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):
            pad = (-len(b)) % 8
            lanes = np.concatenate(
                [b, np.zeros(pad, dtype=np.uint64)]).reshape(-1, 8)
            lane_vals = (lanes * (np.uint64(1) << (
                np.uint64(8) * np.arange(8, dtype=np.uint64)))).sum(
                axis=1, dtype=np.uint64)
            for v in splitmix64(lane_vals ^ np.uint64(seed)):
                acc = splitmix64(acc ^ v)
        fps[i] = acc
    return fps


def test_fingerprint_vectorized_matches_naive():
    tbl = pa.table({"text": TEXTS})
    got = text.fingerprint_batch(tbl)["fingerprint"].to_numpy()
    exp = _naive_fingerprint(TEXTS).view(np.int64)
    np.testing.assert_array_equal(got, exp)
    # tiny lane budget → many row-chunks → identical result
    got2 = text.fingerprint_batch(tbl, lane_budget=64)[
        "fingerprint"].to_numpy()
    np.testing.assert_array_equal(got2, exp)


def _naive_simhash(texts, seed=2):
    from featureengineer_ray.hashing import hash_str_array

    out = np.zeros(len(texts), dtype=np.uint64)
    for r, t in enumerate(texts):
        words = t.lower().split()
        if not words:
            continue
        hs = hash_str_array(np.array(words, dtype=object), seed=seed)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                fp |= np.uint64(1) << np.uint64(i)
        out[r] = fp
    return out


def _naive_shingle_hashes(texts, k, seed):
    """Round-1 per-text shingle hashing — the pinned oracle."""
    from featureengineer_ray.hashing import mix64, splitmix64

    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out.append(splitmix64(
                np.frombuffer(b.tobytes().ljust(8, b"\0"), dtype=np.uint64)))
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        acc = np.zeros(len(win), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc = acc * np.uint64(1099511628211) + win[:, j].astype(
                    np.uint64)
        out.append(splitmix64(mix64(acc, np.uint64(seed))))
    return out


def test_minhash_signatures_batched_matches_naive():
    """Batch-vectorized shingling + permutation-min == the per-doc
    round-1 formulation, bit for bit."""
    from featureengineer_ray.dedup import (_char_shingle_hashes,
                                           minhash_signatures)
    from featureengineer_ray.hashing import splitmix64

    naive = _naive_shingle_hashes(TEXTS, 5, 1)
    vect = _char_shingle_hashes(TEXTS, 5, 1)
    assert len(naive) == len(vect)
    for a, b in zip(naive, vect):
        np.testing.assert_array_equal(a, b)

    got = minhash_signatures(TEXTS, num_perm=32, k=5, seed=1, perm_chunk=7)
    salt = splitmix64(np.arange(32, dtype=np.uint64) + np.uint64(1))
    exp = np.full((len(TEXTS), 32), np.iinfo(np.uint64).max, dtype=np.uint64)
    for r, sh in enumerate(naive):
        u = np.unique(sh)
        with np.errstate(over="ignore"):
            exp[r] = splitmix64(u[:, None] ^ salt[None, :]).min(axis=0)
    np.testing.assert_array_equal(got, exp)


def test_simhash_vectorized_matches_naive():
    np.testing.assert_array_equal(dd.simhash64(TEXTS), _naive_simhash(TEXTS))


def _naive_langid(texts):
    import re

    from featureengineer_ray.text import _LANG_PROFILES

    word = re.compile(r"[a-z]+")
    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
    langs, quals = [], []
    for t in texts:
        lt = t.lower()
        words = word.findall(lt)
        nw = max(1, len(words))
        scores = {lang: sum(1 for w in words if w in prof) / nw
                  for lang, prof in profiles.items()}
        best = max(scores, key=lambda k: (scores[k], k))
        langs.append(best if scores[best] > 0.02 else "und")
        n_alpha = sum(len(w) for w in words)
        alpha_ratio = n_alpha / max(1, len(t))
        stop_ratio = scores[best]
        len_score = min(1.0, len(t) / 500.0)
        mwl = n_alpha / nw
        mwl_score = 1.0 - min(1.0, abs(mwl - 5.0) / 5.0)
        quals.append((len_score + min(1.0, alpha_ratio * 1.25)
                      + min(1.0, stop_ratio * 5.0) + mwl_score) / 4.0)
    return langs, quals


def test_langid_vectorized_matches_naive():
    tbl = pa.table({"text": TEXTS})
    out = text.LangIdQuality()(tbl)
    exp_langs, exp_quals = _naive_langid(TEXTS)
    assert out["lang_pred"].to_pylist() == exp_langs
    np.testing.assert_array_equal(out["quality"].to_numpy(),
                                  np.array(exp_quals))


def test_langid_detects_planted_languages():
    """Ground-truth-by-construction correctness for the M2 predicate:
    stopword-rich sentences in each profiled language must be identified;
    contentless/neutral text falls back to 'und'."""
    samples = {
        "en": "the cat and the dog ran to the park and it was a good day",
        "de": "der hund und die katze sind nicht mit der maus zu haus",
        "fr": "le chat est dans la maison et les chiens sont pour une vie",
        "es": "el perro y la casa es una de los gatos que por con ellos",
        "und": "zzz qqq xxx www kkk jjj",
    }
    tbl = pa.table({"text": list(samples.values())})
    out = text.LangIdQuality()(tbl)
    assert out["lang_pred"].to_pylist() == list(samples.keys())
    q = out["quality"].to_numpy()
    assert (q[:4] > q[4]).all()  # real language scores above noise


def test_langid_accuracy_on_planted_corpus(rd):
    """M2 graduates from self-consistency: a 2000-doc corpus with PLANTED
    language labels (datagen.generate_documents — each doc's function
    words drawn from its language's list, with genuine fr/es overlap) is
    classified by the distributed LangIdQuality stage at >= 95% accuracy,
    scored against the ground truth column (VERDICT r3 next-#5)."""
    from featureengineer_ray.datagen import generate_documents

    tbl = generate_documents(2000, seed=17)
    out = (rd.from_arrow(tbl).repartition(8)
           .map_batches(text.LangIdQuality(), batch_format="pyarrow")
           .to_pandas())
    acc = (out["lang_pred"] == out["lang"]).mean()
    assert acc >= 0.95, f"planted-label accuracy {acc:.3f}"
    # per-language recall: no language collapses into another
    for lg, sub in out.groupby("lang"):
        assert (sub["lang_pred"] == lg).mean() >= 0.85, lg


def test_tokenizer_deterministic_and_consistent():
    tbl = pa.table({"text": ["Hello, world!", "", "a b c"]})
    tok = text.Tokenizer()
    out1, out2 = tok(tbl), text.Tokenizer()(tbl)
    assert out1.column("tokens").to_pylist() == out2.column("tokens").to_pylist()
    n_tok = out1.column("n_tok").to_pylist()
    assert n_tok == [4, 0, 3]  # hello , world ! / (empty) / a b c


def test_embedding_near_dup_finds_planted_pairs(rd):
    """Planted near-duplicate vectors must surface; bucket sizing and the
    tiled similarity must not change the answer."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 16))
    dups = base[:20] + 0.001 * rng.standard_normal((20, 16))  # cos ≈ 1
    vecs = np.concatenate([base, dups]).astype("float64")
    ids = np.arange(len(vecs))
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    got = dd.embedding_near_dup_pairs(
        rd.from_pandas(df).repartition(4), id_col="vec_id",
        vec_col="embedding", threshold=0.99, n_rows=len(df),
        target_bucket_rows=32, tile_rows=16,
    ).to_pandas()
    found = set(zip(got["id_a"], got["id_b"]))
    planted = {(i, 200 + i) for i in range(20)}
    # hyperplane LSH may split a rare pair across buckets; require ≥90%
    assert len(found & planted) >= 18
    # and nothing below the threshold sneaks in
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for a, b in found:
        assert float(nv[a] @ nv[b]) >= 0.99


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


def test_knn_distributed_combine_equals_driver_fold(rd):
    """The per-query top-k pre-fold (driver pull bounded at k×q rows,
    not k×q×blocks — VERDICT r3 #2) is bit-identical to the driver-side
    fold: the tie order (cosine desc, neighbor_id asc) makes the top-k
    selection order-independent."""
    rng = np.random.default_rng(11)
    corpus = pd.DataFrame({
        "vec_id": np.arange(300),
        "embedding": [rng.standard_normal(8) for _ in range(300)]})
    queries = corpus.head(5).copy()
    ds = rd.from_pandas(corpus).repartition(13)
    a = knn.brute_force_topk(ds, queries, id_col="vec_id",
                             vec_col="embedding", k=6,
                             distributed_combine=False)
    b = knn.brute_force_topk(ds, queries, id_col="vec_id",
                             vec_col="embedding", k=6,
                             distributed_combine=True)
    pd.testing.assert_frame_equal(a, b)


def _clustered_corpus(n_clusters=16, per_cluster=60, dim=16, seed=21):
    """Vectors with genuine cluster structure (IVF's applicability regime)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    vecs = np.concatenate([
        centers[c] + rng.standard_normal((per_cluster, dim))
        for c in range(n_clusters)])
    ids = np.arange(len(vecs))
    return pd.DataFrame({"vec_id": ids, "embedding": list(
        vecs.astype("float64"))})


def test_ivf_recall_and_pruning(rd):
    """IVF must (a) reach recall@5 ≥ 0.9 vs brute force on clustered data
    while (b) probing only a fraction of the buckets (real pruning —
    VERDICT r01 #4 said round-1 scanned every batch for every query)."""
    corpus = _clustered_corpus()
    queries = corpus.iloc[[0, 75, 200, 431, 700, 900]].reset_index(drop=True)
    exact = knn.brute_force_topk(
        rd.from_pandas(corpus).repartition(4), queries, id_col="vec_id",
        vec_col="embedding", k=5)
    approx = knn.ivf_topk(
        rd.from_pandas(corpus).repartition(4), queries, id_col="vec_id",
        vec_col="embedding", k=5, n_centroids=16, n_probe=4)
    hits = tot = 0
    for qid in queries["vec_id"]:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.9, f"recall {hits}/{tot}"


def test_ivf_persisted_index_prunes_reads(rd, tmp_path):
    """ivf_build writes a bucket-partitioned index; ivf_search reads only
    probed bucket directories and matches the in-memory ivf_topk."""
    import os

    corpus = _clustered_corpus()
    queries = corpus.iloc[[10, 350, 777]].reset_index(drop=True)
    idx = str(tmp_path / "ivf_index")
    knn.ivf_build(rd.from_pandas(corpus).repartition(4), idx,
                  vec_col="embedding", n_centroids=16)
    bucket_dirs = [d for d in os.listdir(idx) if d.startswith("__bucket=")]
    assert len(bucket_dirs) > 4  # real spread across buckets
    got = knn.ivf_search(idx, queries, id_col="vec_id", vec_col="embedding",
                         k=5, n_probe=4)
    mem = knn.ivf_topk(rd.from_pandas(corpus), queries, id_col="vec_id",
                       vec_col="embedding", k=5, n_centroids=16, n_probe=4)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["query_id", "neighbor_id", "rank"]],
        mem.reset_index(drop=True)[["query_id", "neighbor_id", "rank"]])


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


def test_media_resizer_block_pool(rd):
    docs = rd.from_items([{"doc_id": i, "text": "x" * (100 + i)}
                          for i in range(6)])

    def attach(b):
        return multimodal.attach_payload(b)

    out = docs.map_batches(attach, batch_format="pyarrow").map_batches(
        multimodal.MediaResizer, batch_format="pyarrow",
        fn_constructor_kwargs={"out_hw": 8, "src_hw": 32},
        concurrency=1).to_pandas()
    assert len(out) == 6 and (out["thumb_hw"] == 8).all()
    # block-mean of the deterministic fake image, verified directly
    for _, row in out.iterrows():
        img = multimodal._fake_image(
            ("x" * (100 + int(row["media_id"]))).encode(), 32)
        exp = img.reshape(8, 4, 8, 4).mean(axis=(1, 3)).reshape(-1)
        np.testing.assert_allclose(np.asarray(row["thumb"]), exp, rtol=1e-12)


def test_frame_sampler_explode(rd):
    docs = rd.from_items([{"doc_id": i, "text": "y" * (i * 300 + 10)}
                          for i in range(5)])
    out = multimodal.frame_pipeline(docs, stride=4).to_pandas()
    for i in range(5):
        n_bytes = i * 300 + 10
        n_frames = max(1, n_bytes // 256)
        rows = out[out["media_id"] == i]
        assert len(rows) == len(range(0, n_frames, 4))
        assert (rows["n_frames"] == n_frames).all()
    # deterministic across runs
    out2 = multimodal.frame_pipeline(
        rd.from_items([{"doc_id": i, "text": "y" * (i * 300 + 10)}
                       for i in range(5)]), stride=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True),
        out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True))


def test_decode_stub_raises_without_fake():
    ext = multimodal.MediaFeatureExtractor(use_stub_decode=False)
    tbl = pa.table({"payload": [b"xxx"], "media_id": [1]})
    with pytest.raises(NotImplementedError):
        ext(tbl)


# ---------------------------------------------------------------- corpus ops

def _docs_batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


def test_term_frequencies_matches_python_counts(rd):
    texts = ["the cat sat on the mat", "a cat! a CAT, a hat",
             "", "punct-only !!! ???", "mat mat mat"]
    from collections import Counter
    import re

    want = Counter(w for t in texts
                   for w in re.split("[^a-z0-9]+", t.lower()) if w)
    ds = rd.from_arrow(_docs_batch(texts))
    got = {r["term"]: r["n"] for r in
           text.term_frequencies(ds).take_all()}
    assert got == dict(want)


def test_rep_ratio_matches_python_sets():
    texts = ["a a a a", "a b c d", "x y x y z", ""]
    out = text.rep_ratio_batch(_docs_batch(texts)).to_pandas()
    import re

    for i, t in enumerate(texts):
        words = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_distinct"] == len(set(words))
        if words:
            assert out.loc[i, "rep_ratio"] == pytest.approx(
                round(1 - len(set(words)) / len(words), 6))
        else:
            assert pd.isna(out.loc[i, "rep_ratio"])


def test_quality_flags_rule_boundaries():
    texts = [
        "one two three four five six",        # passes all rules
        "a b c",                              # too few words
        "ab " * 100,                          # mean word len 2.0 -> passes
        "x " * 6,                             # mean word len 1 -> fails
        "words here ok fine yes !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!",  # symbols
    ]
    out = text.quality_flags_batch(_docs_batch(texts)).to_pandas()
    assert list(out["pass_gopher"]) == [1, 0, 1, 0, 0]


def test_grouped_quantiles_hist_matches_quantile_disc(rd):
    rng = np.random.default_rng(7)
    ks = rng.integers(0, 3, 500)
    vs = rng.integers(0, 40, 500)
    ds = rd.from_arrow(pa.table({"k": pa.array([f"g{k}" for k in ks]),
                                 "v": pa.array(vs, type=pa.int64())}))
    got = relational.grouped_quantiles_hist(
        ds, "k", "v", [0.25, 0.5, 0.95], ["p25", "p50", "p95"]
    ).to_pandas().set_index("k").sort_index()
    for k in ["g0", "g1", "g2"]:
        v = np.sort(vs[ks == int(k[1])])
        for q, name in [(0.25, "p25"), (0.5, "p50"), (0.95, "p95")]:
            want = v[int(np.ceil(q * len(v))) - 1]
            assert got.loc[k, name] == want, (k, name)


def test_grouped_agg_all_null_group_sums_to_null(rd):
    # SQL SUM over an all-null group is NULL, not 0 (ADVICE r01)
    t = pa.table({
        "k": pa.array(["a", "a", "b", "b", "c"]),
        "v": pa.array([1.0, 2.0, None, None, None], type=pa.float64()),
    })
    out = relational.grouped_agg(rd.from_arrow(t), ["k"],
                                 {"s": ("v", "sum")}).to_pandas()
    out = out.set_index("k").sort_index()
    assert out.loc["a", "s"] == 3.0
    assert pd.isna(out.loc["b", "s"])
    assert pd.isna(out.loc["c", "s"])


def test_resolve_duplicate_clusters_unionfind():
    pairs = pd.DataFrame({"id_a": [3, 5, 10], "id_b": [5, 7, 11]})
    out = dd.resolve_duplicate_clusters(pairs).sort_values("id")
    # chain 3-5-7 -> keep 3; pair 10-11 -> keep 10
    assert dict(zip(out["id"], out["kept"])) == {5: 3, 7: 3, 11: 10}


def test_near_dup_dedup_keeps_min_id_per_cluster(rd):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight") * 3
    texts = [base, base + " extra", base + " other tail",
             "completely different content about ray data shuffles "
             "and arrow batches streaming through the object store",
             "yet another unrelated document talking about parquet "
             "row groups and column pruning at scale"]
    t = pa.table({"doc_id": pa.array([10, 11, 12, 20, 30],
                                     type=pa.int64()),
                  "text": pa.array(texts)})
    out = dd.near_dup_dedup(rd.from_arrow(t), id_col="doc_id",
                            text_col="text", threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [10, 20, 30]


def test_near_dup_dedup_plan_switch_same_survivors(rd):
    """Forced-switch fixture (VERDICT r4 #3): the driver union-find
    path and the distributed connected-components + left_anti path
    must produce the SAME survivor set; auto mode with a zero pair
    cap takes the distributed route on integer ids."""
    base1 = ("the quick brown fox jumps over the lazy dog and then "
             "runs far away into the deep dark forest tonight") * 3
    base2 = ("streaming arrow batches through the ray object store "
             "with backpressure keeps the pipeline memory bounded") * 3
    texts = [base1, base1 + " extra", base1 + " other tail",
             base2, base2 + " coda",
             "completely unrelated content about parquet row groups "
             "and column pruning for hundred terabyte scans"]
    t = pa.table({"doc_id": pa.array([10, 11, 12, 20, 21, 30],
                                     type=pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)
    kw = dict(id_col="doc_id", text_col="text", threshold=0.5)
    drv = sorted(r["doc_id"] for r in dd.near_dup_dedup(
        ds, resolve="driver", **kw).take_all())
    dist = sorted(r["doc_id"] for r in dd.near_dup_dedup(
        ds, resolve="distributed", **kw).take_all())
    auto = sorted(r["doc_id"] for r in dd.near_dup_dedup(
        ds, driver_pair_cap=0, **kw).take_all())
    assert drv == dist == auto == [10, 20, 30]
    # distributed path preserves non-key columns and full rows
    cols = dd.near_dup_dedup(ds, resolve="distributed",
                             **kw).schema().names
    assert set(cols) == {"doc_id", "text"}
    with pytest.raises(ValueError):
        dd.near_dup_dedup(ds, resolve="bogus", **kw)


def test_drop_empty_blocks_unpoisons_native_join(rd):
    """Regression for the Ray 2.49 hash-shuffle defect: a 0-row block
    scheduled FIRST on the right side of a native join skips the
    schema broadcast and crashes pyarrow's join in partitions that got
    no real rows. drop_empty_blocks must strip the empties (metadata
    only) and leave row content intact."""
    import ray
    from featureengineer_ray.relational import drop_empty_blocks

    b0 = pa.table({"k": pa.array([], type=pa.int64())})
    b1 = pa.table({"k": pa.array([12], type=pa.int64())})
    b2 = pa.table({"k": pa.array([11, 21], type=pa.int64())})
    right = drop_empty_blocks(rd.from_arrow([b0, b1, b2]).materialize())
    sizes = [m.num_rows for bu in right.iter_internal_ref_bundles()
             for _, m in bu.blocks]
    assert sorted(sizes) == [1, 2]
    left = rd.from_arrow(pa.table(
        {"k": pa.array([10, 11, 12, 20, 21, 30], type=pa.int64())}))
    out = left.join(right, join_type="left_anti", num_partitions=4,
                    on=("k",), right_on=("k",))
    assert sorted(r["k"] for r in out.take_all()) == [10, 20, 30]
    # no empties → returned unchanged; all-empty → returned as-is
    clean = rd.from_arrow([b1, b2]).materialize()
    assert drop_empty_blocks(clean) is clean
    allempty = rd.from_arrow([b0]).materialize()
    assert drop_empty_blocks(allempty) is allempty


def test_htk_roundtrip_lossless(tmp_path):
    """float32 HTK write→decode is bit-exact; header fields survive."""
    from featureengineer_ray import htk

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((13, 5)).astype(np.float32)
    p = str(tmp_path / "a.htk")
    htk.write_htk(p, mat, samp_period=625, parm_kind=htk.PARM_MFCC)
    with open(p, "rb") as f:
        data, hdr = htk.decode_htk(f.read())
    assert np.array_equal(data, mat)
    assert hdr == {"n_samples": 13, "samp_period": 625, "n_features": 5,
                   "kind": "MFCC", "qualifiers": ""}


def test_htk_compressed_and_int16_decode(tmp_path):
    """_C compressed round-trips within quantization error; WAVEFORM
    int16 decodes with the 1/32767 scale; _V raises."""
    import struct

    from featureengineer_ray import htk

    rng = np.random.default_rng(11)
    mat = (rng.standard_normal((40, 3)) * 10).astype(np.float32)
    p = str(tmp_path / "c.htk")
    htk.write_htk_compressed(p, mat)
    with open(p, "rb") as f:
        data, hdr = htk.decode_htk(f.read())
    assert hdr["kind"] == "MFCC" and "C" in hdr["qualifiers"]
    assert hdr["n_samples"] == 40
    span = mat.max(axis=0) - mat.min(axis=0)
    assert np.abs(data - mat).max() <= (span / (2 * 32767)).max() * 1.01

    wav = np.array([[32767], [-32767], [0], [16384]], dtype=np.int16)
    buf = struct.pack(">iihh", 4, 625, 2, 0) + wav.astype(">i2").tobytes()
    data, hdr = htk.decode_htk(buf)
    assert hdr["kind"] == "WAVEFORM" and hdr["n_features"] == 1
    np.testing.assert_allclose(
        data.ravel(), wav.ravel() / 32767.0, rtol=1e-6)

    vq = struct.pack(">iihh", 1, 625, 4, 9 | 0o40000) + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        htk.decode_htk(vq)


def test_read_htk_distributed(rd, tmp_path):
    """read_htk fans out over files and emits per-frame rows with the
    utterance id taken from the filename."""
    from featureengineer_ray import htk

    rng = np.random.default_rng(3)
    mats = {"utt_a": rng.standard_normal((4, 3)).astype(np.float32),
            "utt_b": rng.standard_normal((2, 3)).astype(np.float32)}
    for name, m in mats.items():
        htk.write_htk(str(tmp_path / f"{name}.htk"), m)
    rows = htk.read_htk(str(tmp_path)).take_all()
    assert len(rows) == 6
    by_utt = {}
    for r in rows:
        by_utt.setdefault(r["utt"], {})[r["frame"]] = r["feat"]
    for name, m in mats.items():
        got = np.stack([by_utt[name][i] for i in range(m.shape[0])])
        assert np.array_equal(got.astype(np.float32), m)


def test_tfidf_top_term_matches_naive(rd):
    texts = ["apple banana apple cherry", "banana banana date",
             "cherry date egg egg egg", "apple egg"]
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": pa.array(texts)})
    got = {r["doc_id"]: (r["top_term"], r["tfidf"]) for r in
           text.tfidf_top_term(rd.from_arrow(t)).take_all()}
    import math
    from collections import Counter

    docs = [t.split() for t in texts]
    df = Counter(w for d in docs for w in set(d))
    for i, d in enumerate(docs):
        tf = Counter(d)
        scored = sorted(((-c * math.log(4 / df[w]), w) for w, c in
                         tf.items()))
        want_term = scored[0][1]
        want_val = round(-scored[0][0], 6)
        assert got[i][0] == want_term, (i, got[i], scored)
        assert got[i][1] == pytest.approx(want_val, abs=1e-9)


def test_tfidf_distributed_join_equals_broadcast(rd):
    """With the vocab cap forced to 0, tfidf_top_term takes the
    hash-joined distributed plan (no vocabulary-sized broadcast,
    VERDICT r2 #1) and must produce exactly the broadcast plan's
    result, ties included."""
    rng = np.random.default_rng(42)
    words = [f"w{i:03d}" for i in range(60)]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 25)))
             for _ in range(120)]
    t = pa.table({"doc_id": pa.array(range(120), type=pa.int64()),
                  "text": pa.array(texts)})
    b = text.tfidf_top_term(rd.from_arrow(t).repartition(5)).to_pandas()
    d = text.tfidf_top_term(rd.from_arrow(t).repartition(5),
                            max_broadcast_terms=0).to_pandas()
    b = b.sort_values("doc_id").reset_index(drop=True)
    d = d.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, d[b.columns])


def _naive_dup_ngram(texts, n=3):
    import re

    docs = [[w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for t in texts]
    grams = [[tuple(d[i:i + n]) for i in range(len(d) - n + 1)]
             for d in docs]
    from collections import defaultdict
    by_gram = defaultdict(set)
    for i, gs in enumerate(grams):
        for g in gs:
            by_gram[g].add(i)
    dup = {g for g, ds_ in by_gram.items() if len(ds_) >= 2}
    out = []
    for gs in grams:
        ng = len(gs)
        dg = sum(1 for g in gs if g in dup)
        out.append((ng, dg, dg / ng if ng else 0.0))
    return out


def test_dup_ngram_stats_matches_naive(rd):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a quick brown fox ran away from the lazy dog",   # shares grams
        "completely different words entirely here now",
        "the quick brown fox jumps again today",          # shares prefix
        "xy",                                             # < 3 words
        "",                                               # empty
    ]
    t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
                  "text": pa.array(texts)})
    got = {r["doc_id"]: r for r in text.dup_ngram_stats(
        rd.from_arrow(t).repartition(3)).take_all()}
    want = _naive_dup_ngram(texts)
    assert len(got) == len(texts)
    for i, (ng, dg, frac) in enumerate(want):
        r = got[f"d{i}"]
        assert r["n_grams"] == ng, (i, r)
        assert r["dup_grams"] == dg, (i, r)
        assert r["dup_frac"] == pytest.approx(frac, abs=1e-12)


def test_dup_ngram_distributed_equals_broadcast(rd):
    """With the broadcast cap forced to 0, dup_ngram_stats takes the
    hash-joined distributed plan (no gram-sized driver pull) and must
    equal the broadcast plan exactly."""
    rng = np.random.default_rng(7)
    words = [f"w{i:02d}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, 20)))
             for _ in range(150)]
    t = pa.table({"doc_id": pa.array(range(150), type=pa.int64()),
                  "text": pa.array(texts)})
    b = text.dup_ngram_stats(rd.from_arrow(t).repartition(5)).to_pandas()
    d = text.dup_ngram_stats(rd.from_arrow(t).repartition(5),
                             max_broadcast_grams=0).to_pandas()
    b = b.sort_values("doc_id").reset_index(drop=True)
    d = d.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, d[b.columns])


def test_doc_frequencies_counts_docs_not_occurrences(rd):
    texts = ["a a a b", "a c", "b b"]
    t = pa.table({"doc_id": pa.array(range(3), type=pa.int64()),
                  "text": pa.array(texts)})
    got = {r["term"]: r["df"] for r in
           text.doc_frequencies(rd.from_arrow(t)).take_all()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_contamination_ratio_planted(rd):
    bench = ["alpha beta gamma delta epsilon"]
    texts = ["alpha beta gamma something else entirely",  # partial overlap
             "alpha beta gamma delta epsilon",            # full overlap
             "zzzz completely disjoint shingle text",     # ~zero overlap
             "tiny"]                                      # < k chars: dropped
    t = pa.table({"doc_id": pa.array(range(4), type=pa.int64()),
                  "text": pa.array(texts)})
    out = {r["doc_id"]: r for r in text.contamination_ratio(
        rd.from_arrow(t), bench).take_all()}
    assert set(out) == {0, 1, 2}
    assert out[1]["contam_ratio"] == 1.0
    assert 0.0 < out[0]["contam_ratio"] < 1.0
    assert out[2]["contam_ratio"] < 0.1

    # exact parity with a naive python shingle-set computation
    bset = {bench[0][i:i + 5] for i in range(len(bench[0]) - 4)}
    for i in (0, 1, 2):
        sh = {texts[i][j:j + 5] for j in range(len(texts[i]) - 4)}
        assert out[i]["n_shingles"] == len(sh)
        assert out[i]["n_hit"] == len(sh & bset)


def test_curate_corpus_planted(rd):
    from featureengineer_ray.pipelines import curate_corpus

    bench = ["benchmark evaluation passage about held out questions "
             "and answers kept far away from training data"]
    good = ("a perfectly reasonable training document with plenty of "
            "normal words and sensible structure throughout the text")
    texts = [
        good,                                # kept
        good + " tail",                      # near-dup of 0 -> dropped
        "x y z",                             # fails quality -> dropped
        bench[0] + " slightly altered",      # contaminated -> dropped
        "another clean and useful document discussing entirely "
        "different topics with adequate length and variety here",  # kept
    ]
    t = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "text": pa.array(texts)})
    out = curate_corpus(rd.from_arrow(t), bench)
    kept = sorted(r["doc_id"] for r in out.take_all())
    assert kept == [0, 4]


def test_seeded_shuffle_deterministic_and_rechunk(rd):
    """O6: global shuffle + rechunk — same seed => identical order across
    independent executions; repartition preserves the multiset."""
    t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64)),
                  "v": pa.array(np.arange(5000, dtype=np.int64) * 7 % 101)})
    a = rd.from_arrow(t).random_shuffle(seed=42).to_pandas()
    b = rd.from_arrow(t).random_shuffle(seed=42).to_pandas()
    assert a["k"].tolist() == b["k"].tolist()
    assert sorted(a["k"].tolist()) == list(range(5000))
    c = rd.from_arrow(t).random_shuffle(seed=7).repartition(16).materialize()
    assert c.num_blocks() == 16
    assert sorted(r["k"] for r in c.take_all()) == list(range(5000))


def test_global_cumsum_exact_and_layout_independent(rd):
    """Distributed prefix scan matches numpy exactly regardless of input
    block layout; integer inputs stay int64-exact."""
    from featureengineer_ray import relational as rel

    n = 20000
    order = np.random.RandomState(3).permutation(n).astype(np.int64)
    vals = (np.arange(n, dtype=np.int64) * 13) % 997
    t = pa.table({"k": pa.array(order), "v": pa.array(vals[order])})
    expect = np.cumsum(vals)  # in k order, v was defined on sorted k
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        out = rel.global_cumsum(ds, "v", order_col="k",
                                target_rows_per_part=4000).to_pandas()
        out = out.sort_values("k").reset_index(drop=True)
        assert out["v_cumsum"].dtype.kind == "i"
        assert np.array_equal(out["v_cumsum"].to_numpy(), expect)


def test_exact_percentiles_matches_numpy_rank(rd):
    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(50, 20, 5000),
                           rng.exponential(100, 5000)])
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    out = relational.exact_percentiles(ds, "x", qs, n_parts=13).to_pandas()
    srt = np.sort(vals)
    want = [srt[int(np.ceil(q * len(vals))) - 1] for q in qs]
    assert list(out["q"]) == qs
    np.testing.assert_allclose(out["value"].to_numpy(), want, rtol=0)


def test_exact_percentiles_rejects_bad_q(rd):
    ds = rd.from_arrow(pa.table({"x": pa.array([1.0, 2.0])}))
    with pytest.raises(ValueError):
        relational.exact_percentiles(ds, "x", [0.0, 0.5])


def test_skew_join_matches_pandas_merge(rd):
    rng = np.random.default_rng(3)
    # Zipf-hot left: key 0 is ~40% of rows
    keys = np.where(rng.random(4000) < 0.4, 0,
                    rng.integers(1, 200, 4000))
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys.astype(np.int64)),
        "lv": pa.array(np.arange(4000, dtype=np.int64))}))
    right_df = pd.DataFrame({
        "rk": np.arange(0, 150, dtype=np.int64),
        "rv": np.arange(1000, 1150, dtype=np.int64)})
    right = rd.from_arrow(pa.Table.from_pandas(right_df))
    out = relational.skew_join(left, right, on="k", right_on="rk",
                               hot_row_threshold=50,
                               num_partitions=4).to_pandas()
    want = (pd.DataFrame({"k": keys.astype(np.int64),
                          "lv": np.arange(4000, dtype=np.int64)})
            .merge(right_df, left_on="k", right_on="rk")
            .drop(columns=["rk"]))
    got = out.sort_values("lv").reset_index(drop=True)
    want = want.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "lv", "rv"]], want[["k", "lv", "rv"]],
        check_dtype=False)


def test_skew_join_hot_key_detection_is_proportional(rd):
    """Per-row sampling: a hot key must be detected at realistic sample
    rates, and a moderate key's estimate must be ~its true count.
    Per-key-VALUE sampling (ADVICE r3) missed the hot key with
    probability 1-sample_rate and inflated sampled keys 1/sample_rate×.
    """
    rng = np.random.default_rng(7)
    # key 0: 8000 rows (hot); keys 1..199: ~60 rows each (moderate)
    keys = np.concatenate([
        np.zeros(8000, dtype=np.int64),
        rng.integers(1, 200, 12000).astype(np.int64)])
    left = rd.from_arrow(pa.table({"k": pa.array(keys)}))
    hot = relational._estimate_hot_keys(
        left, "k", sample_rate=0.02, hot_row_threshold=1000,
        num_partitions=4)
    assert 0 in set(hot.tolist())          # the hot key IS detected
    # no moderate key (true count ~60) is inflated past the 1000 bar
    assert set(hot.tolist()) == {0}


def test_skew_join_no_hot_keys_falls_back_to_hash_join(rd):
    left = rd.from_items([{"k": i, "lv": i * 2} for i in range(100)])
    right = rd.from_items([{"rk": i, "rv": i + 500} for i in range(0, 100, 2)])
    out = relational.skew_join(left, right, on="k", right_on="rk",
                               hot_row_threshold=10**9, sample_rate=1.0,
                               num_partitions=4).to_pandas()
    assert len(out) == 50
    assert (out.sort_values("k")["rv"].to_numpy()
            == np.arange(0, 100, 2) + 500).all()


def test_replicate_join_matches_pandas_merge(rd):
    rng = np.random.default_rng(11)
    lk = np.where(rng.random(3000) < 0.5, 7, rng.integers(0, 50, 3000))
    rk = np.where(rng.random(500) < 0.5, 7, rng.integers(0, 50, 500))
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk.astype(np.int64)),
        "lv": pa.array(np.arange(3000, dtype=np.int64))}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rk.astype(np.int64)),
        "rv": pa.array(np.arange(500, dtype=np.int64))}))
    out = relational.replicate_join(left, right, on="k", right_on="rk",
                                    replicate=4,
                                    num_partitions=4).to_pandas()
    want = (pd.DataFrame({"k": lk.astype(np.int64),
                          "lv": np.arange(3000, dtype=np.int64)})
            .merge(pd.DataFrame({"rk": rk.astype(np.int64),
                                 "rv": np.arange(500, dtype=np.int64)}),
                   left_on="k", right_on="rk"))
    assert len(out) == len(want)
    got = out.sort_values(["lv", "rv"]).reset_index(drop=True)
    want = want.sort_values(["lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]],
                                  want[["k", "lv", "rv"]],
                                  check_dtype=False)


def test_bloom_prefilter_keeps_all_matches_few_fps(rd):
    big = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(50_000, dtype=np.int64)),
    }))
    keys = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(0, 50_000, 100, dtype=np.int64)),
    }))
    out = relational.bloom_prefilter(big, keys, on="k",
                                     keys_on="id").to_pandas()
    got = set(out["k"])
    true = set(range(0, 50_000, 100))
    assert true <= got                       # no false negatives, ever
    fp = len(got - true) / 50_000
    assert fp < 0.01                         # ~0.24% expected at 16 b/key


def test_validate_rules_all_kinds(rd):
    from featureengineer_ray.validate import validate_rules

    t = pa.table({
        "id": pa.array([1, 2, 2, 3, None], type=pa.int64()),
        "v": pa.array([5.0, -1.0, 200.0, 50.0, 10.0]),
        "s": pa.array(["ab", "cd", "zz", None, "ab12"]),
    })
    out = validate_rules(rd.from_arrow(t), [
        ("not_null", "id"),
        ("between", "v", 0.0, 100.0),
        ("in_set", "s", ["ab", "cd"]),
        ("matches", "s", "[a-z]+"),
        ("unique", "id"),
    ]).to_pandas()
    assert list(out["violations"]) == [1, 2, 2, 1, 1]


def test_validate_rules_unique_across_batches(rd):
    from featureengineer_ray.validate import validate_rules

    # same value in different blocks must still count as a duplicate
    ds = rd.from_items([{"k": i % 10} for i in range(100)],
                       override_num_blocks=8)
    out = validate_rules(ds, [("unique", "k")]).to_pandas()
    assert out["violations"][0] == 90


def test_exact_percentiles_duplicate_heavy(rd):
    # one value is 60% of rows — the duplicate run lands in one range;
    # selection must stay exact (documented skew limit: large range, not
    # wrong answer)
    vals = np.concatenate([np.full(6000, 42.0),
                           np.linspace(0, 100, 4000)])
    rng = np.random.default_rng(0)
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    out = relational.exact_percentiles(ds, "x", [0.5, 0.95],
                                       n_parts=7).to_pandas()
    srt = np.sort(vals)
    want = [srt[int(np.ceil(q * len(vals))) - 1] for q in (0.5, 0.95)]
    np.testing.assert_allclose(out["value"].to_numpy(), want, rtol=0)


def test_skew_join_empty_right(rd):
    left = rd.from_items([{"k": i % 3, "lv": i} for i in range(50)])
    right = rd.from_arrow(pa.table({
        "rk": pa.array([], type=pa.int64()),
        "rv": pa.array([], type=pa.int64())}))
    out = relational.skew_join(left, right, on="k", right_on="rk",
                               hot_row_threshold=5, sample_rate=1.0,
                               num_partitions=2).to_pandas()
    assert len(out) == 0


def test_bloom_prefilter_empty_keys(rd):
    big = rd.from_items([{"k": i} for i in range(100)])
    keys = rd.from_arrow(pa.table({"id": pa.array([], type=pa.int64())}))
    out = relational.bloom_prefilter(big, keys, on="k",
                                     keys_on="id").to_pandas()
    assert len(out) == 0


def test_small_file_consolidation_roundtrip(rd, tmp_path):
    # S6: many small files -> few big files, content multiset preserved
    import os

    import pyarrow.parquet as pq

    small = tmp_path / "small"
    small.mkdir()
    for i in range(32):
        pq.write_table(pa.table({"x": pa.array(
            np.arange(i * 100, (i + 1) * 100, dtype=np.int64))}),
            small / f"f{i:03d}.parquet")
    out = tmp_path / "big"
    rd.read_parquet(str(small)).repartition(4).write_parquet(str(out))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) <= 8                      # consolidated
    back = rd.read_parquet(str(out)).to_pandas()["x"]
    assert sorted(back) == list(range(3200))    # nothing lost or duplicated


def test_shuffle_rechunk_rowset_invariant_and_seeded(rd):
    """O6: seeded random_shuffle + re-chunk. (a) the row multiset is
    invariant across block layouts; (b) a fixed seed at a fixed layout
    is deterministic."""
    tbl = pa.table({"id": pa.array(np.arange(5000, dtype=np.int64)),
                    "v": pa.array(np.arange(5000, dtype=np.int64) * 3)})

    def run(n_blocks):
        ds = rd.from_arrow(tbl).repartition(n_blocks)
        return ds.random_shuffle(seed=7).repartition(8).to_pandas()

    a, b = run(4), run(16)
    # fixed seed + fixed layout → identical permutation
    pd.testing.assert_frame_equal(run(4), a)
    # row multiset invariant across layouts (permutation may differ)
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True))
    assert list(a.sort_values("id")["id"]) == list(range(5000))


def test_embedding_neardup_hyperplanes_cached_deterministic():
    from featureengineer_ray.dedup import _hyperplanes

    p1 = _hyperplanes(3, 16, 8)
    p2 = _hyperplanes(3, 16, 8)
    assert p1 is p2  # cached per process, not regenerated per call
    assert p1.shape == (16, 8)
    assert np.allclose(p1, np.random.default_rng(3).standard_normal((16, 8)))


def test_bmp_roundtrip_and_oracle_mean():
    """Pure-numpy BMP codec: encode → decode is identity for arbitrary
    grayscale images incl. non-4-byte-aligned widths (padding path) and
    1-pixel edges; the synthetic image's mean matches its closed form."""
    rng = np.random.default_rng(3)
    for h, w in [(30, 30), (7, 5), (1, 1), (16, 31), (3, 4)]:
        img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        back = multimodal.decode_bmp(multimodal.encode_bmp(img))
        np.testing.assert_array_equal(back, img)
    # closed-form mean the SQL oracle recomputes
    for mid in (0, 7, 12345):
        img = multimodal.synthetic_image(mid)
        i = np.arange(900)
        exp = (((3 * (i // 30) + 7 * (i % 30) + 11 * mid) % 256)
               .astype(np.float64).mean())
        assert img.astype(np.float64).mean() == exp


def test_wav_roundtrip_and_chunk_walk():
    """Pure-numpy WAV codec: encode → decode is identity (samples and
    rate) for arbitrary int16 signals incl. empty and 1-sample clips;
    the chunk-walking parser survives an extra LIST chunk (with odd
    size, exercising word alignment) inserted between fmt and data."""
    import struct as _struct

    rng = np.random.default_rng(11)
    for n, sr in [(1000, 16000), (1, 8000), (0, 44100), (777, 22050)]:
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        back, got_sr = multimodal.decode_wav(multimodal.encode_wav(s, sr))
        np.testing.assert_array_equal(back, s)
        assert got_sr == sr
    # insert a foreign odd-sized chunk between fmt and data
    s = multimodal.synthetic_audio(5, n=50)
    raw = multimodal.encode_wav(s, 16000)
    extra = _struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\0"  # pad byte
    hacked = raw[:36] + extra + raw[36:]
    hacked = hacked[:4] + _struct.pack(
        "<I", len(hacked) - 8) + hacked[8:]
    back, got_sr = multimodal.decode_wav(hacked)
    np.testing.assert_array_equal(back, s)
    assert got_sr == 16000
    # closed-form stats the SQL oracle recomputes
    t = np.arange(1000, dtype=np.int64)
    for mid in (0, 3, 9999):
        v = ((13 * t + 17 * mid) % 4001) - 2000
        got = multimodal.synthetic_audio(mid).astype(np.int64)
        np.testing.assert_array_equal(got, v)


def test_audio_extractor_real_decode(rd):
    """AudioFeatureExtractor decodes genuine WAV bytes through the
    actor-pool pipeline; features match the closed-form signal."""
    import ray.data as _rd

    docs = _rd.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(15, dtype=np.int64))}))
    out = multimodal.wav_decode_pipeline(docs, concurrency=(1, 2)
                                         ).to_pandas()
    assert len(out) == 15
    assert (out["n_samples"] == 1000).all()
    assert (out["sample_rate"] == 16000).all()
    t = np.arange(1000, dtype=np.int64)
    for _, row in out.head(5).iterrows():
        v = ((13 * t + 17 * int(row["media_id"])) % 4001) - 2000
        assert row["amp_mean"] == pytest.approx(v.mean(), abs=1e-9)
        assert row["amp_rms"] == pytest.approx(
            np.sqrt((v * v).mean()), abs=1e-9)
        assert row["n_zero_cross"] == int(
            np.count_nonzero(v[:-1] * v[1:] < 0))


def test_media_extractor_real_decode(rd):
    """MediaFeatureExtractor with use_stub_decode=False decodes genuine
    BMP bytes through the actor-pool pipeline (the NotImplementedError
    now covers only compressed formats)."""
    import ray.data as _rd

    docs = _rd.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(20, dtype=np.int64))}))
    out = multimodal.bmp_decode_pipeline(docs, concurrency=(1, 2)
                                         ).to_pandas()
    assert len(out) == 20
    assert (out["height"] == 30).all() and (out["width"] == 30).all()
    i = np.arange(900)
    for _, row in out.head(5).iterrows():
        exp = (((3 * (i // 30) + 7 * (i % 30) + 11 * row["media_id"])
                % 256).astype(np.float64).mean())
        assert row["px_mean"] == exp
    with pytest.raises(NotImplementedError):
        multimodal._decode_image(b"\x89PNG....")


def test_png_roundtrip_all_filters():
    """Pure-stdlib PNG codec: encode → decode is identity for random
    grayscale and RGB images of awkward sizes. The encoder cycles all
    five filter types (None/Sub/Up/Average/Paeth) per row, so the
    roundtrip exercises every un-filter path; _decode_image dispatches
    on the 8-byte signature."""
    rng = np.random.default_rng(31)
    for shape in [(1, 1), (5, 3), (24, 17, 3), (7, 1, 3), (3, 64)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        back = multimodal.decode_png(multimodal.encode_png(img))
        assert back.shape == img.shape and back.dtype == np.uint8
        np.testing.assert_array_equal(back, img)
    rgb = multimodal.synthetic_image_rgb(7)
    np.testing.assert_array_equal(
        multimodal._decode_image(multimodal.encode_png(rgb)), rgb)
    # closed-form pixel law the SQL oracle recomputes
    assert rgb[2, 3, 1] == (3 * 2 + 7 * 3 + 11 * 7 + 5 * 1) % 256
    with pytest.raises(ValueError):
        multimodal.decode_png(multimodal._PNG_SIG + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        # 16-bit depth is out of scope and must refuse, not misdecode
        import struct as _st
        ihdr = _st.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        multimodal.decode_png(
            multimodal._PNG_SIG + multimodal._png_chunk(b"IHDR", ihdr))


def test_png_decode_pipeline(rd):
    """Actor-pool PNG stage end to end: real encode → real decode →
    position-weighted checksum matches the closed-form recompute."""
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(12, dtype=np.int64))}))
    out = multimodal.png_decode_pipeline(docs, concurrency=(1, 2)
                                         ).to_pandas()
    assert len(out) == 12
    assert (out["height"] == 24).all() and (out["width"] == 17).all()
    assert (out["n_channels"] == 3).all()
    for _, row in out.head(4).iterrows():
        flat = multimodal.synthetic_image_rgb(
            int(row["media_id"])).reshape(-1).astype(np.int64)
        assert row["px_mean"] == flat.mean()
        assert row["px_wsum"] == int(
            (flat * (np.arange(len(flat)) + 1)).sum())


def test_y4m_roundtrip_and_parser_tolerance():
    """Pure-numpy Y4M codec: encode → decode is identity for arbitrary
    frame stacks; the tagged-header parser handles reordered/unknown
    header tokens and per-frame parameter strings; non-mono colorspaces
    raise NotImplementedError."""
    rng = np.random.default_rng(13)
    for n, h, w in [(5, 16, 16), (1, 7, 9), (0, 4, 4)]:
        clip = rng.integers(0, 256, size=(n, h, w)).astype(np.uint8)
        back, fps = multimodal.decode_y4m(multimodal.encode_y4m(clip))
        np.testing.assert_array_equal(back, clip)
        assert fps == (25, 1)
    # reordered header tokens + unknown X tag + per-frame params
    clip = multimodal.synthetic_video(3, n_frames=2, h=2, w=3)
    raw = (b"YUV4MPEG2 Cmono H2 XNONSTANDARD W3 F30:1\n"
           + b"FRAME Iparams\n" + clip[0].tobytes()
           + b"FRAME\n" + clip[1].tobytes())
    back, fps = multimodal.decode_y4m(raw)
    np.testing.assert_array_equal(back, clip)
    assert fps == (30, 1)
    with pytest.raises(NotImplementedError):
        multimodal.decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\n")
    with pytest.raises(ValueError):
        multimodal.decode_y4m(b"RIFF....")


def test_video_sampler_real_decode(rd):
    """VideoFrameSampler decodes genuine Y4M bytes through the
    actor-pool explode pipeline; sampled frame means match the
    closed-form pixels."""
    import ray.data as _rd

    docs = _rd.from_arrow(pa.table({"doc_id": pa.array(
        np.arange(10, dtype=np.int64))}))
    out = multimodal.y4m_decode_pipeline(docs, stride=4,
                                         concurrency=(1, 2)).to_pandas()
    # 12 frames, stride 4 → frames 0, 4, 8 per clip
    assert len(out) == 30
    assert sorted(out["frame_idx"].unique()) == [0, 4, 8]
    assert (out["n_frames"] == 12).all()
    assert (out["height"] == 16).all() and (out["width"] == 16).all()
    y = np.arange(16)[:, None]
    x = np.arange(16)[None, :]
    for _, row in out.head(6).iterrows():
        exp = ((5 * row["frame_idx"] + 3 * y + 7 * x
                + 11 * row["media_id"]) % 256).astype(np.float64).mean()
        assert row["frame_mean"] == exp  # power-of-two mean: exact


def _naive_ngram_jaccard(texts, n=3, max_df=5, threshold=0.6):
    import re
    from collections import defaultdict

    sets = []
    for t in texts:
        ws = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        sets.append({tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)})
    df = defaultdict(set)
    for i, s in enumerate(sets):
        for g in s:
            df[g].add(i)
    cand = set()
    for g, docs_ in df.items():
        if 2 <= len(docs_) <= max_df:
            docs_ = sorted(docs_)
            for ai in range(len(docs_)):
                for bi in range(ai + 1, len(docs_)):
                    cand.add((docs_[ai], docs_[bi]))
    out = []
    for a, b in sorted(cand):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = 1.0 if union == 0 else inter / union
        if j >= threshold:
            out.append((a, b, j))
    return out


def test_ngram_jaccard_pairs_matches_naive(rd):
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",  # near-dup
        "completely different words entirely here now folks",
        "completely different words entirely here now friends",  # near-dup
        "the quick brown fox jumps over the lazy dog today",     # exact dup
        "nothing in common with anything else at all",
        "short one",
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    got = dd.ngram_jaccard_pairs(
        rd.from_arrow(t).repartition(3), id_col="doc_id",
        text_col="text", n=3, max_df=5, threshold=0.6)
    want = _naive_ngram_jaccard(texts)
    got_t = [(int(r.id_a), int(r.id_b), r.jaccard)
             for r in got.itertuples()]
    assert len(got_t) == len(want)
    for (ga, gb, gj), (wa, wb, wj) in zip(sorted(got_t), want):
        assert (ga, gb) == (wa, wb)
        assert gj == pytest.approx(wj, abs=1e-12)


def test_rare_gram_candidates_excludes_common_grams(rd):
    """A gram shared by MORE than max_df docs pairs nothing (the
    discriminative-shingle rule), while rare shared grams do."""
    common = "alpha beta gamma delta"
    texts = [f"{common} unique{i} extra{i} tail{i}" for i in range(8)]
    texts += ["rare pair shingle one x y", "rare pair shingle two x y"]
    t = pa.table({"doc_id": pa.array(range(10), type=pa.int64()),
                  "text": pa.array(texts)})
    cand = dd.rare_gram_candidate_pairs(
        rd.from_arrow(t).repartition(2), id_col="doc_id",
        text_col="text", n=3, max_df=5)
    pairs = {(int(r.id_a), int(r.id_b)) for r in cand.itertuples()}
    assert (8, 9) in pairs
    # the 8 common-gram docs share only grams with df=8 > max_df
    assert not any(a < 8 and b < 8 for a, b in pairs)


def _naive_components(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen, comp = {}, {}
    for start in sorted(adj):
        if start in seen:
            continue
        stack, members = [start], []
        seen[start] = True
        while stack:
            v = stack.pop()
            members.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen[w] = True
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return comp


def test_connected_components_matches_bfs(rd):
    """Random sparse graph (multiple components, dup edges, both
    orders) — distributed min-label propagation must equal BFS."""
    rng = np.random.default_rng(17)
    nodes = rng.choice(5000, size=120, replace=False).astype(np.int64)
    pairs = []
    for _ in range(90):
        a, b = rng.choice(nodes, size=2, replace=False)
        pairs.append((int(a), int(b)))
    pairs += [(b, a) for a, b in pairs[:10]]  # reversed dups
    t = pa.table({"id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
                  "id_b": pa.array([p[1] for p in pairs], type=pa.int64())})
    got = dd.connected_components(
        rd.from_arrow(t).repartition(4)).to_pandas()
    want = _naive_components(pairs)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[int(r.node)] == int(r.label), r


def test_connected_components_long_chain(rd):
    """A 12-node path graph has diameter 11 — forces many propagation
    rounds; every node must still converge to component 0."""
    a = np.arange(11, dtype=np.int64)
    t = pa.table({"id_a": pa.array(a), "id_b": pa.array(a + 1)})
    got = dd.connected_components(
        rd.from_arrow(t).repartition(3)).to_pandas()
    assert len(got) == 12
    assert (got["label"] == 0).all()


def test_connected_components_empty(rd):
    t = pa.table({"id_a": pa.array([], type=pa.int64()),
                  "id_b": pa.array([], type=pa.int64())})
    got = dd.connected_components(rd.from_arrow(t)).to_pandas()
    assert len(got) == 0


def test_weighted_sample_matches_naive(rd):
    """Priority-sampling query kernel: top-5 per source by
    weight/u(doc_id-hash) must equal a pandas recompute of the same
    closed-form priorities, independent of partitioning."""
    from featureengineer_ray import queries as Q

    rng = np.random.default_rng(23)
    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array([f"s{i % 4}" for i in range(n)]),
        "n_chars": pa.array(rng.integers(1, 5000, size=n),
                            type=pa.int64()),
    })

    def pri(batch):
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = Q._knuth_bucket(ids, 1 << 32, salt=13).astype(np.float64)
        u = (h + 0.5) / float(1 << 32)
        w = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.float64)
        return batch.append_column(
            "__pri", pa.array(w / u, type=pa.float64()))

    from featureengineer_ray import relational as R
    got = R.grouped_top_k(
        rd.from_arrow(t).repartition(5).map_batches(
            pri, batch_format="pyarrow"),
        ["source"], 5, by=["__pri", "doc_id"],
        descending=[True, False]).to_pandas()

    df = t.to_pandas()
    h = Q._knuth_bucket(df["doc_id"].to_numpy(), 1 << 32,
                        salt=13).astype(np.float64)
    df["pri"] = df["n_chars"].astype(np.float64) / ((h + 0.5)
                                                    / float(1 << 32))
    want = (df.sort_values(["pri", "doc_id"], ascending=[False, True])
            .groupby("source").head(5))
    assert len(got) == len(want) == 20
    gs = set(map(tuple, got[["source", "doc_id"]].itertuples(index=False)))
    ws = set(map(tuple, want[["source", "doc_id"]].itertuples(index=False)))
    assert gs == ws


def _naive_unigram_logprob(texts, stopwords):
    import math
    from collections import Counter

    all_words = [w for t in texts for w in t.split(" ")]
    c = Counter(all_words)
    total = float(len(all_words))
    out = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        lp = sum(math.log(c[w] / total) for w in ws) / len(ws)
        sr = sum(1.0 for w in ws if w in stopwords) / len(ws)
        out[i] = (len(ws), round(lp, 6), round(sr, 6))
    return out


@pytest.mark.parametrize("max_bcast", [2_000_000, 1])
def test_unigram_logprob_both_plans(rd, max_bcast):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a completely different document with rare words",
        "the the the the repeated boilerplate the the",
        "x",
        "",  # empty text → one empty token, still scored
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    got = text.unigram_logprob(
        rd.from_arrow(t).repartition(3),
        max_broadcast_terms=max_bcast).to_pandas()
    want = _naive_unigram_logprob(texts, set(text.STOPWORDS_EN))
    assert len(got) == len(texts)
    for r in got.itertuples():
        nw, lp, sr = want[int(r.doc_id)]
        assert int(r.n_words) == nw
        assert r.logprob == pytest.approx(lp, abs=1e-9)
        assert r.stop_ratio == pytest.approx(sr, abs=1e-9)


def test_gif_roundtrip_lzw_widths():
    """Round-trips crossing every LZW code width (9-12 bits), the
    overflow CLEAR, and the KwKwK self-referential case."""
    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, (3, 2), dtype=np.uint8),
        multimodal.synthetic_image_gray(5, 24, 17),
        np.full((40, 40), 129, dtype=np.uint8),          # KwKwK chains
        rng.integers(0, 256, (64, 64), dtype=np.uint8),  # 10/11-bit
        rng.integers(0, 256, (128, 128), dtype=np.uint8),  # 12-bit+CLEAR
        np.array([[200]], dtype=np.uint8),
        (np.add.outer(np.arange(90), np.arange(201)) % 256
         ).astype(np.uint8),
    ]
    for img in cases:
        dec = multimodal.decode_gif(multimodal.encode_gif(img))
        assert dec.shape == (*img.shape, 3)
        assert (dec == img[:, :, None]).all()


def test_gif_decode_pipeline(rd):
    t = pa.table({"doc_id": pa.array([0, 3, 11], type=pa.int64())})
    out = multimodal.gif_decode_pipeline(
        rd.from_arrow(t), batch_size=2).to_pandas()
    assert len(out) == 3
    for r in out.itertuples():
        img = multimodal.synthetic_image_gray(int(r.media_id), 24, 17)
        flat = np.repeat(img.reshape(-1), 3).astype(np.int64)
        assert r.px_mean == pytest.approx(flat.mean())
        assert int(r.px_wsum) == int(
            (flat * (np.arange(len(flat)) + 1)).sum())
        assert (r.height, r.width, r.n_channels) == (24, 17, 3)


def test_mulaw_codec_properties():
    rng = np.random.default_rng(11)
    x = np.concatenate([
        np.arange(-32768, 32768, 97, dtype=np.int32),
        rng.integers(-32768, 32768, 500),
        np.array([0, -1, 1, 32767, -32768, 32635, -32635, 131, -131])],
    ).astype(np.int16)
    y = multimodal.mulaw_decode(multimodal.mulaw_encode(x))
    # error bounded by half the active segment's step (exp<=7 -> 1024/2)
    xc = np.clip(x, -32635, 32635).astype(np.int64)
    step = 8 * (2 ** (np.floor(np.log2(np.abs(xc) + 132)) - 7))
    assert (np.abs(y.astype(np.int64) - xc) <= step).all()
    # every code except 0x7F (minus zero, re-encoded as plus zero) is a
    # fixed point of encode(decode(.))
    codes = np.arange(256, dtype=np.uint8)
    rt = multimodal.mulaw_encode(multimodal.mulaw_decode(codes))
    assert (rt[codes != 0x7F] == codes[codes != 0x7F]).all()
    assert multimodal.mulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    # expansion is monotone over the negative-code and positive-code halves
    dec = multimodal.mulaw_decode(codes)
    assert (np.diff(dec[0x80:][::-1]) >= 0).all()   # positive half
    assert (np.diff(dec[:0x80][::-1]) <= 0).all()   # negative half


def test_mulaw_wav_roundtrip_and_pipeline(rd):
    codes = multimodal.synthetic_mulaw_codes(3, 1000)
    payload = multimodal.encode_wav_mulaw(codes)
    s, sr = multimodal.decode_wav(payload)
    assert sr == 8000 and len(payload) == 1056
    assert (s == multimodal.mulaw_decode(codes)).all()
    t = pa.table({"doc_id": pa.array([0, 3], type=pa.int64())})
    out = multimodal.mulaw_decode_pipeline(rd.from_arrow(t)).to_pandas()
    assert len(out) == 2
    for r in out.itertuples():
        v = multimodal.mulaw_decode(
            multimodal.synthetic_mulaw_codes(int(r.media_id), 1000)
        ).astype(np.float64)
        assert r.amp_mean == pytest.approx(v.mean())
        assert r.amp_rms == pytest.approx(np.sqrt((v * v).mean()))
        assert int(r.n_zero_cross) == int(np.sum(v[1:] * v[:-1] < 0))


def test_bm25_topk_matches_naive(rd):
    """Distributed BM25 == a driver-side reference implementation on a
    small corpus, including tie order and block-layout invariance."""
    import re

    from featureengineer_ray import text as T

    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(3, 30)))
            for _ in range(80)]
    ids = [f"d{i:03d}" for i in range(80)]
    query = ["alpha", "gamma", "zeta"]
    k1, b = 1.2, 0.75

    # naive reference
    toks = [re.findall(r"[a-z0-9]+", d.lower()) for d in docs]
    n_docs = len(docs)
    avgdl = sum(len(t) for t in toks) / n_docs
    scores = {}
    for i, tk in enumerate(toks):
        s, matched = 0.0, False
        for q in query:
            tf = tk.count(q)
            df = sum(1 for t2 in toks if q in t2)
            idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(tk) / avgdl))
            matched |= tf > 0
        if matched:
            scores[ids[i]] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})
    for parts in (1, 7):
        out = T.bm25_topk(rd.from_arrow(t).repartition(parts), query,
                          k1=k1, b=b, k=10).to_pandas()
        got = list(zip(out["doc_id"], out["bm25"]))
        assert [g[0] for g in got] == [w[0] for w in want]
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           atol=2e-6)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_many_matches_reference():
    from featureengineer_ray import dedup

    rng = np.random.default_rng(31)
    alpha = list("abcde")
    strs = ["".join(rng.choice(alpha, size=rng.integers(0, 12)))
            for _ in range(120)]
    a = np.array(strs[:60], dtype=object)
    b = np.array(strs[60:], dtype=object)
    got = dedup.levenshtein_many(a, b)
    want = np.array([_lev_ref(x, y) for x, y in zip(a, b)])
    assert (got == want).all()
    # unicode + empty edge cases
    a2 = np.array(["", "héllo", "abc", "ab"], dtype=object)
    b2 = np.array(["xy", "hello", "", "ba"], dtype=object)
    got2 = dedup.levenshtein_many(a2, b2)
    assert list(got2) == [2, 1, 3, 2]


def test_levenshtein_pairs_matches_bruteforce(rd):
    from featureengineer_ray import dedup

    rng = np.random.default_rng(37)
    alpha = list("abcd")
    n = 90
    blocks = rng.integers(0, 4, n)
    strs = ["".join(rng.choice(alpha, size=rng.integers(2, 9)))
            for _ in range(n)]
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "txt": pa.array(strs),
                  "blk": pa.array([f"b{x}" for x in blocks])})
    out = dedup.levenshtein_pairs(
        rd.from_arrow(t).repartition(4), key_col="k", text_col="txt",
        block_cols=["blk"], max_dist=2).to_pandas()
    got = set(zip(out["key_a"], out["key_b"], out["dist"]))
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if blocks[i] == blocks[j]:
                d = _lev_ref(strs[i], strs[j])
                if d <= 2:
                    want.add((i, j, d))
    assert got == want


def test_levenshtein_pairs_block_cap(rd):
    from featureengineer_ray import dedup

    t = pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                  "txt": pa.array(["x"] * 50),
                  "blk": pa.array(["same"] * 50)})
    ds = dedup.levenshtein_pairs(rd.from_arrow(t), key_col="k",
                                 text_col="txt", block_cols=["blk"],
                                 max_dist=1, max_block=10)
    with pytest.raises(Exception, match="max_block"):
        ds.materialize()


def test_orc_feather_roundtrip_distributed(rd, tmp_path):
    """formats.py sinks write one idempotent content-hashed file per
    block; readers fan out and reproduce the exact table, with column
    pruning."""
    from featureengineer_ray import formats

    rng = np.random.default_rng(41)
    t = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64)),
                  "v": pa.array(rng.standard_normal(1000)),
                  "s": pa.array([f"s{i%7}" for i in range(1000)])})
    ds = rd.from_arrow(t).repartition(4)

    orc_paths = formats.write_orc_dataset(ds, str(tmp_path / "orc"))
    assert len(orc_paths) >= 2  # one file per block
    back = formats.read_orc(orc_paths).to_pandas().sort_values("k")
    assert (back["k"].to_numpy() == np.arange(1000)).all()
    assert np.allclose(back["v"].to_numpy(), t.column("v").to_numpy())
    pruned = formats.read_orc(orc_paths, columns=["k"]).schema().names
    assert pruned == ["k"]
    # idempotent sink: second write of identical blocks adds no files
    again = formats.write_orc_dataset(rd.from_arrow(t).repartition(4),
                                      str(tmp_path / "orc"))
    assert sorted(again) == sorted(orc_paths)

    fe_paths = formats.write_feather_dataset(ds, str(tmp_path / "fe"))
    back2 = formats.read_feather(fe_paths).to_pandas().sort_values("k")
    assert (back2["k"].to_numpy() == np.arange(1000)).all()
    assert list(back2["s"]) == [f"s{i%7}" for i in range(1000)]


def test_chunk_documents_matches_naive(rd):
    """Vectorized chunk explode == a per-doc Python reference, incl.
    short docs (one chunk), stride boundaries, and empty docs."""
    import re

    from featureengineer_ray import text as T

    rng = np.random.default_rng(43)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [" ".join(rng.choice(vocab, size=n))
            for n in [0, 1, 23, 24, 25, 32, 33, 70, 100]]
    ids = [f"d{i}" for i in range(len(docs))]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(docs)})
    out = T.chunk_documents(rd.from_arrow(t).repartition(3),
                            chunk_words=32, stride=24).to_pandas()
    got = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_words)
           for r in out.itertuples()}

    want = {}
    for i, d in enumerate(docs):
        ws = re.findall(r"[a-z0-9]+", d.lower())
        for ci, s in enumerate(range(0, len(ws), 24)):
            ch = ws[s:s + 32]
            want[(ids[i], ci)] = (" ".join(ch), len(ch))
    assert got == want


def test_read_parquet_evolved_union_and_conflict(rd, tmp_path):
    import pyarrow.parquet as pq

    from featureengineer_ray import formats

    pq.write_table(pa.table({"a": pa.array([1, 2], type=pa.int64())}),
                   str(tmp_path / "v1.parquet"))
    pq.write_table(pa.table({"a": pa.array([3], type=pa.int64()),
                             "b": pa.array(["x"], type=pa.string())}),
                   str(tmp_path / "v2.parquet"))
    out = formats.read_parquet_evolved(str(tmp_path)).to_pandas()
    out = out.sort_values("a").reset_index(drop=True)
    assert list(out["a"]) == [1, 2, 3]
    assert out["b"].isna().tolist() == [True, True, False]
    # a type conflict raises on the driver, not silently casts
    pq.write_table(pa.table({"a": pa.array([1.5])}),
                   str(tmp_path / "v3.parquet"))
    with pytest.raises(TypeError, match="changes type"):
        formats.read_parquet_evolved(str(tmp_path))


def test_fbank_matches_per_frame_reference():
    """Vectorized strided fbank == an independent per-frame loop
    (window, rfft, filterbank, log applied one frame at a time)."""
    rng = np.random.default_rng(59)
    sr = 16000
    sig = (rng.standard_normal(4000) * 3000).astype(np.int16)
    got = multimodal.fbank(sig, sr, n_filters=20)

    frame_len = int(round(sr * 0.025))
    hop = int(round(sr * 0.010))
    n_fft = 512
    fb = multimodal.mel_filterbank(20, n_fft, sr)
    win = np.hamming(frame_len)
    x = sig.astype(np.float64)
    rows = []
    s = 0
    while s + frame_len <= len(x):
        fr = x[s:s + frame_len] * win
        p = np.abs(np.fft.rfft(fr, n=n_fft)) ** 2
        rows.append(np.log(p @ fb.T + 1e-10))
        s += hop
    want = np.vstack(rows)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # filterbank sanity: rows non-negative, each filter peaks at 1-ish
    assert (fb >= 0).all() and fb.max() <= 1.0 + 1e-12
    # too-short signal -> empty matrix, right width
    assert multimodal.fbank(sig[:10], sr).shape == (0, 20)


def test_fbank_pipeline_actor_pool(rd):
    t = pa.table({"doc_id": pa.array([0, 5], type=pa.int64())})
    out = multimodal.fbank_pipeline(rd.from_arrow(t), n=2000).to_pandas()
    assert len(out) == 2
    for r in out.itertuples():
        sig = multimodal.synthetic_audio(int(r.media_id), 2000)
        f = multimodal.fbank(sig.astype(np.float64), 16000)
        assert r.n_frames == f.shape[0]
        np.testing.assert_allclose(np.asarray(r.fbank_mean),
                                   f.mean(axis=0), rtol=1e-9)


def test_flac_roundtrip_all_subframe_types():
    """Bit-exact encode/decode across constant, verbatim (short),
    multi-frame, ramp (perfect prediction), and noisy signals; CRC
    corruption is detected, not returned as audio."""
    from featureengineer_ray import flac

    rng = np.random.default_rng(61)
    cases = [
        np.zeros(0, np.int16),
        np.array([7], np.int16),
        np.array([-5, 5], np.int16),
        np.full(4096, -123, np.int16),                    # constant
        np.arange(-2000, 2000, dtype=np.int16),           # ramp
        (rng.standard_normal(9000) * 3000).astype(np.int16),  # 3 frames
        np.array([32767, -32768, 0, -1, 1] * 100, np.int16),
    ]
    for s in cases:
        buf = flac.encode_flac(s, 8000)
        d, sr = flac.decode_flac(buf)
        assert sr == 8000 and len(d) == len(s) and (d == s).all()
    # flipping one payload byte must trip a CRC / parse error
    buf = bytearray(flac.encode_flac(cases[5], 8000))
    buf[len(buf) // 2] ^= 0x40
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(buf))


def test_flac_pipeline_actor_pool(rd):
    from featureengineer_ray import flac

    t = pa.table({"doc_id": pa.array([2, 9], type=pa.int64())})
    out = multimodal.flac_decode_pipeline(rd.from_arrow(t)).to_pandas()
    assert len(out) == 2
    for r in out.itertuples():
        sig = multimodal.synthetic_audio(int(r.media_id), 1000)
        s = sig.astype(np.int64)
        assert r.n_samples == 1000
        assert r.amp_mean == pytest.approx(s.mean())
        assert r.amp_rms == pytest.approx(np.sqrt((s * s).mean()))
        # the compressed payload is genuinely smaller than raw PCM16
        assert r.n_bytes < 2 * 1000
