"""Sketch operators: HLL approximate distinct + certified heavy hitters."""

import numpy as np
import pyarrow as pa
import pytest

from featureengineer_ray import sketches
from featureengineer_ray.hashing import splitmix64


@pytest.fixture
def rd(ray_session):
    import ray.data as rd

    return rd


def test_bit_length_u64_exact():
    vals = np.array([1, 2, 3, 255, 256, (1 << 52) + 1, (1 << 63),
                     (1 << 64) - 1], dtype=np.uint64)
    got = sketches._bit_length_u64(vals)
    want = [int(v).bit_length() for v in vals.tolist()]
    assert got.tolist() == want


def test_hll_single_machine_error_bound():
    # 100k distinct uniform hashes at p=14 → expect ~0.8% std error
    h = splitmix64(np.arange(100_000, dtype=np.uint64))
    est = sketches.hll_estimate(sketches.hll_partial(h, p=14))
    assert abs(est - 100_000) / 100_000 < 0.03


def test_hll_merge_equals_union():
    a = splitmix64(np.arange(0, 60_000, dtype=np.uint64))
    b = splitmix64(np.arange(40_000, 100_000, dtype=np.uint64))
    merged = sketches.hll_merge(np.stack([
        sketches.hll_partial(a, p=14), sketches.hll_partial(b, p=14)]))
    whole = sketches.hll_partial(
        splitmix64(np.arange(100_000, dtype=np.uint64)), p=14)
    assert np.array_equal(merged, whole)


def test_approx_distinct_dataset(rd):
    n = 20_000
    g = np.repeat(["a", "b"], n // 2)
    # group a: 1000 distinct ids, group b: 5000 distinct ids
    v = np.where(g == "a", np.arange(n) % 1000, 100_000 + np.arange(n) % 5000)
    ds = rd.from_arrow(pa.table({"g": g, "v": v.astype(np.int64)}))
    ds = ds.repartition(8)
    out = {r["g"]: r["approx_n"]
           for r in sketches.approx_distinct(ds, ["g"], "v").take_all()}
    assert abs(out["a"] - 1000) / 1000 < 0.05
    assert abs(out["b"] - 5000) / 5000 < 0.05


def test_heavy_hitters_certified_exact(rd):
    # Zipf-ish counts over 5000 terms split into per-block partials
    rng_terms = [f"t{i:05d}" for i in range(5000)]
    counts = (100_000 // (np.arange(5000) + 1)).astype(np.int64) + 1
    tbl = pa.table({"term": rng_terms, "n": counts})
    # split every term's count across 4 fake blocks
    parts = []
    for _ in range(4):
        parts.append(pa.table({"term": rng_terms,
                               "n": np.maximum(counts // 4, 1)}))
    ds = rd.from_arrow(parts).repartition(4)
    top, certified = sketches.heavy_hitters(ds, 10, local_m=64)
    assert certified
    got = top.to_pandas().sort_values(["n", "term"],
                                      ascending=[False, True])
    # exact oracle: sum the same partials in pandas
    import pandas as pd

    exact = (pd.concat([p.to_pandas() for p in parts])
             .groupby("term")["n"].sum().reset_index()
             .sort_values(["n", "term"], ascending=[False, True])
             .head(10).reset_index(drop=True))
    assert got.reset_index(drop=True).equals(exact)


def test_heavy_hitters_uncertified_when_m_too_small(rd):
    # near-uniform counts and a tiny local_m → bound cannot certify
    terms = [f"u{i}" for i in range(1000)]
    ds = rd.from_arrow(pa.table(
        {"term": terms, "n": np.full(1000, 10, dtype=np.int64)}))
    ds = ds.repartition(4)
    _, certified = sketches.heavy_hitters(ds, 5, local_m=8)
    assert not certified


def test_knuth_bucket_matches_duckdb():
    import duckdb

    from featureengineer_ray.queries import _knuth_bucket, _sql_bucket

    ids = np.array([0, 1, 5, 999, 123456789, 2**40 + 17], dtype=np.int64)
    ours = _knuth_bucket(ids, 1000, salt=7)
    con = duckdb.connect()
    expr = _sql_bucket("x", 1000, salt=7)
    theirs = con.sql(
        "SELECT " + expr + " AS b FROM (SELECT unnest(?) AS x)",
        params=[ids.tolist()]).df()["b"].to_numpy()
    assert np.array_equal(ours, theirs.astype(np.int64))


def test_quantile_sketch_rank_error_bound():
    from featureengineer_ray.sketches import QuantileSketch

    rng = np.random.default_rng(5)
    vals = rng.exponential(100, 200_000)
    s = QuantileSketch(k=1024)
    for chunk in np.array_split(vals, 37):
        s.add(chunk)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = s.quantiles(qs)
    srt = np.sort(vals)
    n = len(vals)
    for q, g in zip(qs, got):
        # rank of returned value must be within 2% of the target rank
        r = np.searchsorted(srt, g, side="right")
        assert abs(r - q * n) <= 0.02 * n, (q, r / n)


def test_quantile_sketch_merge_equals_single():
    from featureengineer_ray.sketches import QuantileSketch

    rng = np.random.default_rng(9)
    a, b = rng.normal(0, 1, 50_000), rng.normal(5, 2, 50_000)
    sa, sb = QuantileSketch(512), QuantileSketch(512)
    sa.add(a)
    sb.add(b)
    sa.merge(sb)
    whole = np.sort(np.concatenate([a, b]))
    got = sa.quantiles([0.5])
    r = np.searchsorted(whole, got[0], side="right")
    assert abs(r - 0.5 * len(whole)) <= 0.03 * len(whole)


def test_quantile_sketch_serialize_roundtrip():
    from featureengineer_ray.sketches import QuantileSketch

    s = QuantileSketch(64)
    s.add(np.arange(10_000, dtype=np.float64))
    s2 = QuantileSketch.deserialize(s.serialize())
    np.testing.assert_array_equal(
        s.quantiles([0.1, 0.9]), s2.quantiles([0.1, 0.9]))


def test_approx_quantiles_dataset(ray_session):
    import ray.data as rd

    from featureengineer_ray.sketches import approx_quantiles

    vals = np.random.default_rng(2).uniform(0, 1000, 100_000)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    out = approx_quantiles(ds, "x", [0.5, 0.9], k=1024).to_pandas()
    srt = np.sort(vals)
    for q, v in zip(out["q"], out["value"]):
        r = np.searchsorted(srt, v, side="right")
        assert abs(r - q * len(vals)) <= 0.02 * len(vals)


def test_cms_never_undercounts_and_bounds(rd):
    """Count-Min: est >= true always; overcount bounded; exact when the
    width kills collisions; merge is block-layout invariant."""
    import pandas as pd

    from featureengineer_ray import sketches
    from featureengineer_ray.hashing import hash_str_array

    rng = np.random.default_rng(47)
    vocab = [f"t{i:04d}" for i in range(300)]
    freq = rng.zipf(1.5, 20000) % 300
    vals = np.array(vocab, dtype=object)[freq]
    t = pa.table({"v": pa.array(list(vals), type=pa.string())})
    true = pd.Series(vals).value_counts()

    depth, width = 4, 256  # narrow -> collisions guaranteed
    c1 = sketches.cms_count(rd.from_arrow(t).repartition(3), "v",
                            depth=depth, width=width)
    c2 = sketches.cms_count(rd.from_arrow(t).repartition(11), "v",
                            depth=depth, width=width)
    assert (c1 == c2).all()  # exact int merge: layout invariant
    qs = np.array(sorted(true.index), dtype=object)
    est = sketches.cms_estimate(c1, hash_str_array(qs), depth, width)
    tv = true.loc[qs].to_numpy()
    assert (est >= tv).all()  # never undercounts
    # standard eps = e/width bound (holds deterministically here)
    assert (est - tv).max() <= int(np.ceil(np.e * len(vals) / width))
    # wide sketch: no collisions -> exact
    cw = sketches.cms_count(rd.from_arrow(t), "v", depth=4, width=65536)
    estw = sketches.cms_estimate(cw, hash_str_array(qs), 4, 65536)
    assert (estw == tv).all()
