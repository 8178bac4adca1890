"""combine_sum: the 32-way distributed pre-fold that bounds the driver
pull of constant-width partial streams at O(32) rows (VERDICT r3 #2)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from featureengineer_ray.combine import COMBINE_WIDTH, combine_sum


def _mk_partials(n_rows: int, w: int, seed: int, integral: bool = False):
    rng = np.random.default_rng(seed)
    vals = rng.integers(-50, 50, size=(n_rows, w)).astype(np.float64) \
        if integral else rng.normal(size=(n_rows, w))
    llk = rng.integers(-9, 9, size=n_rows).astype(np.float64) \
        if integral else rng.normal(size=n_rows)
    n = rng.integers(1, 100, size=n_rows).astype(np.int64)
    offs = pa.array(np.arange(n_rows + 1, dtype=np.int32) * w)
    tbl = pa.table({
        "v": pa.ListArray.from_arrays(offs, pa.array(vals.reshape(-1))),
        "llk": pa.array(llk),
        "n": pa.array(n),
    })
    return tbl, vals, llk, n


def test_combine_sum_matches_numpy(ray_session):
    tbl, vals, llk, n = _mk_partials(200, 16, seed=3)
    out = combine_sum(rd.from_arrow(tbl), ["v", "llk", "n"],
                      zeros={"v": np.zeros(16), "llk": 0.0, "n": 0})
    np.testing.assert_allclose(out["v"], vals.sum(axis=0), rtol=1e-12)
    assert out["llk"] == pytest.approx(llk.sum(), rel=1e-12)
    assert out["n"] == int(n.sum())


def test_combine_sum_block_count_invariant(ray_session):
    """The SAME partial rows split into 1 vs many blocks must reduce to
    the SAME result (exactly, on integer-valued floats — every fold
    order is exact in f64): the driver pull is the ≤COMBINE_WIDTH folded
    rows either way, never one row per block."""
    tbl, vals, llk, n = _mk_partials(300, 8, seed=5, integral=True)
    zeros = {"v": np.zeros(8), "llk": 0.0, "n": 0}
    one = combine_sum(rd.from_arrow(tbl), ["v", "llk", "n"], zeros)
    many = combine_sum(rd.from_arrow(tbl).repartition(37),
                       ["v", "llk", "n"], zeros)
    np.testing.assert_array_equal(one["v"], many["v"])
    assert one["llk"] == many["llk"]
    assert one["n"] == many["n"]
    np.testing.assert_array_equal(one["v"], vals.sum(axis=0))


def test_combine_sum_deterministic_bits(ray_session):
    """Two runs over the same rows produce bit-identical float sums —
    rows are content-hash-sorted inside each part, so task arrival order
    cannot change the fold order (resume ≡ straight depends on this)."""
    tbl, *_ = _mk_partials(250, 12, seed=9)
    zeros = {"v": np.zeros(12), "llk": 0.0, "n": 0}
    a = combine_sum(rd.from_arrow(tbl).repartition(23), ["v", "llk", "n"],
                    zeros)
    b = combine_sum(rd.from_arrow(tbl).repartition(23), ["v", "llk", "n"],
                    zeros)
    assert a["v"].tobytes() == b["v"].tobytes()
    assert np.float64(a["llk"]).tobytes() == np.float64(b["llk"]).tobytes()


def test_combine_sum_empty_stream(ray_session):
    tbl, *_ = _mk_partials(0, 4, seed=1)
    out = combine_sum(rd.from_arrow(tbl), ["v", "llk", "n"],
                      zeros={"v": np.zeros(4), "llk": 0.0, "n": 0})
    np.testing.assert_array_equal(out["v"], np.zeros(4))
    assert out["llk"] == 0.0 and out["n"] == 0


def test_combine_width_is_constant():
    assert COMBINE_WIDTH == 32  # the documented driver-pull bound
