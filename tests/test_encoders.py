"""Encoder operators vs naive pandas/numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureengineer_ray import encoders


@pytest.fixture
def rd(ray_session):
    import ray.data

    return ray.data


def _frame(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "cat": rng.integers(0, 25, n).astype(np.int64),
        "y": np.round(rng.normal(10, 3, n), 4),
        "rid": np.arange(n, dtype=np.int64),
    })


def _naive_loo(df):
    g = df.groupby("cat")["y"]
    s = g.transform("sum")
    c = g.transform("count")
    te = (s - df["y"]) / (c - 1)
    return te.where(c > 1)


@pytest.mark.parametrize("max_broadcast", [2_000_000, 0])
def test_target_encode_loo_matches_naive(rd, max_broadcast):
    df = _frame()
    # add a singleton category to exercise the NULL branch
    df.loc[len(df)] = [999, 5.0, len(df)]
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.target_encode_loo(
        ds, cat_col="cat", target_col="y",
        max_broadcast=max_broadcast).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    exp = _naive_loo(df).reset_index(drop=True)
    got = out["y_te_loo"]
    assert got.isna().equals(exp.isna())
    np.testing.assert_allclose(got.dropna(), exp.dropna(), rtol=1e-12)
    # the singleton row is NULL
    assert out.loc[out["cat"] == 999, "y_te_loo"].isna().all()


def test_target_encode_smoothed_matches_naive(rd):
    df = _frame(seed=7)
    ds = rd.from_pandas(df).repartition(3)
    m = 5.0
    out = encoders.target_encode_smoothed(
        ds, cat_col="cat", target_col="y", m=m).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    gmean = df["y"].mean()
    stats = df.groupby("cat")["y"].agg(["sum", "count"])
    exp = df["cat"].map(
        (stats["sum"] + m * gmean) / (stats["count"] + m))
    np.testing.assert_allclose(out["y_te"], exp, rtol=1e-12)


@pytest.mark.parametrize("max_broadcast", [2_000_000, 0])
def test_count_encode_matches_naive(rd, max_broadcast):
    df = _frame(seed=13)
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.count_encode(
        ds, cat_col="cat", max_broadcast=max_broadcast).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    cnt = df.groupby("cat")["cat"].transform("count")
    np.testing.assert_array_equal(out["cat_count"], cnt)
    np.testing.assert_allclose(out["cat_freq"], cnt / len(df), rtol=0)


def test_minmax_scale_matches_naive(rd):
    df = _frame(seed=17)
    const = pd.DataFrame({"cat": [700] * 4, "y": [1.5] * 4,
                          "rid": np.arange(len(df), len(df) + 4)})
    df = pd.concat([df, const], ignore_index=True)
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.minmax_scale(ds, key="cat", value_col="y").to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    g = df.groupby("cat")["y"]
    mn, mx = g.transform("min"), g.transform("max")
    exp = ((df["y"] - mn) / (mx - mn)).where(mx > mn)
    got = out["y_minmax"]
    assert got.isna().equals(exp.isna())
    np.testing.assert_allclose(got.dropna(), exp.dropna(), rtol=1e-12)
    assert out.loc[out["cat"] == 700, "y_minmax"].isna().all()


def test_winsorize_matches_naive(rd):
    df = _frame(seed=19)
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.winsorize(
        ds, key="cat", value_col="y", p_lo=0.1, p_hi=0.9).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)

    def naive(sub):
        ql, qh = np.percentile(sub["y"], [10, 90])
        return sub["y"].clip(ql, qh)

    exp = df.groupby("cat", group_keys=False).apply(
        naive, include_groups=False).sort_index()
    np.testing.assert_allclose(out["y_wins"], exp, rtol=1e-12)


@pytest.mark.parametrize("max_broadcast", [2_000_000, 0])
def test_woe_encode_matches_naive(rd, max_broadcast):
    rng = np.random.default_rng(23)
    df = pd.DataFrame({"cat": rng.integers(0, 20, 500),
                       "y": rng.integers(0, 2, 500),
                       "rid": np.arange(500)})
    # a category with zero positives exercises the smoothing
    df.loc[df["cat"] == 3, "y"] = 0
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.woe_encode(
        ds, cat_col="cat", target_col="y",
        max_broadcast=max_broadcast).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    pos_t, neg_t = df["y"].sum(), (1 - df["y"]).sum()
    g = df.groupby("cat")["y"].agg(["sum", "count"])
    exp = df["cat"].map(
        np.log((g["sum"] + 0.5) / (g["count"] - g["sum"] + 0.5))
        - np.log((pos_t + 0.5) / (neg_t + 0.5)))
    np.testing.assert_allclose(out["y_woe"], exp, rtol=1e-12)
    assert np.isfinite(out["y_woe"]).all()


@pytest.mark.parametrize("max_broadcast", [2_000_000, 0])
def test_ordinal_encode_matches_dense_rank(rd, max_broadcast):
    rng = np.random.default_rng(29)
    df = pd.DataFrame({"cat": rng.integers(100, 160, 400),
                       "rid": np.arange(400)})
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.ordinal_encode(
        ds, cat_col="cat", max_broadcast=max_broadcast).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    exp = df["cat"].rank(method="dense").astype(np.int64)
    np.testing.assert_array_equal(out["cat_ord"], exp)


def test_robust_scale_matches_naive(rd):
    df = _frame(seed=11)
    # a constant group exercises the zero-IQR NULL branch
    const = pd.DataFrame({"cat": [500] * 6, "y": [2.5] * 6,
                          "rid": np.arange(len(df), len(df) + 6)})
    df = pd.concat([df, const], ignore_index=True)
    ds = rd.from_pandas(df).repartition(4)
    out = encoders.robust_scale(
        ds, key="cat", value_col="y").to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)

    def naive(sub):
        q25, q50, q75 = np.percentile(sub["y"], [25, 50, 75])
        iqr = q75 - q25
        if iqr == 0:
            return pd.Series(np.nan, index=sub.index)
        return (sub["y"] - q50) / iqr

    exp = df.groupby("cat", group_keys=False).apply(
        naive, include_groups=False).sort_index()
    got = out["y_robust"]
    assert got.isna().equals(exp.isna())
    np.testing.assert_allclose(got.dropna(), exp.dropna(), rtol=1e-12)
    assert out.loc[out["cat"] == 500, "y_robust"].isna().all()
