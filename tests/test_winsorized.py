"""winsorized_welch_t (operators/experiment): Welch's t on values
clipped at exact POOLED type-1 quantiles. Pins: equality with a
numpy/scipy replay (pooled inverted_cdf cuts → clip → Welch),
whale-order robustness (an outlier flips the raw t, barely moves the
winsorized one), the (0,1] identity degenerating to plain welch, the
finisher ≡ wrapper, and bound validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from ironman_medallion_lakehouse_spark.operators.experiment import (
    per_value_counts,
    welch_t_test,
    winsorized_welch_from_value_counts,
    winsorized_welch_t,
)


def _df(spark, a_vals, b_vals):
    rows = [Row(g="a", v=float(x)) for x in a_vals] + [
        Row(g="b", v=float(x)) for x in b_vals
    ]
    return spark.createDataFrame(rows)


def _replay(a, b, lower, upper):
    pooled = np.concatenate([a, b])
    lo = (
        np.quantile(pooled, lower, method="inverted_cdf")
        if lower > 0
        else pooled.min()
    )
    hi = np.quantile(pooled, upper, method="inverted_cdf")
    ca, cb = np.clip(a, lo, hi), np.clip(b, lo, hi)

    def welch(x, y):
        nx, ny = len(x), len(y)
        vx, vy = x.var(ddof=1), y.var(ddof=1)
        se2 = vx / nx + vy / ny
        t = (x.mean() - y.mean()) / np.sqrt(se2)
        dof = se2**2 / ((vx / nx) ** 2 / (nx - 1) + (vy / ny) ** 2 / (ny - 1))
        return t, dof

    t, dof = welch(ca, cb)
    return lo, hi, ca.mean(), cb.mean(), t, dof


def test_matches_numpy_replay(spark):
    rng = np.random.default_rng(11)
    a = np.round(rng.lognormal(3.0, 1.0, 300), 2)
    b = np.round(rng.lognormal(3.1, 1.0, 260), 2)
    got = winsorized_welch_t(
        _df(spark, a, b), "v", "g", "a", "b", lower=0.05, upper=0.95
    ).collect()[0]
    lo, hi, ma, mb, t, dof = _replay(a, b, 0.05, 0.95)
    assert got.cut_lo == pytest.approx(lo) and got.cut_hi == pytest.approx(hi)
    assert got.mean_a == pytest.approx(ma, abs=5e-6)
    assert got.mean_b == pytest.approx(mb, abs=5e-6)
    assert got.t_stat == pytest.approx(t, abs=5e-6)
    assert got.dof == pytest.approx(dof, rel=1e-5)
    assert (got.n_a, got.n_b) == (300, 260)


def test_whale_robustness(spark):
    """One whale order in variant b flips the raw welch sign; the
    winsorized t at p99 barely moves — the motivating scenario."""
    rng = np.random.default_rng(3)
    a = rng.normal(110.0, 10.0, 500).round(2)  # a genuinely higher
    b = rng.normal(100.0, 10.0, 500).round(2)
    b_whale = np.append(b, 1_000_000.0)
    raw = welch_t_test(_df(spark, a, b_whale), "v", "g", "a", "b").collect()[0]
    wins = winsorized_welch_t(
        _df(spark, a, b_whale), "v", "g", "a", "b", upper=0.99
    ).collect()[0]
    clean = welch_t_test(_df(spark, a, b), "v", "g", "a", "b").collect()[0]
    assert raw.t_stat < 0 < clean.t_stat  # the whale flipped the raw readout
    assert wins.t_stat > 0.8 * clean.t_stat  # winsorized stays near truth


def test_full_range_degenerates_to_plain_welch(spark):
    rng = np.random.default_rng(5)
    a = rng.normal(50, 5, 120).round(1)
    b = rng.normal(52, 5, 130).round(1)
    df = _df(spark, a, b)
    wins = winsorized_welch_t(df, "v", "g", "a", "b", lower=0.0, upper=1.0).collect()[0]
    plain = welch_t_test(df, "v", "g", "a", "b").collect()[0]
    assert wins.t_stat == plain.t_stat and wins.dof == plain.dof
    assert wins.cut_lo == float(a.min().min() if a.min() < b.min() else b.min())
    assert wins.cut_hi == float(max(a.max(), b.max()))


def test_finisher_equals_wrapper(spark):
    df = _df(spark, [1, 2, 2, 3, 100], [2, 3, 3, 4, 200])
    pv = per_value_counts(df, "v", "g", "a", "b")
    via = winsorized_welch_from_value_counts(pv, 0.0, 0.8).collect()
    direct = winsorized_welch_t(df, "v", "g", "a", "b", 0.0, 0.8).collect()
    assert [tuple(r) for r in via] == [tuple(r) for r in direct]


def test_bound_validation(spark):
    df = _df(spark, [1.0], [2.0])
    for lo, hi in ((-0.1, 0.9), (0.5, 0.5), (0.9, 0.2), (0.0, 1.1)):
        with pytest.raises(ValueError, match="lower < upper"):
            winsorized_welch_t(df, "v", "g", "a", "b", lo, hi)
