"""quantile_treatment_effects (operators/experiment): exact type-1
quantile differences per variant. Pins: equality with numpy's
inverted_cdf on seeded data with heavy ties, a planted tail-only
effect that moves QTE(0.9) but not the median, the from_value_counts
finisher ≡ the raw-df wrapper, empty-group NULLs, and prob
validation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from ironman_medallion_lakehouse_spark.operators.experiment import (
    per_value_counts,
    qte_from_value_counts,
    quantile_treatment_effects,
)


def _df(spark, a_vals, b_vals):
    rows = [Row(g="a", v=float(x)) for x in a_vals] + [
        Row(g="b", v=float(x)) for x in b_vals
    ]
    return spark.createDataFrame(rows)


def test_matches_numpy_inverted_cdf_with_ties(spark):
    rng = np.random.default_rng(7)
    a = np.round(rng.gamma(2.0, 10.0, 400), 0)  # heavy ties at integer grid
    b = np.round(rng.gamma(2.0, 12.0, 350), 0)
    probs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {
        r.p: r
        for r in quantile_treatment_effects(
            _df(spark, a, b), "v", "g", "a", "b", probs
        ).collect()
    }
    assert len(got) == len(probs)
    for p in probs:
        qa = np.quantile(a, p, method="inverted_cdf")
        qb = np.quantile(b, p, method="inverted_cdf")
        r = got[round(p, 6)]
        assert r.q_a == pytest.approx(qa), f"q_a at {p}"
        assert r.q_b == pytest.approx(qb), f"q_b at {p}"
        assert r.qte == pytest.approx(round(qb - qa, 6))
        assert (r.n_a, r.n_b) == (400, 350)


def test_tail_only_effect_moves_p90_not_median(spark):
    """Variant b equals a except its top decile is doubled: QTE(0.5)
    stays 0, QTE(0.9) is large — the readout that motivates QTE over
    a single mean/rank statistic."""
    a = list(range(1, 101))
    b = [x if x <= 90 else x * 2 for x in a]
    got = {
        r.p: r
        for r in quantile_treatment_effects(
            _df(spark, a, b), "v", "g", "a", "b", [0.5, 0.95]
        ).collect()
    }
    assert got[0.5].qte == 0.0
    assert got[0.95].qte == pytest.approx(95.0)  # 190 - 95


def test_finisher_equals_wrapper_on_shared_frame(spark):
    df = _df(spark, [1, 2, 2, 3, 10], [2, 2, 4, 4, 20])
    pv = per_value_counts(df, "v", "g", "a", "b")
    via_pv = qte_from_value_counts(pv, [0.5, 0.75]).collect()
    direct = quantile_treatment_effects(df, "v", "g", "a", "b", [0.5, 0.75]).collect()
    assert [tuple(r) for r in via_pv] == [tuple(r) for r in direct]


def test_empty_group_yields_null_quantiles(spark):
    df = _df(spark, [1, 2, 3], []).filter("g = 'a' or v > 100")
    rows = quantile_treatment_effects(df, "v", "g", "a", "b", [0.5]).collect()
    assert len(rows) == 1
    assert rows[0].q_a == 2.0 and rows[0].q_b is None and rows[0].qte is None


def test_prob_validation(spark):
    df = _df(spark, [1.0], [2.0])
    with pytest.raises(ValueError, match=r"\(0, 1\]"):
        quantile_treatment_effects(df, "v", "g", "a", "b", [0.0, 0.5])
    with pytest.raises(ValueError, match=r"\(0, 1\]"):
        quantile_treatment_effects(df, "v", "g", "a", "b", [1.5])
    with pytest.raises(ValueError, match="distinct"):
        quantile_treatment_effects(df, "v", "g", "a", "b", [0.5, 0.5000001])
