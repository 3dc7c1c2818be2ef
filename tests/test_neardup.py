"""cosine_neardup_pairs: the blocked equi-join must find EXACTLY the
pairs the all-pairs scorer finds (recall 1 by the unit-coordinate
bound), and must plan as an equi-join, not a nested loop."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from ironman_medallion_lakehouse_spark.operators.similarity import (
    cosine_neardup_pairs,
)


def _corpus(n_base=40, n_dupes=15, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = list(base)
    # near-duplicates: tiny perturbations of existing vectors, spanning
    # both sides of the 0.99 threshold
    for i in range(n_dupes):
        eps = rng.normal(size=dim) * (0.02 + 0.12 * (i % 4))
        v = base[i % n_base] + eps
        vecs.append(v / np.linalg.norm(v))
    return np.stack(vecs)


def _true_pairs(M, threshold):
    sims = M @ M.T
    n = len(M)
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= threshold
    }


def test_blocked_pairs_match_brute_force(spark):
    M = _corpus()
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(M)]
    )
    for threshold in (0.99, 0.95):
        got = {
            (r.id_a, r.id_b)
            for r in cosine_neardup_pairs(df, threshold=threshold).collect()
        }
        expected = _true_pairs(M, threshold)
        assert got == expected, f"threshold {threshold}"
        assert len(expected) > 0  # the fixture actually exercises recall


def test_blocked_pairs_plan_is_equi_join(spark):
    M = _corpus(n_base=10, n_dupes=0)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(M)]
    )
    plan = cosine_neardup_pairs(df)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_threshold_one_and_zero_norm_vectors(spark):
    """threshold=1.0 (w=0 clamped) finds exact duplicates; a zero-norm
    vector (cosine undefined) yields no pairs instead of a crash."""
    M = _corpus(n_base=12, n_dupes=0)
    rows = [Row(vec_id=i, embedding=[float(x) for x in r]) for i, r in enumerate(M)]
    rows.append(Row(vec_id=100, embedding=[float(x) for x in M[0]]))  # exact dup of 0
    rows.append(Row(vec_id=101, embedding=[0.0] * M.shape[1]))  # zero norm
    df = spark.createDataFrame(rows)
    got = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(df, threshold=1.0).collect()}
    assert (0, 100) in got
    assert all(101 not in p for p in got)
