"""Connected components + dedup grouping (operators/graph.py).

connected_components is a hybrid (r5): driver union-find below
``small_graph_threshold`` edges, star contraction above. The
structural tests pin ``small_graph_threshold=0`` so they exercise the
DISTRIBUTED path (the default gate would route these tiny fixtures to
the driver); dedicated tests cover the driver path and prove the two
paths agree."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from ironman_medallion_lakehouse_spark.operators.graph import (
    connected_components,
    dedup_groups_from_pairs,
)


def _pairs(spark, edges):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])


def test_chain_converges_across_diameter(spark):
    """Min label must cross a diameter-4 chain — multiple propagation
    rounds, transitivity beyond any directly-scored pair."""
    comp = connected_components(
        _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]), small_graph_threshold=0
    )
    assert {(r.node, r.component) for r in comp.collect()} == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1)
    }


def test_multiple_components_and_edge_direction(spark):
    """Components stay separate; undirected semantics — the min id
    propagates regardless of which pair side it appears on."""
    comp = connected_components(
        _pairs(spark, [(7, 2), (2, 9), (11, 10)]), small_graph_threshold=0
    )
    got = {(r.node, r.component) for r in comp.collect()}
    assert got == {(7, 2), (2, 2), (9, 2), (11, 10), (10, 10)}


def test_driver_path_same_labels(spark):
    """The union-find branch (default gate) must produce the identical
    labeling contract."""
    comp = connected_components(_pairs(spark, [(7, 2), (2, 9), (11, 10)]))
    got = {(r.node, r.component) for r in comp.collect()}
    assert got == {(7, 2), (2, 2), (9, 2), (11, 10), (10, 10)}


def test_driver_and_distributed_paths_agree_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    p = _pairs(spark, edges)
    local = {(r.node, r.component) for r in connected_components(p).collect()}
    dist = {
        (r.node, r.component)
        for r in connected_components(p, small_graph_threshold=0).collect()
    }
    assert local == dist


def test_dedup_groups_from_pairs(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in [1, 2, 3, 4, 5, 6]])
    groups = dedup_groups_from_pairs(docs, _pairs(spark, [(2, 3), (3, 4)]))
    got = {(r.doc_id, r.group_id, r.group_size, r.is_survivor) for r in groups.collect()}
    assert got == {
        (1, 1, 1, True),
        (2, 2, 3, True),
        (3, 2, 3, False),
        (4, 2, 3, False),
        (5, 5, 1, True),
        (6, 6, 1, True),
    }
    # exactly one survivor per group
    assert groups.filter("is_survivor").count() == 4


def test_non_convergence_raises(spark):
    # jump-to-fixpoint collapses chains in ONE contract round, so the
    # budget-exceeded path needs a graph that genuinely takes two
    # rounds: node 2 roots its own star (2 < its min-neighbor 3) while
    # 3 adopts 1, leaving the contracted bridge (2,1) for round two
    edges = [(1, 3), (2, 3), (2, 4)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _pairs(spark, edges), max_iterations=1, small_graph_threshold=0
        )


def test_long_chain_converges_logarithmically(spark):
    # 40-node chain: hash-min would need ~40 rounds; contraction with
    # doubling must finish well inside 10
    chain = [(i, i + 1) for i in range(1, 40)]
    comp = connected_components(
        _pairs(spark, chain), max_iterations=10, small_graph_threshold=0
    )
    got = {(r.node, r.component) for r in comp.collect()}
    assert got == {(i, 1) for i in range(1, 41)}


# ---------------------------------------------------- triangle stats

def _e(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_triangles_k4_complete(spark):
    """K4: 4 triangles, 12 wedges, clustering 1.0."""
    from ironman_medallion_lakehouse_spark.operators.graph import triangle_stats

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = triangle_stats(_e(spark, k4)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.global_clustering == 1.0


def test_triangles_duplicates_directions_loops_ignored(spark):
    """Both directions + duplicates + self-loops must not change the
    count; a path graph has zero triangles."""
    from ironman_medallion_lakehouse_spark.operators.graph import triangle_stats

    tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1)]
    r = triangle_stats(_e(spark, tri)).collect()[0]
    assert r.n_triangles == 1 and r.n_edges == 3
    path = [(1, 2), (2, 3), (3, 4)]
    r2 = triangle_stats(_e(spark, path)).collect()[0]
    assert r2.n_triangles == 0 and r2.n_wedges == 2
    assert r2.global_clustering == 0.0


def test_triangles_matches_naive_on_random_graph(spark):
    import itertools
    import random

    from ironman_medallion_lakehouse_spark.operators.graph import triangle_stats

    rng = random.Random(12)
    nodes = list(range(18))
    edges = [
        (a, b) for a, b in itertools.combinations(nodes, 2) if rng.random() < 0.3
    ]
    adj = set(edges)
    naive = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    r = triangle_stats(_e(spark, edges)).collect()[0]
    assert r.n_triangles == naive


def test_triangles_rejects_ids_outside_packing_domain(spark):
    """ADVICE r5: the deg*2^32+node rank packing is only an ordering on
    [0, 2^32) integral ids — out-of-domain ids must raise, not silently
    miscount."""
    from ironman_medallion_lakehouse_spark.operators.graph import triangle_stats

    big = spark.createDataFrame(
        [Row(src=1 << 33, dst=2), Row(src=2, dst=3)], "src long, dst long"
    )
    with pytest.raises(ValueError, match=r"\[0, 2\^32\)"):
        triangle_stats(big, "src", "dst").collect()

    neg = spark.createDataFrame(
        [Row(src=-1, dst=2), Row(src=2, dst=3)], "src long, dst long"
    )
    with pytest.raises(ValueError, match=r"\[0, 2\^32\)"):
        triangle_stats(neg, "src", "dst").collect()

    strs = spark.createDataFrame(
        [Row(src="a", dst="b")], "src string, dst string"
    )
    with pytest.raises(ValueError, match="integral"):
        triangle_stats(strs, "src", "dst").collect()
