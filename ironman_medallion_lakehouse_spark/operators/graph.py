"""Connected components over candidate-pair graphs — the grouping
stage of a near-duplicate pipeline.

Beyond-reference extension (BASELINE.json north star). Pairwise
near-dup detection (LSH banding, winnowing, embedding blocking) emits
EDGES; deduplication needs GROUPS: if A~B and B~C, then {A, B, C} is
one duplicate cluster even though (A, C) was never scored. Connected
components closes that transitivity gap and yields one canonical
survivor per cluster.

Algorithm: iterative hash-min label propagation — every node starts
labeled with its own id; each round a node takes the minimum label
among itself and its neighbors; at fixpoint every node carries the
minimum id of its component. Each round is two skew-tolerant shuffles
(edge⋈label hash join + min-aggregation), and the label frame is
localCheckpoint-ed per round so the plan never accumulates iterations
(lineage growth is the classic iterative-Spark failure mode). Rounds
needed = graph diameter, which for duplicate clusters is small (dense
clusters have diameter ~1-2); for adversarially-chained graphs the
large-star/small-star scheme (Kiveris et al., "Connected Components in
MapReduce and Beyond") converges in O(log n) rounds — hash-min is
chosen here because dedup graphs are shallow and it needs no
re-keyed edge rewriting per round.

At 100 TB scale the label frame is one row per *paired* document (far
smaller than the corpus — most documents share no pair) and the edge
frame is the refined pair set; both shuffle on uniformly-hashed ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id in the node's connected
    component — a deterministic, engine-independent group id (the
    DuckDB oracle reproduces it with a recursive-CTE reachability
    closure).

    Undirected semantics: each pair is an edge both ways. Nodes that
    appear in no pair are absent (callers keep unpaired docs as
    implicit singleton groups — see ``dedup_groups_from_pairs``).

    Raises after ``max_iterations`` non-converged rounds rather than
    returning a silently-partial labeling.
    """
    e = pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    edges = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # cache: re-joined every round
    edges = edges.distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["d"] == labels["node"])
            .groupBy(F.col("s").alias("node2"))
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, labels["node"] == F.col("node2"), "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)  # one materialization per round
        )
        changed = stepped.filter(F.col("label") < F.col("old")).limit(1).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "the graph diameter exceeds the budget — raise max_iterations or "
        "use a star-contraction scheme for chain-shaped graphs"
    )


def dedup_groups_from_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Per-document duplicate-group assignment from a pair set:
    (id, group_id, group_size, is_survivor).

    Paired documents get their connected component's min id as
    ``group_id``; unpaired documents are singleton groups of
    themselves. The survivor policy is min-id — deterministic and
    consistent with ``exact_dedup``'s tiebreak, so downstream
    ``filter(is_survivor)`` yields exactly one kept row per cluster.
    The docs side is one broadcast-or-shuffle left join against the
    (small) component labeling; group sizes are a window count over
    the group key.
    """
    from pyspark.sql import Window

    comp = connected_components(pairs, src_col, dst_col)
    assigned = (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("group_id"),
        )
    )
    w = Window.partitionBy("group_id")
    return assigned.select(
        F.col(id_col),
        "group_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col(id_col) == F.col("group_id")).alias("is_survivor"),
    )
