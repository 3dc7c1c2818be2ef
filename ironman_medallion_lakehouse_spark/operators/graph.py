"""Connected components over candidate-pair graphs — the grouping
stage of a near-duplicate pipeline.

Beyond-reference extension (BASELINE.json north star). Pairwise
near-dup detection (LSH banding, winnowing, embedding blocking) emits
EDGES; deduplication needs GROUPS: if A~B and B~C, then {A, B, C} is
one duplicate cluster even though (A, C) was never scored. Connected
components closes that transitivity gap and yields one canonical
survivor per cluster.

Algorithm: min-neighbor star contraction with pointer doubling (the
Borůvka/Kiveris family — "Connected Components in MapReduce and
Beyond"). Each round: (1) every current super-node adopts the minimum
of itself and its neighbors, (2) the node→root mapping composes
through that adoption and then jumps one extra pointer
(root ← root(root)), (3) the edge set is rebuilt as the image of the
ORIGINAL edges under the composed mapping, dropping self-loops.
Dense duplicate clusters (near-cliques) collapse to a single
super-node in ONE round, so the contracted edge frame all but
vanishes after the first iteration — hash-min label propagation (the
r3 implementation) kept re-joining the full edge set for
diameter-many rounds instead (measured 8+ rounds × ~0.6 s at sf0.1).
Pointer doubling squares the mapped depth per round, so even
adversarial chains converge in O(log diameter) rounds. Per-round
frames are localCheckpoint-ed so the iterative plan never accumulates
lineage (the classic iterative-Spark failure mode).

At 100 TB scale the mapping frame is one row per *paired* document
(far smaller than the corpus — most documents share no pair), the
original edge frame is the refined pair set (materialized once), and
every per-round join shuffles on uniformly-hashed ids — or broadcasts
outright once contraction shrinks a side under the broadcast
threshold, which AQE decides at runtime.
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

    Invariant: after round t, ``mapping`` sends every original node to
    its super-node in the t-times-contracted graph; the component
    minimum maps to itself forever (it is the min of any neighborhood
    containing it), so at fixpoint (no surviving edges) every node's
    root IS its component minimum.

    Raises after ``max_iterations`` non-converged rounds rather than
    returning a silently-partial labeling.
    """
    # materialize the INPUT pairs once, before building the symmetric
    # union: the union's two branches each re-read their child, so an
    # unmaterialized `pairs` (typically an expensive LSH→refine
    # lineage) would be computed twice here and once more per round
    e = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .localCheckpoint(eager=True)
    )
    # cheap view over the checkpoint — no second materialization needed
    edges = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    mapping = None
    cur = edges
    for _ in range(max_iterations):
        # (1) star step: each super-node adopts min(self, neighbors).
        # groupBy has map-side partial aggregation, so duplicate edges
        # never inflate the shuffle.
        m = (
            cur.groupBy("s")
            .agg(F.min("d").alias("_md"))
            .select(F.col("s").alias("_n"), F.least(F.col("s"), F.col("_md")).alias("_m"))
        )
        # (2) compose the mapping through the adoption, then jump one
        # extra pointer (root ← root(root)) — squares the mapped depth.
        # Round 0 needs no identity-mapping materialization: every node
        # appears as an edge source (symmetric union), so m IS the
        # round-0 mapping. stepped is checkpointed (one small frame)
        # because BOTH sides of the doubling self-join read it —
        # unmaterialized, the min-aggregation over the full edge frame
        # would run twice.
        if mapping is None:
            stepped = m.select(
                F.col("_n").alias("node"), F.col("_m").alias("root")
            ).localCheckpoint(eager=True)
        else:
            stepped = (
                mapping.join(m, mapping["root"] == m["_n"], "left")
                .select("node", F.coalesce(F.col("_m"), F.col("root")).alias("root"))
                .localCheckpoint(eager=True)
            )
        mapping = (
            stepped.alias("x")
            .join(stepped.alias("y"), F.col("x.root") == F.col("y.node"), "left")
            .select(
                F.col("x.node").alias("node"),
                F.coalesce(F.col("y.root"), F.col("x.root")).alias("root"),
            )
            .localCheckpoint(eager=True)
        )
        # (3) contract: image of the ORIGINAL edges under the composed
        # mapping; self-loops (intra-component edges) drop out, so
        # dense clusters vanish after one round
        cur = (
            edges.join(mapping.select(F.col("node").alias("s"), F.col("root").alias("_rs")), "s")
            .join(mapping.select(F.col("node").alias("d"), F.col("root").alias("_rd")), "d")
            .select(F.col("_rs").alias("s"), F.col("_rd").alias("d"))
            .filter(F.col("s") != F.col("d"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if cur.isEmpty():
            return mapping.select("node", F.col("root").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds; "
        "the contracted graph still has edges — raise max_iterations "
        "(rounds needed is O(log diameter) under pointer doubling)"
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
