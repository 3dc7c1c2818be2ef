"""Similarity search over embedding columns (array<float>).

Beyond-reference extension (BASELINE.json north star):

- **cosine_topk**: brute-force baseline — exact, one broadcast of the
  query vector, one pass over the table, TakeOrderedAndProject top-k.
  Linear scan; correct at any scale but O(n) per query.
- **ivf_assign / ivf_topk**: the scale path — IVF-style coarse
  quantization. Centroids (small, broadcast) partition the corpus;
  queries probe only the nearest `nprobe` cells, cutting the scanned
  fraction to ~nprobe/n_cells. Centroid selection here is
  deterministic (first-k rows) so results are oracle-checkable;
  swapping in k-means centroids changes recall, not plumbing.

All arithmetic is done in DOUBLE with an ordered left fold
(F.aggregate), matching DuckDB's list_dot_product on DOUBLE[] casts —
bit-identical, so cosine scores themselves are comparable against the
oracle, not just ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the row with id = query_id.

    The 1-row query side is crossJoin(broadcast(...)) — no shuffle of
    the corpus; the final top-k is TakeOrderedAndProject (per-partition
    heaps, no global sort)."""
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(
            F.col(id_col),
            cosine(F.col(vec_col), F.col("_qvec")).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid cell.

    Centroids = the first n_cells rows by id (deterministic; stands in
    for a k-means codebook). Broadcast centroids × corpus → argmin by
    (cosine desc, centroid_id asc) via one window — a single narrow
    pass over the corpus."""
    from pyspark.sql import Window

    centroids = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec")
        )
    )
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col("centroid_id"),
        cosine(F.col(vec_col), F.col("_cvec")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "centroid_id", F.col("_sim").alias("centroid_sim"))
    )


def ivf_cell_sizes(embeddings: DataFrame, n_cells: int = 8) -> DataFrame:
    return (
        ivf_assign(embeddings, n_cells)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the nprobe cells nearest
    the query. At scale the assignment is precomputed/partitioned-by
    cell, making a probe a partition-pruned scan."""
    assigned = ivf_assign(embeddings, n_cells, id_col, vec_col)
    corpus = embeddings.join(assigned.select(id_col, "centroid_id"), id_col)
    q_cells = [
        r.centroid_id
        for r in assigned.filter(F.col(id_col) == query_id)
        .select("centroid_id")
        .collect()
    ]
    centroids = (
        embeddings.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec"))
    )
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("centroid_id", cosine(F.col("_cvec"), F.col("_qvec")).alias("_s"))
        .orderBy(F.col("_s").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = corpus.join(F.broadcast(probe_cells), "centroid_id").filter(
        F.col(id_col) != query_id
    )
    return (
        candidates.crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("_qvec")).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
