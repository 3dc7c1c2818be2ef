"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference extension (BASELINE.json north star). Everything here
is designed for the 100 TB regime:

- **exact_dedup**: content-hash groupBy — one shuffle on a 32-hex key,
  uniformly distributed by construction (no skew).
- **minhash_signatures + lsh_candidate_pairs**: the scalable near-dup
  path. All-pairs Jaccard is O(n²); MinHash+LSH banding reduces it to
  one explode + k min-aggregations + b equi-joins on band keys. Only
  documents sharing a band bucket are ever paired.
- **jaccard_pairs**: exact verification on a *blocked* pair set — used
  to verify LSH candidates, never run all-pairs.
- **simhash64**: vectorized Arrow/pandas UDF (the per-bit majority
  vote has no efficient Column-expression form); Hamming-adjacent
  buckets give another near-dup family.

All hash primitives are md5 (identical across engines → DuckDB-oracle
checkable); hex-string min is a valid uniform min-hash order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def words(text: Column | str, lowercase: bool = True) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    if lowercase:
        t = F.lower(t)
    return F.split(t, r"\s+")


def word_set(text: Column | str) -> Column:
    return F.array_distinct(words(text))


def shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as a pure Column expression (stays
    inside codegen; no UDF). Documents shorter than ``n`` words yield
    an EMPTY array — guarded with CASE because Spark's
    ``sequence(1, 0)`` is a *descending* sequence, not empty, so an
    unguarded transform would index past the array on short docs."""
    t = f"split(lower({text_col}), '\\\\s+')"
    return F.expr(
        f"CASE WHEN size({t}) < {n} THEN cast(array() as array<string>) "
        f"ELSE array_distinct(transform(sequence(1, size({t}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({t}, i, {n})))) END"
    )


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group-grain view of ``exact_dedup``: (content_hash, n_copies,
    keeper). One survivor policy, three projections — this and
    ``exact_dedup_survivors`` are thin views over the fused pass so the
    min-id tiebreak can never drift between them."""
    return exact_dedup(docs, text_col, id_col).select(
        "content_hash", "n_copies", F.col(id_col).alias("keeper")
    )


def exact_dedup_survivors(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivor-rows-only view of ``exact_dedup`` (original columns)."""
    return exact_dedup(docs, text_col, id_col).drop("content_hash", "n_copies")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Survivor rows annotated with their duplicate-group stats
    (content_hash, n_copies) — groups + survivor policy in ONE window
    pass over a single shuffle on the md5 content hash (rank and count
    share the same window partitioning, so Spark plans one Exchange)."""
    from pyspark.sql import Window

    part = Window.partitionBy(F.md5(F.col(text_col)))
    w = part.orderBy(F.col(id_col).asc())
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(part))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 128,
    tokens: Column | None = None,
) -> DataFrame:
    """k-permutation MinHash over distinct tokens — word tokens by
    default, or any caller-supplied distinct-token array expression via
    ``tokens`` (e.g. ``shingles(text_col, 3)`` for word-3-gram MinHash:
    shingle Jaccard is order-sensitive, so reordered copies stop
    looking like near-dups — the standard shingle→minhash→band
    pipeline).

    Permutation j is the order of md5(word || '#' || j); the signature
    element is the minimum hash — computed as array_min over a
    per-row transform of the distinct-word array: **zero shuffles**
    (the r1 explode + k min-aggregations form shuffled every token;
    this computes all k mins map-side inside one codegen stage, ~2.7×
    faster at sf0.1 and embarrassingly parallel at any scale).
    Documents with no tokens are excluded, matching the
    explode/GROUP BY semantics the DuckDB oracle states.

    The k=128 default matches ``lsh_candidate_pairs`` (32 bands × r=4),
    so the documented two-call pipeline works with defaults end-to-end.

    NB the per-permutation closure: the transform lambda must take ONE
    argument — a two-arg lambda would receive the element index as its
    second parameter (PySpark arity dispatch), silently shadowing a
    default-argument ``j``.
    """
    ws = word_set(text_col) if tokens is None else tokens

    def sig(j: int):
        return F.array_min(
            F.transform(ws, lambda tok: F.md5(F.concat(tok, F.lit(f"#{j}"))))
        ).alias(f"sig_{j}")

    return docs.filter(F.size(ws) > 0).select(
        F.col(id_col), *[sig(j) for j in range(k)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    k: int | None = None,
    bands: int = 32,
) -> DataFrame:
    """LSH banding: hash each band of r = k/bands signature elements to
    a bucket; documents sharing any band bucket become candidate pairs.

    ``k`` defaults to the signature width actually present in the
    input (the sig_* columns), so the two-call pipeline can't silently
    reference columns that don't exist.

    Implemented as one explode to (band_id, bucket) + a self equi-join
    on (band_id, bucket) — the join keys are uniform md5 buckets, so
    the shuffle is skew-free. Output: distinct (id_a < id_b) pairs.

    Banding density governs scale: the match-probability curve is
    1-(1-j^r)^b, so r (rows per band) sets the similarity floor below
    which pairs are overwhelmingly rejected. The k=128/b=32/r=4 default
    puts the curve's threshold near (1/b)^(1/r) ≈ 0.42 — r=2-style
    banding floods the pair join with low-similarity candidates
    (superlinear output growth at corpus scale). ALWAYS follow with
    ``jaccard_refine`` — banding is a recall filter, not a verdict.
    """
    if k is None:
        k = sum(1 for f in signatures.schema.fields if f.name.startswith("sig_"))
    r = k // bands
    if r < 1:
        raise ValueError(
            f"bands ({bands}) exceeds signature width k ({k}); "
            "recompute signatures with k >= bands (k=128 recommended)"
        )
    if k % bands:
        raise ValueError(
            f"signature width k ({k}) is not divisible by bands ({bands}); "
            f"the trailing {k % bands} signature columns would be silently "
            "ignored, weakening the banding threshold — choose k % bands == 0"
        )
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(F.concat_ws("|", *[F.col(f"sig_{b * r + j}") for j in range(r)])).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard over *blocked* pairs (id_a < id_b within
    the same block). Blocking keeps the join linear-ish; never call
    with empty block_cols at scale."""
    with_sets = docs.select(
        F.col(id_col), *[F.col(c) for c in block_cols], word_set(text_col).alias("ws")
    )
    a, b = with_sets.alias("a"), with_sets.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_refine(
    candidates: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    tokens: Column | None = None,
) -> DataFrame:
    """Exact token-set Jaccard over an LSH candidate-pair set — the
    verify stage after ``lsh_candidate_pairs``. Two broadcast-or-shuffle
    hash joins attach each side's token set to the (id_a, id_b) pairs;
    cost is O(candidates), never all-pairs. Emits only pairs at or
    above ``threshold`` with their exact score. ``tokens`` swaps the
    default word set for any distinct-token expression (pass the SAME
    expression used for the signatures — e.g. ``shingles(text_col, 3)``
    for the n-gram Jaccard family)."""
    ws = docs.select(
        F.col(id_col), (word_set(text_col) if tokens is None else tokens).alias("ws")
    )
    a = ws.select(F.col(id_col).alias("id_a"), F.col("ws").alias("ws_a"))
    b = ws.select(F.col(id_col).alias("id_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
    union = F.size(F.col("ws_a")) + F.size(F.col("ws_b")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def winnowing_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Substring-overlap candidate pairs from winnowing fingerprints
    (functions/text.winnowing_fingerprints): docs sharing ≥
    ``min_shared`` selected rolling-hash k-grams become (id_a, id_b,
    n_shared). Catches PARTIAL overlap — a long passage copied into an
    otherwise-different document — which whole-set MinHash resemblance
    dilutes away; any shared substring ≥ k+window−1 chars guarantees a
    shared fingerprint.

    Plan shape: explode fingerprints → self equi-join on the hash →
    count per pair. Same bucketed discipline as LSH banding: only docs
    sharing a fingerprint are ever paired, never all-pairs.

    Skew control: boilerplate (headers, license blocks) yields
    fingerprints shared by thousands of docs — each such hash is a hot
    join bucket contributing O(df²) pairs. ``max_doc_freq`` drops
    fingerprints above a document-frequency ceiling BEFORE the join
    (the IDF-style stop-fingerprint cut every production overlap
    pipeline applies); the df aggregation is one extra skew-free
    shuffle over fingerprint rows."""
    from ironman_medallion_lakehouse_spark.functions.text import (
        winnowing_fingerprints,
    )

    fps = docs.select(
        F.col(id_col),
        F.explode(winnowing_fingerprints(text_col, k=k, window=window)).alias("fp"),
    )
    if max_doc_freq is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


_SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash via an Arrow-batched mapInPandas (per-bit majority
    vote over token hashes has no reasonable Column form).

    The bit-majority is numpy-vectorized: per document, token hashes
    unpack to an (n_tokens × 64) bit matrix in one shift-and-mask, and
    the majority vote is a column sum — no per-token/per-bit Python
    loop (that interpreted O(tokens×64) inner loop was the r1 scale
    finding). md5 is computed once per *distinct* token per batch
    (documents share vocabulary, so the cache hit rate is high)."""
    import hashlib

    import numpy as np

    from ironman_medallion_lakehouse_spark.session import ensure_package_on_executors

    ensure_package_on_executors(docs.sparkSession)
    bit_idx = np.arange(64, dtype=np.uint64)

    def _batch(it):
        for pdf in it:
            token_sets = [set(str(t).lower().split()) for t in pdf[text_col]]
            vocab: dict[str, int] = {}
            for toks in token_sets:
                for tok in toks:
                    if tok not in vocab:
                        vocab[tok] = int.from_bytes(
                            hashlib.md5(tok.encode()).digest()[:8], "big"
                        )
            hashes = []
            for toks in token_sets:
                if not toks:
                    hashes.append(0)
                    continue
                hs = np.fromiter(
                    (vocab[t] for t in toks), dtype=np.uint64, count=len(toks)
                )
                ones = ((hs[:, None] >> bit_idx) & np.uint64(1)).sum(axis=0)
                majority = (2 * ones) > len(toks)  # ones - zeros > 0
                sh = int((majority.astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
                # store as signed 64-bit
                hashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"doc_id": list(pdf[id_col]), "simhash": hashes})

    return docs.select(id_col, text_col).mapInPandas(_batch, _SIMHASH_SCHEMA)
