"""Suite entries beyond the core/view/extension sets: CSV ingest
roundtrip, table-store merge semantics vs pure SQL, as-of join,
rollup/cube, salted aggregation, embedding near-dup pairs."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.operators.asof import as_of_join
from ironman_medallion_lakehouse_spark.operators.similarity import cosine
from ironman_medallion_lakehouse_spark.session import load_tables
from ironman_medallion_lakehouse_spark.sources.tablestore import TableStore
from ironman_medallion_lakehouse_spark.suite import dsum, register, year_of


# ===========================================================================
# §2.1 S1-S3 — CSV landing-zone ingest roundtrip
# ===========================================================================

@register(
    "q56_csv_ingest",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers, COUNT(DISTINCT c_nationkey) AS n_nations
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q56_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 S1-S3: the bronze CSV ingest path
    (plans/bronze.read_csv_with_metadata — header'd all-string read,
    dash→null, lineage metadata) driven end-to-end: customer is staged
    as a landing CSV, re-ingested, re-typed, aggregated. The oracle
    reads the original parquet — the roundtrip must be lossless."""
    from ironman_medallion_lakehouse_spark.plans.bronze import read_csv_with_metadata

    t = load_tables(spark, sf_dir, "customer")
    stage = os.path.join(
        tempfile.gettempdir(), f"csv_ingest_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    t["customer"].select(
        F.col("c_custkey").cast("string"),
        F.col("c_nationkey").cast("string"),
        F.col("c_mktsegment"),
    ).write.mode("overwrite").option("header", "true").csv(stage)

    ingested = read_csv_with_metadata(spark, stage, year=2024, gender="M")
    assert "load_timestamp" in ingested.columns  # S3 metadata attached
    return (
        ingested.withColumn("c_nationkey", F.col("c_nationkey").cast("int"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
        )
    )


# ===========================================================================
# JSON-lines ingest roundtrip (semi-structured source family)
# ===========================================================================

@register(
    "q64_json_ingest",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def q64_json_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured source: documents staged as JSON-lines, re-read
    with spark.read.json under an explicit schema (schema-on-read —
    never inferSchema over 100 TB), aggregated; must round-trip
    losslessly against the parquet oracle."""
    t = load_tables(spark, sf_dir, "documents")
    stage = os.path.join(
        tempfile.gettempdir(), f"json_ingest_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    t["documents"].select("doc_id", "lang", "n_chars").write.mode("overwrite").json(stage)
    ingested = spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(stage)
    return ingested.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ===========================================================================
# per-group normalization: window form (oracle) ≡ applyInPandas form (pytest)
# ===========================================================================

@register(
    "q65_group_zscore",
    oracle="""
    WITH stats AS (
      SELECT c_nationkey,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) AS mu,
        COUNT(*) AS n
      FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey,
           c.c_nationkey,
           ROUND((c.c_acctbal - s.mu) / 1000.0, 6) AS centered_k
    FROM customer c JOIN stats s ON c.c_nationkey = s.c_nationkey
    """,
)
def q65_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization (centering), Spark-first: a window
    aggregate over the group — no Python, one shuffle. The
    applyInPandas variant of the same semantics lives in
    tests/test_extensions_more.py and is asserted equal; built-ins win
    whenever they can express the op (SURVEY §2.10 philosophy).
    Division by a constant (not stddev) keeps the oracle
    bit-deterministic."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    mu = F.sum(F.col("c_acctbal").cast("decimal(18,4)")).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        F.round((F.col("c_acctbal") - mu) / 1000.0, 6).alias("centered_k"),
    )


# ===========================================================================
# §2.1 S7 — insert-only MERGE semantics vs pure SQL
# ===========================================================================

@register(
    "q57_merge_insert_only",
    oracle="""
    WITH target AS (
      SELECT *, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year
      FROM orders WHERE o_orderkey % 3 != 0
    ),
    source AS (
      SELECT *, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year
      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
    ),
    merged AS (
      SELECT * FROM target
      UNION ALL
      SELECT * FROM source s
      WHERE NOT EXISTS (SELECT 1 FROM target t WHERE t.o_orderkey = s.o_orderkey)
    )
    SELECT order_year, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM merged GROUP BY order_year
    """,
)
def q57_merge_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 S7: whenNotMatchedInsertAll() merge
    (02_bronze.ipynb:311-318) executed through the real TableStore
    (year-partitioned, file-appending, partition-pruned anti-join) and
    checked against the pure-SQL definition of insert-only merge."""
    t = load_tables(spark, sf_dir, "orders")
    orders = t["orders"].withColumn("order_year", year_of("o_orderdate"))
    store = TableStore(spark, tempfile.mkdtemp(prefix="merge_io_"))
    store.save_overwrite(
        orders.filter(F.col("o_orderkey") % 3 != 0), "db.orders", partition_by=["order_year"]
    )
    store.merge_insert_only(
        orders.filter(F.col("order_year").isin(1997, 1998)),
        "db.orders",
        keys=["o_orderkey"],
    )
    return (
        store.read("db.orders")
        .groupBy("order_year")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


# ===========================================================================
# §2.1 S8 — SCD-1 MERGE semantics vs pure SQL
# ===========================================================================

@register(
    "q58_merge_scd1",
    oracle="""
    WITH source AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 2 = 1
    ),
    merged AS (
      SELECT t.c_custkey,
             CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
             t.c_mktsegment
      FROM customer t LEFT JOIN source s ON t.c_custkey = s.c_custkey
      UNION ALL
      SELECT s.c_custkey, s.c_acctbal, s.c_mktsegment FROM source s
      WHERE NOT EXISTS (SELECT 1 FROM customer t WHERE t.c_custkey = s.c_custkey)
    )
    SELECT c_custkey, c_acctbal, c_mktsegment FROM merged
    """,
)
def q58_merge_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.1 S8: whenMatchedUpdate + whenNotMatchedInsertAll
    (04a_gold_dim_athletes.ipynb:311-328) through the real TableStore,
    checked against the SQL reconstruction: matched rows take source
    attrs, unmatched keep theirs, new keys insert."""
    t = load_tables(spark, sf_dir, "customer")
    c = t["customer"]
    store = TableStore(spark, tempfile.mkdtemp(prefix="merge_scd1_"))
    store.save_overwrite(c, "db.dim")
    updates = c.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100
    )
    inserts = c.filter(F.col("c_custkey") % 2 == 1).withColumn(
        "c_custkey", F.col("c_custkey") + 10000000
    )
    store.merge_scd1(
        updates.unionByName(inserts), "db.dim", keys=["c_custkey"], update_cols=["c_acctbal"]
    )
    return store.read("db.dim").select("c_custkey", "c_acctbal", "c_mktsegment")


# ===========================================================================
# as-of (point-in-time) join — custom operator, DuckDB ASOF as oracle
# ===========================================================================

@register(
    "q60_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id, p.ts, c.click_id AS click_id_asof, c.ts AS ts_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q60_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase attaches the
    latest preceding click of the same user. Union-tag-window plan —
    one shuffle, no range explosion; DuckDB's native ASOF JOIN is the
    oracle."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    return as_of_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_payload=["click_id"],
    )


# ===========================================================================
# ROLLUP / CUBE — multi-level aggregation (beyond-reference)
# ===========================================================================

@register(
    "q61_rollup",
    oracle="""
    SELECT
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), o_orderpriority)
    """,
)
def q61_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (year → priority → grand total) — absent
    from the reference (SURVEY §2.4 'grouping sets absent') but a
    natural serving-layer op; Spark plans it as a single Expand +
    aggregate, one shuffle."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .rollup(year_of("o_orderdate").alias("order_year"), F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
    )


@register(
    "q62_cube",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n_lines,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q62_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    Expand + aggregate."""
    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity", "sum_qty"))
    )


# ===========================================================================
# salted two-phase aggregation — skew technique, oracle = plain GROUP BY
# ===========================================================================

@register(
    "q63_salted_aggregate",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q63_salted_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: l_returnflag has only 3 values,
    so a direct shuffle lands all 600M-rows-per-flag (at 100 TB) on 3
    reducers. Salting groups by (key, hash%16) first — partial results
    spread over 48 reducers — then combines. Decimal accumulation makes
    the two-phase result exactly equal the direct GROUP BY oracle."""
    t = load_tables(spark, sf_dir, "lineitem")
    salted = t["lineitem"].withColumn(
        "_salt", F.pmod(F.hash("l_orderkey"), F.lit(16))
    )
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("_sum"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_n").alias("n_lines"),
        F.sum("_sum").cast("double").alias("sum_price"),
    )


# ===========================================================================
# classic heavy shapes: shipping-priority top-k, 6-way volume join,
# moving-average window frame
# ===========================================================================

@register(
    "q66_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q66_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on three tables feeding a
    grouped top-k. All three filters push to their scans; customer
    broadcasts; lineitem⋈orders is the only real shuffle."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    cutoff = F.lit("1998-03-15").cast("timestamp")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
    )


@register(
    "q67_regional_volume",
    oracle="""
    SELECT
      n.n_name AS nation_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q67_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with a same-nation constraint between
    customer and supplier. customer/supplier/nation/region broadcast;
    the fact-side shuffle is lineitem⋈orders only."""
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    s, n, r = t["supplier"], t["nation"], t["region"]
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@register(
    "q68_moving_average",
    oracle="""
    WITH daily AS (
      SELECT
        date_trunc('day', o_orderdate) AS order_date,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT
      order_date, n_orders, revenue,
      CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER (
        ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS revenue_7d,
      CAST(SUM(n_orders) OVER (
        ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS orders_7d
    FROM daily
    """,
)
def q68_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame (rowsBetween) — absent from the reference
    (SURVEY §2.5 'frames all default') but core serving-layer machinery:
    7-row trailing totals over the daily aggregate. Frame sums go
    through decimal so the sliding accumulation is order-exact."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, "orders")
    daily = (
        t["orders"]
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("order_date"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
    )
    w = Window.orderBy("order_date").rowsBetween(-6, Window.currentRow)
    return daily.select(
        "order_date",
        "n_orders",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(18,4)")).over(w).cast("double").alias("revenue_7d"),
        F.sum("n_orders").over(w).alias("orders_7d"),
    )


# ===========================================================================
# pivot / unpivot / set ops / semi-anti joins / range join
# ===========================================================================

@register(
    "q71_pivot",
    oracle="""
    SELECT
      user_id % 10 AS user_bucket,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase
    FROM events
    GROUP BY 1
    """,
)
def q71_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.groupBy().pivot(values=[...]) with an explicit value list —
    the explicit list matters at scale: without it Spark runs an extra
    distinct-collect job over the full column."""
    t = load_tables(spark, sf_dir, "events")
    return (
        t["events"]
        .groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=["click", "view", "purchase"])
    )


@register(
    "q72_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def q72_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.unpivot (melt): wide measures → long (measure, value) — one
    narrow Expand, no shuffle."""
    t = load_tables(spark, sf_dir, "lineitem")
    return t["lineitem"].filter(F.col("l_orderkey") % 100 == 0).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "q73_intersect_except",
    oracle="""
    SELECT 'both' AS side, c_nationkey FROM (
      SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    UNION ALL
    SELECT 'only_building', c_nationkey FROM (
      SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT DISTINCT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    """,
)
def q73_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (absent from the reference —
    SURVEY §2.7 — present for engine completeness)."""
    t = load_tables(spark, sf_dir, "customer")
    c = t["customer"]
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey").distinct()
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey").distinct()
    both = building.intersect(machinery).select(F.lit("both").alias("side"), "c_nationkey")
    only_b = building.exceptAll(machinery).select(
        F.lit("only_building").alias("side"), "c_nationkey"
    )
    return both.unionByName(only_b)


@register(
    "q74_semi_anti_join",
    oracle="""
    SELECT 'has_urgent' AS side, COUNT(*) AS n FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'no_orders', COUNT(*) FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q74_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti joins ≡ EXISTS / NOT EXISTS — the join
    types the merge layer uses internally (SURVEY §2.3 note), exposed
    as first-class operators."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    c, o = t["customer"], t["orders"]
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    semi = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("has_urgent").alias("side"), "n")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("no_orders").alias("side"), "n")
    return semi.unionByName(anti)


@register(
    "q75_range_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS pt
      FROM events WHERE event_type = 'purchase'
    ),
    errors AS (
      SELECT event_id AS error_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS et
      FROM events WHERE event_type = 'error'
    )
    SELECT p.purchase_id, e.error_id
    FROM purchases p JOIN errors e
      ON p.user_id = e.user_id AND ABS(p.pt - e.et) <= 3600
    """,
)
def q75_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (operators/rangejoin.py): purchases paired
    with same-user errors within ±1 h. The bin-replicate-refine rewrite
    turns the θ-join into an equi-join — O(n+m+pairs), not O(n·m);
    the oracle states the naive θ-join semantics directly."""
    from ironman_medallion_lakehouse_spark.operators.rangejoin import range_join_within

    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("ets")
    )
    return range_join_within(
        purchases, errors, on=["user_id"], left_ts="pts", right_ts="ets",
        window_seconds=3600,
    ).select("purchase_id", "error_id")


# ===========================================================================
# SQL entry point: scalar subquery + grouping sets (spark.sql path)
# ===========================================================================

@register(
    "q77_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                        / COUNT(o_totalprice) FROM orders), 4) AS price_ratio
    FROM orders
    WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                     / COUNT(o_totalprice) FROM orders)
    """,
)
def q77_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point (SURVEY §3 entry-3): scalar subqueries in both
    projection and predicate, submitted as SQL text over the registered
    temp views — exercising the parser → analyzer → optimizer path the
    reference's %sql cells use. Catalyst plans the subquery once and
    broadcasts the scalar."""
    load_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                            / COUNT(o_totalprice) FROM orders), 4) AS price_ratio
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                         / COUNT(o_totalprice) FROM orders)
        """
    )


@register(
    "q78_grouping_sets",
    oracle="""
    SELECT
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
      o_orderstatus,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS (
      (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)),
      (o_orderstatus),
      ()
    )
    """,
)
def q78_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL text (year-only, status-only, and
    grand-total rollups in one Expand + aggregate)."""
    load_tables(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT
          CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
          o_orderstatus,
          COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS (
          (CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)),
          (o_orderstatus),
          ()
        )
        """
    )


# ===========================================================================
# date/time function battery
# ===========================================================================

@register(
    "q76_datetime_battery",
    oracle="""
    SELECT
      o_orderkey,
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
      CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
      CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
      CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
      CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec,
      CAST(floor(epoch(o_orderdate)) / 86400 AS BIGINT) AS epoch_day,
      o_orderdate + INTERVAL 30 DAY AS plus_30d,
      date_trunc('month', o_orderdate) AS month_start
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
)
def q76_datetime_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface beyond the reference's
    current_timestamp/current_date: extracts, epoch arithmetic,
    interval addition, month truncation. Timestamp-typed outputs
    throughout (date-typed cells hash differently between engines'
    pandas conversions)."""
    t = load_tables(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.year(ts).cast("bigint").alias("y"),
            F.month(ts).cast("bigint").alias("m"),
            F.quarter(ts).cast("bigint").alias("q"),
            F.dayofmonth(ts).cast("bigint").alias("d"),
            # NTZ→long needs an LTZ hop; session tz is pinned UTC so the
            # epoch matches DuckDB's naive-UTC interpretation
            ts.cast("timestamp").cast("long").alias("epoch_sec"),
            F.floor(ts.cast("timestamp").cast("long") / 86400).cast("bigint").alias("epoch_day"),
            (ts + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
            F.date_trunc("month", ts).alias("month_start"),
        )
    )


# ===========================================================================
# embedding-cosine near-dup pairs (dedup family, vector variant)
# ===========================================================================

_DOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


@register(
    "q59_embedding_neardup",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding, sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm) >= 0.99
    """,
)
def q59_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at threshold 0.99. The
    exact all-pairs form is the verification baseline (here, bounded
    corpus); at 100 TB the IVF cells (q46) or LSH buckets provide the
    blocking and this same scoring runs only within candidate blocks."""
    t = load_tables(spark, sf_dir, "embeddings")
    e = t["embeddings"]
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.99)
        .select("id_a", "id_b")
    )
