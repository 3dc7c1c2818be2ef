"""Scaling probe: run headline query shapes at 1× and N× the sf
directory's data volume and report the runtime ratio.

The per-round bench at sf0.1 is overhead-dominated (~0.5-1 s JVM
planning/codegen per query), so it can't show how the PLANS behave as
data grows. This probe replicates the driver-generated tables in
memory (k copies, keys offset per replica so join/group cardinalities
scale too — no synthetic value distributions are invented) and times
the executed plan only (noop sink, no driver transfer, built once and
warmed). A scale-safe plan shows time(N×)/time(1×) ≈ N on fixed
cores; superlinear growth flags a shuffle/skew problem.

Usage: python tools/scale_probe.py [factor]   (default 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ironman_medallion_lakehouse_spark.session import get_spark, load_tables  # noqa: E402
from ironman_medallion_lakehouse_spark import suite  # noqa: E402
from ironman_medallion_lakehouse_spark.operators import dedup as D  # noqa: E402
from ironman_medallion_lakehouse_spark.streaming.event_windows import sessionize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _replicate(df: DataFrame, factor: int, key_cols: list[str]) -> DataFrame:
    """k copies; BIGINT key columns are offset per replica so key
    cardinality grows with volume (pure duplication would instead
    deepen groups k-fold, which no real growth pattern does)."""
    if factor == 1:
        return df
    rep = df.withColumn("_r", F.explode(F.array(*[F.lit(i) for i in range(factor)])))
    offset = 1_000_000_000
    for c in key_cols:
        rep = rep.withColumn(c, F.col(c) + F.col("_r").cast("long") * offset)
    return rep.drop("_r")


def _probe_queries(spark, factor: int):
    t = load_tables(spark, SF_DIR, "lineitem", "orders", "customer", "documents", "events")
    li = _replicate(t["lineitem"], factor, ["l_orderkey"])
    o = _replicate(t["orders"], factor, ["o_orderkey", "o_custkey"])
    c = _replicate(t["customer"], factor, ["c_custkey"])
    docs = _replicate(t["documents"], factor, ["doc_id"])
    ev = _replicate(t["events"], factor, ["event_id", "user_id"])
    cutoff = F.lit("1998-03-15").cast("timestamp")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return {
        # q01 shape: single-shuffle grouped aggregation
        "agg": li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"), suite.dsum("l_quantity", "sum_qty")
        ),
        # q66 shape: filtered 3-table join + grouped top-k
        "join_topk": (
            c.filter(F.col("c_mktsegment") == "BUILDING")
            .join(o, c.c_custkey == o.o_custkey)
            .filter(F.col("o_orderdate") < cutoff)
            .join(li, li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate") > cutoff)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(suite.dsum(revenue, "revenue"))
            .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
            .limit(10)
        ),
        # sessionization shape: shared-sort window chain
        "window": sessionize(ev),
        # q55 shape: zero-shuffle minhash
        "minhash": D.minhash_signatures(docs, k=16),
    }


def _time(df: DataFrame) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF_DIR, "factor": factor, "queries": {}}
    q1 = _probe_queries(spark, 1)
    qn = _probe_queries(spark, factor)
    for name in q1:
        t1 = _time(q1[name])
        tn = _time(qn[name])
        out["queries"][name] = {
            "t_1x": t1,
            f"t_{factor}x": tn,
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
