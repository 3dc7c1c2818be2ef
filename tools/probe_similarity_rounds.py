"""r13 probe: pre-gate the r14 similarity.py round removals with ZERO
engine changes (the tools/probe_bpe_topk.py pattern — measure the
decision this round, land the edit when the verification window has
room).

Three deferred sites (tests/test_round_discipline.py R14 tags):
- jl_project proj_j        = d_j(DECIMAL 18,9) :: double / sqrt(out)
- feature_hash_vectors f_j = int f_j :: double / sqrt(Σf²)
- sq8_recon_stats mean_abs_err = Σ|err|(DECIMAL 18,9) :: double / n

Each reduces, post-absorption, to exact-input IEEE arithmetic
(+ correctly-rounded sqrt), so the refined NOTES_r12 rule says
REMOVE — but the q129 grouped-OLS audit proved analysis alone is not
enough: this probe computes the UNROUNDED final values on BOTH
engines (Spark by replicating the operator's expressions up to the
final round; DuckDB by stripping exactly the target ROUND( wrappers
from the live oracle SQL) and compares them BIT-EXACTLY.

Zero mismatches at sf0.01 and sf0.001 = the removal is pre-gated;
any mismatch = the site is reclassified KEEP before r14 spends a
window slot on it.

Usage: python tools/probe_similarity_rounds.py [sf_dir ...]
       (default: /root/testdata/sf0.01 /root/testdata/sf0.001)
"""

from __future__ import annotations

import math
import os
import re
import struct
import sys

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from ironman_medallion_lakehouse_spark import suite  # noqa: E402
from ironman_medallion_lakehouse_spark.session import (  # noqa: E402
    get_spark,
    load_tables,
)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _bits(x) -> int:
    if x is None:
        return -1
    return struct.unpack("<q", struct.pack("<d", float(x)))[0]


def _compare(name, spark_df, con, sql, id_cols, float_cols) -> int:
    sp = {tuple(r[c] for c in id_cols): r for r in spark_df.collect()}
    du = con.execute(sql).fetch_df()
    mism = 0
    assert len(sp) == len(du), (name, len(sp), len(du))
    for _, row in du.iterrows():
        key = tuple(row[c] for c in id_cols)
        srow = sp[key]
        for c in float_cols:
            if _bits(srow[c]) != _bits(row[c]):
                mism += 1
                if mism <= 3:
                    print(
                        f"  MISMATCH {name} {key} {c}: "
                        f"spark={srow[c]!r} duck={row[c]!r}"
                    )
    status = "PASS bit-exact" if mism == 0 else f"FAIL {mism} mismatches"
    print(f"{name}: {len(sp)} rows x {len(float_cols)} float cols — {status}")
    return mism


def probe_jl(spark, con) -> int:
    """q110's projection, unrounded on both sides."""
    from ironman_medallion_lakehouse_spark.operators.similarity import jl_signs

    IN, OUT, SALT = 64, 16, "jl"  # the q110 entry's parameters
    emb = load_tables(spark, os.environ["_PROBE_SF"], "embeddings")["embeddings"]
    signs = jl_signs(IN, OUT, SALT)
    sdf = spark.createDataFrame(
        [(i, *signs[i]) for i in range(IN)],
        ["pos"] + [f"s_{j}" for j in range(OUT)],
    )
    ex = emb.select(
        F.col("vec_id"),
        F.posexplode(F.transform(F.col("embedding"), lambda x: x.cast("double"))),
    )
    root = math.sqrt(float(OUT))
    g = (
        ex.join(F.broadcast(sdf), "pos")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(
                    (F.col("col") * F.col(f"s_{j}")).cast("decimal(18,9)")
                ).alias(f"d_{j}")
                for j in range(OUT)
            ]
        )
        .select(
            "vec_id",
            *[
                (F.col(f"d_{j}").cast("double") / F.lit(root)).alias(f"proj_{j}")
                for j in range(OUT)
            ],
        )
    )
    sql = re.sub(
        r"ROUND\((CAST\(d_\d+ AS DOUBLE\) / [0-9][0-9.e+-]*), 6\)",
        r"\1",
        suite.QUERIES["q110_jl_projection"].oracle,
    )
    assert "ROUND(" not in sql
    return _compare(
        "jl_project", g, con, sql, ["vec_id"], [f"proj_{j}" for j in range(OUT)]
    )


def probe_feature_hash(spark, con) -> int:
    """q116's normalized components, unrounded on both sides."""
    from ironman_medallion_lakehouse_spark.operators.dedup import (
        token_hash_raw,
        words,
    )

    DIM = 16  # _Q116_DIM
    docs = load_tables(spark, os.environ["_PROBE_SF"], "documents")["documents"]
    tf = docs.select(F.col("doc_id"), F.explode(words("text")).alias("tok")).select(
        F.col("doc_id"),
        F.pmod(token_hash_raw(F.col("tok")), F.lit(DIM)).alias("_b"),
        F.when(
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.col("tok"), F.lit("#sign"))), 1, 8),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(2),
            )
            == 0,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias("_s"),
    )
    g = tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(F.when(F.col("_b") == j, F.col("_s")).otherwise(F.lit(0))).alias(
                f"_f{j}"
            )
            for j in range(DIM)
        ],
    )
    norm2 = None
    for j in range(DIM):
        term = F.col(f"_f{j}") * F.col(f"_f{j}")
        norm2 = term if norm2 is None else norm2 + term
    nrm = F.sqrt(norm2.cast("double"))
    out = g.select(
        "doc_id",
        *[
            F.when(nrm == 0, F.lit(0.0))
            .otherwise(F.col(f"_f{j}").cast("double") / nrm)
            .alias(f"f_{j}")
            for j in range(DIM)
        ],
    )
    sql = re.sub(
        r"ROUND\((CASE WHEN nrm = 0 THEN 0\.0 ELSE CAST\(f\d+ AS DOUBLE\) / nrm END), 6\)",
        r"\1",
        suite.QUERIES["q116_feature_hashing"].oracle,
    )
    assert "ROUND(" not in sql
    return _compare(
        "feature_hash", out, con, sql, ["doc_id"], [f"f_{j}" for j in range(DIM)]
    )


def probe_sq8(spark, con) -> int:
    """q108's mean_abs_err, unrounded on both sides (scale_r's round
    is KEEP — full-entropy input — and stays on both sides here)."""
    emb = load_tables(spark, os.environ["_PROBE_SF"], "embeddings")["embeddings"]
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.greatest(F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12))
    enc = emb.select(F.col("vec_id"), v.alias("_v"), scale.alias("scale"))
    joined = enc.select("vec_id", "scale", F.posexplode(F.col("_v")))
    err = F.abs(
        F.round(F.col("col") / F.col("scale") * 127) / 127 * F.col("scale")
        - F.col("col")
    ).cast("decimal(18,9)")
    out = (
        joined.select("vec_id", err.alias("_e"))
        .groupBy("vec_id")
        .agg(F.sum("_e").alias("_se"), F.count(F.lit(1)).alias("_n"))
        .select(
            "vec_id",
            (F.col("_se").cast("double") / F.col("_n")).alias("mean_abs_err"),
        )
    )
    sql = suite.QUERIES["q108_sq8_quantization"].oracle.replace(
        "ROUND(CAST(SUM(e) AS DOUBLE) / COUNT(*), 6) AS mean_abs_err",
        "CAST(SUM(e) AS DOUBLE) / COUNT(*) AS mean_abs_err",
    )
    sql = f"SELECT vec_id, mean_abs_err FROM ({sql})"
    return _compare("sq8_mean_abs_err", out, con, sql, ["vec_id"], ["mean_abs_err"])


def probe_q77(spark, con) -> int:
    """q77's price_ratio (suite-side R14 site found by the r13 census
    extension): one IEEE divide of the stored o_totalprice by the
    decimal-absorbed mean. Spark side = the entry's own SQL minus the
    ROUND; oracle side likewise."""
    load_tables(spark, os.environ["_PROBE_SF"], "orders")
    unrounded = """
        SELECT o_orderkey, o_totalprice,
               o_totalprice / (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                      / COUNT(o_totalprice) FROM orders) AS price_ratio
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                                         / COUNT(o_totalprice) FROM orders)
    """
    return _compare(
        "q77_price_ratio",
        spark.sql(unrounded),
        con,
        unrounded,
        ["o_orderkey"],
        ["price_ratio"],
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.001"]
    suite._load_all()
    spark = get_spark(app_name="probe-similarity-rounds")
    spark.sparkContext.setLogLevel("ERROR")
    total = 0
    for sf in sf_dirs:
        print(f"== {sf}")
        os.environ["_PROBE_SF"] = sf
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        total += probe_jl(spark, con)
        total += probe_feature_hash(spark, con)
        total += probe_sq8(spark, con)
        total += probe_q77(spark, con)
        con.close()
    print(f"TOTAL mismatches: {total}")
    sys.exit(0 if total == 0 else 1)


if __name__ == "__main__":
    main()
