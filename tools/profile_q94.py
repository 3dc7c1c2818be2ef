"""Stage-level timing for the q94 incremental-dedup family (VERDICT r6
item 5: replace the superseded "corpus signature bootstrap dominates"
story with a MEASURED attribution).

Stages dedup_incoming exactly as the operator composes them, forcing
each with its own eager localCheckpoint so wall time attributes to ONE
stage (the q83 profiler's protocol; the total slightly overstates the
fused pipeline). Both arms are timed:

- inline  — q94's path: corpus signatures computed in the run
- prepared — q94b's path: corpus signatures read from parquet

Run on an otherwise-idle box:  python tools/profile_q94.py [sf_dir] [reps]

``reps`` (default 3) repeats each arm; report the MIN per stage (the
r6 measurement-honesty protocol — single-sample numbers on this box
spread 1.4-2.4x).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ironman_medallion_lakehouse_spark.session import get_spark  # noqa: E402
from ironman_medallion_lakehouse_spark.operators import dedup as D  # noqa: E402
from ironman_medallion_lakehouse_spark import suite_training as ST  # noqa: E402


def run_arm(spark, sf_dir: str, prepared: bool) -> dict[str, float]:
    times: dict[str, float] = {}

    def stage(name, df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        n = out.count()
        times[name] = time.perf_counter() - t0
        print(f"  {name}: {times[name]:.2f}s rows={n}")
        return out

    incoming, corpus = ST._q94_frames(spark, sf_dir)
    incoming = incoming.localCheckpoint(eager=True)
    corpus = corpus.localCheckpoint(eager=True)

    text_col, id_col = "text", "doc_id"
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    inc_hash = incoming.select(F.col(id_col), F.md5(norm).alias("_h"))
    corp_hash = corpus.select(F.md5(norm).alias("_h")).distinct()
    exact = stage(
        "exact_hash_join",
        inc_hash.join(corp_hash, "_h", "left_semi").select(id_col),
    )
    remaining = stage(
        "prune_exact", incoming.join(exact, id_col, "left_anti")
    )
    sig_new = stage(
        "sig_incoming", D.minhash_signatures(remaining, text_col, id_col, k=128)
    )
    if prepared:
        path = ST._q94_corpus_sigs_path(sf_dir)
        if not os.path.exists(path):
            D.minhash_signatures(corpus).write.mode("overwrite").parquet(path)
        corpus_sigs = stage("sig_corpus_read", spark.read.parquet(path))
    else:
        corpus_sigs = stage(
            "sig_corpus_inline", D.minhash_signatures(corpus, text_col, id_col, k=128)
        )
    cand = stage(
        "band_join",
        D.lsh_cross_candidates(sig_new, corpus_sigs, id_col, bands=ST._Q94_BANDS),
    )
    lookup = incoming.select(id_col, text_col).unionByName(
        corpus.select(id_col, text_col)
    )
    near = stage(
        "jaccard_refine",
        D.jaccard_refine(
            cand.withColumnsRenamed({"id_new": "id_a", "id_corpus": "id_b"}),
            lookup,
            text_col,
            id_col,
            threshold=ST._Q94_THRESHOLD,
            hashed_tokens=True,
        )
        .select(F.col("id_a").alias(id_col))
        .distinct(),
    )
    _ = near
    return times


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    for arm, prepared in (("inline(q94)", False), ("prepared(q94b)", True)):
        best: dict[str, float] = {}
        for i in range(reps):
            print(f"--- {arm} rep {i + 1} ---")
            t = run_arm(spark, sf_dir, prepared)
            for k, v in t.items():
                best[k] = min(best.get(k, float("inf")), v)
        total = sum(best.values())
        print(f"=== {arm} min-of-{reps} ===")
        for k, v in best.items():
            print(f"  {k}: {v:.2f}s ({100 * v / total:.0f}%)")
        print(f"  staged-total: {total:.2f}s")


if __name__ == "__main__":
    main()
