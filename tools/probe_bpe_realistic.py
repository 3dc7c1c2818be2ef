#!/usr/bin/env python3
"""VERDICT r8 directive 3: substantiate BPE batching at realistic
shape. learn_bpe_batched measured ~2.2 merges/round on a 31-word toy
corpus; the production claim is that real corpora batch better. This
probe learns >= 256 merges from the FULL documents corpus word-count
table (realistic Zipfian vocab) at max_batch 16 and 32 and records
merges/round, jobs/merge, wall time, and the admissibility-rule
stop-reason histogram (which rule ends batches in practice).

Usage: python tools/probe_bpe_realistic.py [sf_dir] [num_merges]
Run on an idle box (the bench discipline); results go to SCALING.md.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from ironman_medallion_lakehouse_spark.operators.vocab import (  # noqa: E402
    learn_bpe_batched,
    word_counts,
)
from ironman_medallion_lakehouse_spark.session import get_spark  # noqa: E402


def zipf_counts(spark, vocab_size: int = 50_000, top_count: int = 10_000_000):
    """Deterministic Zipfian (word, n) table at realistic vocabulary
    size — the probe shape the synthetic documents corpus cannot give
    (its generator draws from a 31-word lexicon, so its word-count
    table IS the r8 'toy' shape and BPE saturates at ~107 merges).
    Words are md5-derived letter strings (length 3-10, 20-letter
    alphabet), counts n = max(1, top_count/rank)."""
    import hashlib

    rows = []
    for rank in range(1, vocab_size + 1):
        h = hashlib.md5(f"zipf-word-{rank}".encode()).digest()
        length = 3 + h[0] % 8
        word = "".join(chr(ord("a") + h[1 + j] % 20) for j in range(length))
        rows.append((word, max(1, top_count // rank)))
    df = spark.createDataFrame(rows, "word string, n long")
    # md5 collisions merge ranks — keep (word, n) unique like word_counts
    from pyspark.sql import functions as F

    return df.groupBy("word").agg(F.sum("n").alias("n"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark()
    sc = spark.sparkContext
    if sf_dir == "zipf":
        counts = zipf_counts(spark).localCheckpoint(eager=True)
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        counts = word_counts(docs).localCheckpoint(eager=True)
    n_words = counts.count()
    out = []
    arms = [("prefix", 16), ("prefix", 32), ("independent", 64)]
    if len(sys.argv) > 3:  # e.g. "independent:64" to run one arm
        mode, mb = sys.argv[3].split(":")
        arms = [(mode, int(mb))]
    for select, max_batch in arms:
        group = f"bpe-probe-{select}-{max_batch}"
        sc.setJobGroup(group, f"bpe probe {select} max_batch={max_batch}")
        stats: dict = {}
        t0 = time.time()
        try:
            merges = learn_bpe_batched(
                counts, num_merges, max_batch=max_batch, stats=stats,
                select=select,
            )
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        finally:
            sc.setJobGroup(None, None)
        wall = time.time() - t0
        rec = {
            "sf_dir": sf_dir,
            "distinct_words": n_words,
            "select": select,
            "skipped_interacting": stats.get("skipped_interacting"),
            "max_batch": max_batch,
            "merges": len(merges),
            "rounds": stats["rounds"],
            "merges_per_round": round(len(merges) / stats["rounds"], 2),
            "jobs": jobs,
            "jobs_per_merge": round(jobs / len(merges), 3),
            "wall_s": round(wall, 1),
            # wall decomposition (r10): collect scales with ROUNDS
            # (what a smarter batch rule cuts), checkpoint with
            # MERGES/8 (invariant under any batching rule)
            "t_collect_s": stats.get("t_collect_s"),
            "t_checkpoint_s": stats.get("t_checkpoint_s"),
            "stop_reasons": stats.get("stop_reasons", {}),
        }
        out.append(rec)
        print(json.dumps(rec))
    print(json.dumps({"probe": "bpe_realistic", "arms": out}))


if __name__ == "__main__":
    main()
