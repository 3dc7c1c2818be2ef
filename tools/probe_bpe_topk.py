#!/usr/bin/env python3
"""VERDICT r11 directive 5 pre-measurement: the BPE top-K word-count
sampling dial.

At 100 TB the learner's per-round ``_pair_counts`` scales with the
WORD-COUNT TABLE's rows (a web corpus has 10^8+ distinct words, almost
all hapax noise), so production BPE always truncates the table — by
frequency rank (top-K) or equivalently a count floor under Zipf. The
dial's QUALITY question: does learning on the head of the distribution
change the merges/compression the tokenizer ships, when compression is
always EVALUATED on the FULL table?

Protocol (the r11 independent-mode decision protocol):
- corpus: the realistic 50k-word Zipf table
  (tools/probe_bpe_realistic.zipf_counts, n ~ 1/rank);
- arms: full table (baseline) vs top-K in {16384, 8192, 4096} by
  (n desc, word asc) — deterministic tiebreak;
- learner: learn_bpe_batched(select='independent', max_batch=64),
  8192 merges (the production learn-at-scale mode the r11 decision
  documented — wall is the lever being bought);
- readouts per arm: learn wall, rounds, compression at
  1k/2k/4k/8k cuts on the FULL table, merge-product overlap vs the
  full-table arm at each cut.

Results go to SCALING.md as the r13 decision row; the r13 build is a
``top_k_words=`` opt-in on the learners whose semantics are exactly
``counts.orderBy(n desc, word asc).limit(K)`` — this probe measures
that semantics against the unmodified learner, zero engine changes.

Usage: python tools/probe_bpe_topk.py [num_merges] [out.json]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import functions as F  # noqa: E402

from ironman_medallion_lakehouse_spark.operators import vocab as VB  # noqa: E402
from ironman_medallion_lakehouse_spark.session import get_spark  # noqa: E402
from tools.probe_bpe_quality import eval_compression  # noqa: E402
from tools.probe_bpe_realistic import zipf_counts  # noqa: E402

KS = (None, 16384, 8192, 4096)  # None = full-table baseline


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bpe_topk.json"
    cuts = [c for c in (1024, 2048, 4096, 8192) if c <= num_merges]
    if not cuts or cuts[-1] != num_merges:
        cuts.append(num_merges)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    full = zipf_counts(spark).localCheckpoint(eager=True)
    result: dict = {"num_merges": num_merges, "n_words_full": full.count()}

    def flush():
        Path(out_path).write_text(json.dumps(result, indent=1))

    products: dict = {}
    for k in KS:
        name = "full" if k is None else f"top{k}"
        counts = (
            full
            if k is None
            else full.orderBy(F.col("n").desc(), F.col("word").asc())
            .limit(int(k))
            .localCheckpoint(eager=True)
        )
        stats: dict = {}
        t0 = time.time()
        merges = VB.learn_bpe_batched(
            counts, num_merges, min_pair_count=1, max_batch=64,
            stats=stats, select="independent",
        )
        wall = round(time.time() - t0, 1)
        arm = {
            "learn_wall_s": wall,
            "rounds": stats.get("rounds"),
            "n_merges": len(merges),
        }
        result[name] = arm
        flush()
        t0 = time.time()
        # compression ALWAYS on the full table — the corpus the
        # tokenizer actually ships against
        arm["compression_on_full"] = eval_compression(full, merges, cuts)
        arm["eval_wall_s"] = round(time.time() - t0, 1)
        products[name] = [a + b for a, b in merges]
        flush()
        print(
            f"[probe] {name}: learn {wall}s rounds={arm['rounds']} "
            f"compression {arm['compression_on_full']}",
            flush=True,
        )

    for k in KS:
        if k is None:
            continue
        name = f"top{k}"
        ov = {}
        for cut in cuts:
            sf_ = set(products["full"][:cut])
            sk = set(products[name][:cut])
            if sf_ and sk:
                ov[cut] = {
                    "jaccard": round(len(sf_ & sk) / len(sf_ | sk), 4),
                    "containment_of_full": round(len(sf_ & sk) / len(sf_), 4),
                }
        result[name]["overlap_vs_full"] = ov
    flush()
    print("[probe] done ->", out_path, flush=True)


if __name__ == "__main__":
    main()
