#!/usr/bin/env python3
"""VERDICT r10 directive 5: the BPE independent-mode DEFAULT decision.

``select='independent'`` is 22x faster at 1k merges but learns an
ORDER-PERMUTED (and possibly different) merge list vs the
serial-equivalent prefix mode. Before flipping any default, measure
whether the tokenizer the two modes ship is equivalent where it
matters — the artifact's quality, not its learning wall:

- **vocab overlap** at 8k merges: Jaccard + containment of the two
  merge-product sets (the subword vocabulary a tokenizer ships);
- **compression ratio** at 1k/2k/4k/8k cuts: corpus-weighted tokens
  per base symbol after applying each mode's merge list to the SAME
  realistic Zipf word-count table (50k md5-derived words, n ~ 1/rank
  — tools/probe_bpe_realistic.zipf_counts). Equal compression at
  equal vocab size = the two tokenizers do the same job.

Cut-point semantics: prefix mode is serial-equivalent, so its 8k
list's first-k prefix IS the serial k-merge list. Independent mode's
prefix equals a shorter run up to round granularity (~k=64 rounds) —
close enough for quality curves; noted in the output.

Usage: python tools/probe_bpe_quality.py [num_merges] [out.json]
Wall times here are incidental (the box may be busy); the QUALITY
numbers are the probe's product. Results go to SCALING.md.
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
from tools.probe_bpe_realistic import zipf_counts  # noqa: E402


def eval_compression(counts, merges: list, cuts: list[int]) -> dict:
    """Corpus-weighted compression at each cut: fold the merge list
    cumulatively (grouped non-interacting passes, checkpoint every 8
    merges — the apply_bpe contract) and read sum(n*|syms|) at each
    cut boundary. Returns {cut: tokens_per_base_symbol}."""
    v = counts.select(
        "word", "n", VB._initial_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    base = v.agg(F.sum(F.col("n") * F.size("syms"))).collect()[0][0]
    out = {}
    done = 0
    for cut in cuts:
        seg = merges[done : min(cut, len(merges))]
        since = 0
        for grp in VB._noninteracting_prefix_groups(seg):
            if len(grp) > 1:
                v = v.select(
                    "word", "n", VB._merge_fold_batch(F.col("syms"), grp).alias("syms")
                )
            else:
                a, b = grp[0]
                v = v.select(
                    "word", "n", VB._merge_fold(F.col("syms"), a, b).alias("syms")
                )
            since += len(grp)
            if since >= 8:
                v = v.localCheckpoint(eager=True)
                since = 0
        # checkpoint before the collect reads the fold chain
        v = v.localCheckpoint(eager=True)
        done = min(cut, len(merges))
        tot = v.agg(F.sum(F.col("n") * F.size("syms"))).collect()[0][0]
        out[done] = round(tot / base, 6)
        if done < cut:
            break
    return out


def main() -> None:
    num_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bpe_quality.json"
    cuts = [c for c in (1024, 2048, 4096, 8192) if c <= num_merges]
    if not cuts or cuts[-1] != num_merges:
        cuts.append(num_merges)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    counts = zipf_counts(spark).localCheckpoint(eager=True)
    result: dict = {"num_merges": num_merges, "n_words": counts.count()}

    def flush():
        Path(out_path).write_text(json.dumps(result, indent=1))

    # independent first: fast, so partial results exist early
    for select, max_batch in (("independent", 64), ("prefix", 32)):
        stats: dict = {}
        t0 = time.time()
        merges = VB.learn_bpe_batched(
            counts, num_merges, min_pair_count=1, max_batch=max_batch,
            stats=stats, select=select,
        )
        wall = round(time.time() - t0, 1)
        arm = {
            "learn_wall_s": wall,
            "rounds": stats.get("rounds"),
            "n_merges": len(merges),
        }
        result[select] = arm
        flush()
        t0 = time.time()
        arm["compression"] = eval_compression(counts, merges, cuts)
        arm["eval_wall_s"] = round(time.time() - t0, 1)
        arm["products"] = [a + b for a, b in merges]
        flush()
        print(f"[probe] {select}: learn {wall}s, compression {arm['compression']}",
              flush=True)

    for cut in cuts:
        sp = set(result["prefix"]["products"][:cut])
        si = set(result["independent"]["products"][:cut])
        result.setdefault("overlap", {})[cut] = {
            "jaccard": round(len(sp & si) / len(sp | si), 4),
            "containment_of_serial": round(len(sp & si) / len(sp), 4),
        }
    # products lists are large; keep only the overlap summary on disk
    for arm in ("prefix", "independent"):
        result[arm].pop("products")
    flush()
    print("[probe] done:", json.dumps(result["overlap"]), flush=True)


if __name__ == "__main__":
    main()
