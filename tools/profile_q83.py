"""Stage-level timing for q83 (VERDICT r4 item 2: reconcile the
claimed 8.7 s with the measured 19 s). Each stage is forced with its
own localCheckpoint so the wall time attributes to ONE stage; the
total therefore slightly overstates the fused pipeline (extra
materializations) but localizes the cost.

Run on an otherwise-idle box:  python tools/profile_q83.py [sf_dir] [factor]

``factor`` > 1 replicates the corpus with the scale probe's
token-salted replicator (disjoint corpora, preserved internal
near-dup structure) and stages the CONTRACTED pipeline exactly as
``near_dedup_groups`` runs it — the tool for localizing which stage
moves when the 8x end-to-end number swings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ironman_medallion_lakehouse_spark.session import get_spark, load_tables  # noqa: E402
from ironman_medallion_lakehouse_spark.operators import dedup as D  # noqa: E402
from ironman_medallion_lakehouse_spark.operators.graph import (  # noqa: E402
    dedup_groups_from_pairs,
)
from ironman_medallion_lakehouse_spark import suite_extensions as SE  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark()
    t0 = time.perf_counter()
    t = load_tables(spark, sf_dir, "documents")
    docs = t["documents"]
    if factor > 1:
        from tools.scale_probe import _replicate_docs

        docs = _replicate_docs(docs, factor).localCheckpoint(eager=True)
    n_docs = docs.count()
    print(f"load+count {n_docs} docs (factor {factor}): {time.perf_counter() - t0:.2f}s")

    def stage(name, df):
        t0 = time.perf_counter()
        out = df.localCheckpoint(eager=True)
        n = out.count()
        print(f"{name}: {time.perf_counter() - t0:.2f}s rows={n}")
        return out

    for run in ("cold", "warm"):
        print(f"--- {run} ---")
        t_all = time.perf_counter()
        doc_rep = stage("set_contraction", D._set_rep_map(docs, "text", "doc_id"))
        rep_docs = docs.join(
            doc_rep.filter(D.F.col("doc_id") == D.F.col("_rep")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        sigs = stage("signatures", D.minhash_signatures(rep_docs, k=SE._LSH_K))
        cand = stage(
            "lsh_band_join",
            D.lsh_candidate_pairs(sigs, k=SE._LSH_K, bands=SE._Q83_BANDS),
        )
        agree = stage(
            "agreement_filter",
            D.sig_agreement_filter(
                cand, sigs,
                min_fraction=SE._Q83_MIN_AGREE,
                components=SE._Q83_AGREE_COMPONENTS,
            ),
        )
        pairs = stage(
            "jaccard_refine",
            D.jaccard_refine(
                agree, rep_docs, threshold=SE._Q83_THRESHOLD, hashed_tokens=True
            ),
        )
        t0 = time.perf_counter()
        out = dedup_groups_from_pairs(rep_docs, pairs)
        n = out.count()
        print(f"connected_components+assign: {time.perf_counter() - t0:.2f}s rows={n}")
        print(f"TOTAL (staged): {time.perf_counter() - t_all:.2f}s")

    # fused form, exactly as the suite entry runs it
    for i in range(2):
        t0 = time.perf_counter()
        n = SE.q83_dedup_groups(spark, sf_dir).count()
        print(f"fused q83 run {i}: {time.perf_counter() - t0:.2f}s rows={n}")


if __name__ == "__main__":
    main()
