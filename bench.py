"""Benchmark harness: headline suite queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01...": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the `noop` sink (full computation,
no collect/driver transfer), after one warmup of the first query to
amortize JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ironman_medallion_lakehouse_spark import suite  # noqa: E402
from ironman_medallion_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per heavyweight operator family (scan+agg, broadcast
# join, star join, self-join, window-over-agg, window argmax, top-k) plus
# the extension operators that define the engine's training-data surface
# (minhash-LSH dedup, cosine top-k, language ID, sessionization).
HEADLINE = [
    "q01_pricing_summary",
    "q04_star_join",
    "q05_yoy_self_join",
    "q10_window_share",
    "q11_dedup_rank",
    "q12_argmax_latest",
    "q26_formatted_topk",
    "q66_shipping_priority",
    "q83_dedup_groups",
    "q45_cosine_topk",
    "q47_text_battery",
    "q52_sessionization",
]


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qdict = suite.queries()
    names = [n for n in HEADLINE if n in qdict]

    _run(qdict[names[0]](spark, SF_DIR))  # warmup

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        _run(qdict[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "suite_headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
