"""Dump per-query formatted physical plans for the r15 OPTIMIZATION
round evidence files: plans/r15/<query>_<tag>.txt (tag = before/after).

Usage: python tools/dump_plans_r15.py <before|after> [query ...]
Defaults to every bench HEADLINE query.

ADVICE r14: the r14 dumper's ``hasattr(df, "queryExecution")`` branch
was dead code (PySpark DataFrames have no queryExecution method) —
this one calls ``df._jdf.queryExecution()`` directly, the same path
``DataFrame.explain`` uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from ironman_medallion_lakehouse_spark import suite  # noqa: E402
from ironman_medallion_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-r15-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qdict = suite.queries()
    for name in names:
        df = qdict[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan.rstrip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
