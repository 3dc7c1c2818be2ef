"""Physical-plan regression tests for the round-7 shapes (VERDICT r6
items 3-4): the single-partition serial sections the verdict flagged
must shrink to bounded inputs, and every remaining global-order window
in the suite must be documented."""

from __future__ import annotations

import re

from ironman_medallion_lakehouse_spark import suite

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _plan(spark, name: str) -> str:
    return _plan_of(suite.queries()[name](spark, SF))


def test_ks_window_runs_over_distinct_values(spark):
    """VERDICT r6 item 3: the KS global running-sum window must consume
    the per-distinct-value aggregate, not the raw observation rows —
    the groupBy(v) collapses rows AND absorbs ties, so exactly one
    Window node remains (the old shape had a second PARTITION BY v
    tie-absorption window over raw rows). Asserted on the operator
    itself (q142 grew PSI/KLL arms in r7c, so the ENTRY's plan now
    legitimately carries their extra scans)."""
    from ironman_medallion_lakehouse_spark.operators.experiment import ks_two_sample
    from ironman_medallion_lakehouse_spark.session import load_tables

    ev = load_tables(spark, SF, "events")["events"]
    plan = _plan_of(ks_two_sample(ev, "value", "event_type", "click", "view"))
    # exactly one Window node in the whole plan
    windows = re.findall(r"\(\d+\) Window\b", plan)
    assert len(windows) == 1, f"expected 1 Window node, plan has {len(windows)}"
    # a keyed hash aggregate on v sits below it (the pre-aggregation);
    # partial_sum proves map-side combine before the shuffle
    assert re.search(r"Keys \[1\]: \[v#\d+\]", plan), "groupBy(v) missing"
    assert "partial_sum" in plan, "pre-aggregation lost its partial phase"
    # the totals ride the same single-partition sort as full-frame
    # window sums — no crossJoin(broadcast(totals)) subtree duplication
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) == 1, f"pipeline evaluated {len(scans)} times"
    assert plan.count("SinglePartition") == 1
