"""Suite entries for event-sequence analytics: windowed conversion
funnels and retention cohorts (operators/funnel.py).

Determinism notes: outputs are timestamps, dates, and counts only —
no floating point anywhere, so both entries are hash-exact by
construction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ironman_medallion_lakehouse_spark.operators import funnel as FU
from ironman_medallion_lakehouse_spark.session import load_tables
from ironman_medallion_lakehouse_spark.suite import register

# ------------------------------------------------------ q104 funnel

_Q104_STAGES = ["view", "click", "purchase"]
_Q104_WINDOW = 86400  # 24 h per hop — a real 150/60/25 split at sf0.01


@register(
    "q104_conversion_funnel",
    oracle=f"""
    WITH s0 AS (
      SELECT user_id, MIN(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s1 AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click'
        AND e.ts > s0.t_view
        AND e.ts <= s0.t_view + INTERVAL {_Q104_WINDOW} SECOND
      GROUP BY e.user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s1.t_click
        AND e.ts <= s1.t_click + INTERVAL {_Q104_WINDOW} SECOND
      GROUP BY e.user_id
    )
    SELECT s0.user_id, s0.t_view, s1.t_click, s2.t_purchase
    FROM s0
    LEFT JOIN s1 ON s0.user_id = s1.user_id
    LEFT JOIN s2 ON s0.user_id = s2.user_id
    """,
)
def q104_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion funnel (operators/funnel.funnel_stages):
    per user, earliest view → earliest click within 24 h strictly after
    it → earliest purchase within 24 h after that; NULL once
    abandoned. The conversion window makes the funnel non-vacuous
    (without it a month of uniform events converts everyone; at 1 h
    nobody converts — 150/60/25 at 24 h on sf0.01). Plan: stage frames
    are user-cardinality and every shuffle hashes the same user_id
    key, so the stage joins share co-partitioning; the event stream
    is scanned per stage with the type filter pushed down, never
    sorted globally. Output is timestamps + ids only — hash-exact."""
    t = load_tables(spark, sf_dir, "events")
    return FU.funnel_stages(
        t["events"], _Q104_STAGES, window_seconds=_Q104_WINDOW
    )


# -------------------------------------------------- q105 retention

@register(
    "q105_retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id,
             date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM active a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q105_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/funnel.retention_cohorts):
    users bucketed by the ISO week of their first event, counted
    distinct in each week they were active; offset 0 row is the cohort
    size. Offsets are day-differences of week-truncated DATEs divided
    by 7 — exact integers, no week-epoch conventions to disagree on.
    Plan: one user-level min, one distinct (user, week) pre-
    aggregation (bounds the join input at users × active-weeks), one
    grouped count — all shuffles on user_id or the tiny cohort grid."""
    t = load_tables(spark, sf_dir, "events")
    return FU.retention_cohorts(t["events"])
