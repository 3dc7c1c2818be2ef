"""Benchmark harness: headline suite queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q01...": sec, ...}, "sf": 0.1, "detail": {...}}

Protocol (pinned in r5 — VERDICT r4 item 3: round-over-round deltas
were unreadable because each query was timed on its FIRST execution,
so the number mixed plan cost with one-time codegen/JIT compilation
and box contention):

- Each query gets its own untimed warmup execution, then
  ``SPARK_GRAFT_BENCH_RUNS`` (default 2) timed executions; the
  reported figure is the MINIMUM — the best observation is the one
  closest to the plan's intrinsic cost on a shared box.
- Every execution is forced end-to-end with the `noop` sink (full
  computation, no collect/driver transfer).
- Between queries, all persistent RDD blocks (localCheckpoint
  residue from iterative operators) are dropped and a JVM GC is
  requested, so no query's storage pressure leaks into the next.
- ``detail`` records per-query: every timed run's seconds (spread =
  contention visibility), and job/stage/task counts from the final
  timed run (a structural fingerprint — if the task count jumps
  between rounds, the PLAN changed; if seconds jump while tasks hold,
  the BOX changed).
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
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))  # r6: box spikes of 1.4-2.4x observed; min-of-3 recovers the intrinsic figure

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
    # r5 additions (appended so the classic subset stays comparable
    # across rounds): lexical ranking + incremental crawl-batch dedup
    "q91_bm25_topk",
    "q94_incremental_dedup",
    # r6: q94's production path — corpus signatures precomputed/stored,
    # so the timed runs measure only the per-batch cost (VERDICT r5
    # item 3: the 5.9 s / 1.7×-spread q94 figure was dominated by the
    # corpus signature bootstrap production amortizes away)
    "q94b_incremental_dedup_prepared",
    # r5 continuation: cross-doc duplicate spans, PQ-ADC ANN, funnel
    "q100_dup_span_coverage",
    "q102_pq_adc_ann",
    "q104_conversion_funnel",
    # r5 third session: iterative graph, learned mixture tilt, JL sketch
    "q106_pagerank",
    "q107_dsir_importance",
    "q110_jl_projection",
    # r7: the two shapes whose data-sized serial sections were removed
    # (VERDICT r6 items 3-4) — tracked so a regression back to a
    # single-partition sort shows up as a task-count/time jump
    "q125_abc_analysis",
    "q142_ks_drift",
    # r7 continuation: q142 now times the full drift battery (exact KS
    # + PSI + the KLL sketch arm — task fingerprint reset expected);
    # q143's A/B battery is dominated by the R=32 Poisson bootstrap,
    # the one new compute-bound-linear shape worth tracking
    "q143_ab_test_battery",
    # r8: the batched BPE learner end-to-end (word-count pass + the
    # multi-merge driver rounds) — the one iterative-driver-loop shape
    # in the suite; tracks the jobs-per-merge dial's wall-clock side
    "q144_bpe_learn",
    # r9: the sequential-chart battery split out of q142 when it
    # crossed the ~5 s threshold (q142's fingerprint resets — expected)
    "q145_sequential_charts",
    # r11: the end-to-end curation pipeline (gate → near-dup → mixture
    # → chunk → pack) — the composite the package exists for; appended
    # so the prior 26-entry subset stays comparable across rounds
    "q153_curation_pipeline",
]


# Battery entries get per-arm attribution in BENCH_DETAIL (VERDICT r8
# directive 2: batteries are the designated dumping grounds, so the
# headline number must come with an arm split). Each arm frame is
# timed separately (warm + one timed run) on top of the shared
# localCheckpoint'ed bases the arm-frames builder materializes.
BATTERY_ARMS = {
    "q142_ks_drift": "_q142_arm_frames",
    "q143_ab_test_battery": "_q143_arm_frames",
    "q145_sequential_charts": "_q145_arm_frames",
}

# Iterative operators that run with AQE ON re-plan per iteration at
# runtime, so their TASK count wobbles with AQE's partition coalescing
# (r10: q106 jobs/stages pinned 61/94 while tasks read 118 → 99 on an
# identical plan). For these entries the structural fingerprint is
# jobs+stages ONLY — a box-noise adjudication must not treat a task
# drift as a plan change (VERDICT r10 directive 6). Recorded per-entry
# in the detail sidecar as ``fp_compare``.
#
# r12 (VERDICT r11 directive 6): q153 joins the set — the curation
# composite runs behind localCheckpoint barriers like q106, so AQE
# re-plans each post-barrier stage group at runtime and the task
# count wobbles with coalescing (driver r11 read 717 tasks vs the
# quiet-box 751 at the IDENTICAL 45/65 jobs+stages fingerprint). A
# task drift at unchanged jobs+stages is box/AQE noise, not a plan
# change; jobs/stages moving still re-opens the audit.
#
# r13 (ADVICE r12): dropping tasks from the comparison entirely left a
# blind spot — a real partitioning regression that manifests only as a
# task-count change would be adjudicated as AQE noise. Each entry now
# carries an ADVISORY quiet-box task band (generous: observed readings
# ± ~30%); a reading outside the band sets ``task_band_warn`` in the
# detail sidecar (warn-not-fail — AQE wobble stays non-blocking, but
# the next round's audit sees the flag and re-reads the plan).
# Observed quiet-box readings: q106 99–118 tasks (r10), q153 717–751
# (r11/r12) at stable jobs+stages.
AQE_ITERATIVE = {
    "q106_pagerank": (70, 155),
    "q153_curation_pipeline": (500, 980),
}

# r13: q107's STAGE count is AQE-variable too — measured bistable on
# byte-identical code (consecutive standalone runs read 24/272 and
# 25/273 stages/tasks; the in-suite r12→r13 readings span 23/138 →
# 24/171), because its token-stream exchange is sometimes reused and
# sometimes re-materialized under AQE's runtime stats. Jobs are pinned
# (11) — that is the hard fingerprint; stages+tasks get an advisory
# band like the iterative entries (same warn-not-fail contract).
#
# r14 (ADVICE r13): one lax 100–350 task band made a real partitioning
# regression warn-invisible across most of the range. The wobble is
# BIMODAL, not uniform — exchange REUSED (in-suite readings 138–171)
# vs RE-MATERIALIZED (standalone 272–273) — so the acceptance is now
# two tight sub-bands around the measured modes (~±20%); a reading
# BETWEEN the modes (e.g. 220) or outside both is exactly the
# can't-be-AQE-noise signal the audit wants flagged.
AQE_VARIABLE = {
    # name -> ((stage_lo, stage_hi), [(task_lo, task_hi), ...] — any)
    "q107_dsir_importance": ((22, 27), [(115, 205), (230, 320)]),
}


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _drop_persistent_blocks(spark) -> None:
    """Unpersist every persistent RDD (localCheckpoint residue) and ask
    the JVM for a GC, so storage/GC pressure never crosses queries."""
    sc = spark.sparkContext
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    ids = []
    while it.hasNext():
        ids.append(it.next()._1())
    for rdd_id in ids:
        sc._jsc.sc().unpersistRDD(rdd_id, True)
    spark._jvm.System.gc()


def _group_counts(spark, group: str) -> dict:
    """Job/stage/task counts for one job group via the status tracker,
    plus (r15, VERDICT r14 item 5) the BOX-INSENSITIVE metrics: summed
    executor task time and shuffle bytes from the app status store.
    Wall seconds swing ±20-25 % with box state (adjudicated twice, r13
    and r14); sum-of-task-time divides that out for round-over-round
    comparison. Sidecar-only — the timed protocol and the stdout JSON
    line are unchanged."""
    st = spark.sparkContext.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    stage_ids = set()
    for j in jobs:
        info = st.getJobInfo(j)
        if info:
            stage_ids.update(info.stageIds)
    tasks = 0
    for s in stage_ids:
        si = st.getStageInfo(s)
        if si:
            tasks += si.numTasks
    out = {"jobs": len(jobs), "stages": len(stage_ids), "tasks": tasks}
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.ArrayList()
        darr = sc._gateway.new_array(sc._gateway.jvm.double, 0)
        run_ms = sr_b = sw_b = in_b = 0
        for s in stage_ids:
            it = store.stageData(s, False, empty, False, darr).iterator()
            while it.hasNext():
                sd = it.next()
                run_ms += sd.executorRunTime()
                sr_b += sd.shuffleReadBytes()
                sw_b += sd.shuffleWriteBytes()
                in_b += sd.inputBytes()
        out.update(
            {
                "task_time_ms": run_ms,
                "shuffle_read_b": sr_b,
                "shuffle_write_b": sw_b,
                "input_b": in_b,
            }
        )
    except Exception:  # noqa: BLE001 — metrics must never fail the bench
        pass
    return out


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qdict = suite.queries()
    names = [n for n in HEADLINE if n in qdict]
    if len(sys.argv) > 1:
        # ad-hoc subset run (same protocol); the sidecar detail file is
        # NOT overwritten so the full-suite fingerprint record survives
        unknown = [n for n in sys.argv[1:] if n not in qdict]
        if unknown:
            # a typo must not silently run a partial suite and print a
            # misleadingly small headline total (ADVICE r10)
            raise SystemExit(f"bench.py: unknown query name(s): {' '.join(unknown)}")
        names = list(sys.argv[1:])

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in names:
        _run(qdict[name](spark, SF_DIR))  # per-query warmup (untimed)
        _drop_persistent_blocks(spark)
        runs = []
        group = ""
        for i in range(RUNS):
            group = f"{name}#r{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.time()
            _run(qdict[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobGroup("", "")
            _drop_persistent_blocks(spark)
        timings[name] = min(runs)
        counts = _group_counts(spark, group)
        detail[name] = {
            "runs": runs,
            **counts,
            "fp_compare": (
                "jobs+stages"
                if name in AQE_ITERATIVE
                else ("jobs" if name in AQE_VARIABLE else "jobs+stages+tasks")
            ),
        }
        if name in AQE_ITERATIVE:
            lo, hi = AQE_ITERATIVE[name]
            detail[name]["task_band"] = [lo, hi]
            if not (lo <= counts["tasks"] <= hi):
                # advisory only (ADVICE r12): flag for the round audit,
                # never fail the bench
                detail[name]["task_band_warn"] = True
                print(
                    f"bench.py: {name} tasks={counts['tasks']} outside "
                    f"advisory quiet-box band [{lo}, {hi}] — re-read the "
                    "plan before adjudicating box noise",
                    file=sys.stderr,
                )
        elif name in AQE_VARIABLE:
            (slo, shi), tbands = AQE_VARIABLE[name]
            detail[name]["stage_band"] = [slo, shi]
            detail[name]["task_bands"] = [list(b) for b in tbands]
            # separate warn keys (ADVICE r13: a stage violation under
            # the old shared 'task_band_warn' name misled the sidecar)
            if not (slo <= counts["stages"] <= shi):
                detail[name]["stage_band_warn"] = True
            if not any(tlo <= counts["tasks"] <= thi for tlo, thi in tbands):
                detail[name]["task_band_warn"] = True
            if "stage_band_warn" in detail[name] or "task_band_warn" in detail[name]:
                print(
                    f"bench.py: {name} stages={counts['stages']}/"
                    f"tasks={counts['tasks']} outside advisory bands "
                    f"[{slo},{shi}]/{tbands} — re-read the plan "
                    "before adjudicating box noise",
                    file=sys.stderr,
                )
        if name in BATTERY_ARMS:
            import importlib

            mod = importlib.import_module(
                "ironman_medallion_lakehouse_spark.suite_analytics"
            )
            # NB: no block-dropping between arms — the arm frames hang
            # off localCheckpoint'ed bases whose lineage is truncated,
            # so unpersisting them mid-split would break the frames
            frames = getattr(mod, BATTERY_ARMS[name])(spark, SF_DIR)
            arm_s = {}
            for arm, adf in frames.items():
                _run(adf)  # warm
                arm_runs = []
                for _ in range(RUNS):  # same min-of-N protocol as
                    t0 = time.time()   # headline entries (ADVICE r9)
                    _run(adf)
                    arm_runs.append(time.time() - t0)
                arm_s[arm] = round(min(arm_runs), 3)
            detail[name]["arm_s"] = arm_s
            _drop_persistent_blocks(spark)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    # Per-run spreads + job/stage/task fingerprints go to a SIDECAR file,
    # not the stdout JSON line: r5's inline `detail` blob grew past the
    # driver's tail capture and truncated the line's FRONT, leaving
    # BENCH_r05.json with parsed:null (VERDICT r5 item 2). The compact
    # headline line is printed LAST so a tail capture always keeps it.
    here = os.path.dirname(os.path.abspath(__file__))
    if len(sys.argv) > 1:
        # subset run: detail to stderr, keep the full-suite sidecar
        print(json.dumps({"detail": detail}, indent=1), file=sys.stderr)
    else:
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
            json.dump(
                {
                    "sf": sf,
                    "runs_per_query": RUNS,
                    "protocol": (
                        f"per-query warmup + min of {RUNS} timed runs"
                        " (arms: same protocol)"
                    ),
                    "detail": detail,
                },
                fh,
                indent=1,
            )
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
