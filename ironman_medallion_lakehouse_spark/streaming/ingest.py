"""Streaming ingest into the lakehouse: readStream → foreachBatch →
TableStore merge.

Beyond-reference extension (the reference lands batch files only —
SURVEY §2.9): the canonical continuous-bronze pattern. A file-source
stream (Kafka at scale — same plan downstream of the source) feeds
``foreachBatch``, and each micro-batch MERGEs into a manifest-versioned
TableStore table:

- ``merge_insert_only`` per batch gives **idempotent** ingest: a
  replayed micro-batch (restart between sink write and checkpoint
  commit — Structured Streaming's at-least-once foreachBatch contract)
  re-offers the same keys and the anti-join drops them, upgrading the
  path to exactly-once table state.
- Each batch commit is one TableStore version, so the table's CDC feed
  (``table_changes``) doubles as the stream's downstream change log.

``streaming_dedup`` is the in-stream companion: watermark-bounded
drop-duplicates so late replays of the same event_id never reach the
sink, with state expiring past the watermark instead of growing
forever.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.sources.tablestore import ConcurrentCommitError


def streaming_merge_into(
    spark,
    store,
    source_path: str,
    schema,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    commit_retries: int = 5,
    partition_by: list[str] | None = None,
):
    """File-source stream merged continuously into a TableStore table.

    Returns the streaming query; caller drives it (processAllAvailable
    for tests, awaitTermination in production). The checkpoint dir must
    be a durable shared path at scale (it holds source offsets — the
    replay cursor).

    ``partition_by`` sets the layout when the FIRST micro-batch creates
    the table (r2 ADVICE: without it the target was born unpartitioned
    and every later batch inherited that); existing tables keep their
    recorded layout."""

    def _merge_batch(batch_df, batch_id: int) -> None:
        # foreachBatch may replay a batch after restart; insert-only
        # merge on the natural key makes the replay a no-op.
        #
        # A concurrent writer (another stream, an OPTIMIZE) can win the
        # put-if-absent commit race; merge_insert_only re-reads the
        # latest manifest on entry, so losing the race is safely
        # retryable — without this, the first real conflict would kill
        # the whole streaming query.
        for attempt in range(commit_retries + 1):
            try:
                store.merge_insert_only(
                    batch_df, table, keys=keys, partition_by=partition_by
                )
                return
            except ConcurrentCommitError:
                if attempt == commit_retries:
                    raise

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_dedup_ingest(
    spark,
    store,
    source_path: str,
    schema,
    checkpoint_dir: str,
    corpus_table: str = "corpus.documents",
    sig_table: str = "corpus.doc_signatures",
    hash_table: str = "corpus.doc_hashes",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 128,
    bands: int = 16,
    threshold: float = 0.9,
    commit_retries: int = 5,
    benchmark=None,
    decontaminate_n: int = 8,
    drift_reference=None,
    drift_signal=None,
    drift_max_d: float = 0.2,
    drift_table: str = "corpus.refused_batches",
    drift_test: str = "ks",
    drift_psi_edges: list[float] | None = None,
    drift_max_psi: float = 0.25,
):
    """The streaming crawl-ingest GATE — the training-data pipeline's
    front door, composed from this repo's own operators: every
    micro-batch is classified against the EXISTING corpus
    (operators/dedup.dedup_incoming: exact normalized-hash match +
    MinHash-LSH near-dup), only ``kept`` documents are admitted via an
    exactly-once insert-only merge, and their MinHash signatures AND
    normalized-text md5 hashes are merged into companion tables in the
    same batch — so every later batch reads precomputed corpus
    signatures (``corpus_sigs=``) and hashes (``corpus_hashes=``)
    instead of re-hashing the corpus on either arm. Per-batch cost:
    O(batch) signature/hash work + O(bucket hits) join, independent
    of corpus size (true for BOTH arms since the r7 stored-hash fix —
    before it, the exact arm re-md5'd the whole corpus per batch).

    Exactly-once state: foreachBatch may replay a batch after restart;
    a replayed document is then an exact dup of itself in the corpus,
    classifies ``exact_dup``, and both merges are key-idempotent — the
    table state converges either way. Intra-batch near-duplicates are
    deliberately NOT resolved here (both admitted if neither matches
    the corpus); run ``near_dedup_groups`` over the corpus for
    periodic retro-compaction — the gate's job is bounding per-batch
    work, the batch's own dups are one batch's worth by definition.

    ``benchmark`` (optional) adds the DECONTAMINATION arm (q99's
    8-gram collision test) in front of dedup: a static frame of
    held-out eval documents whose distinct n-gram hashes are computed
    ONCE at stream start (eval sets are static; re-shingling them per
    batch would be corpus-independent but still wasteful) and
    broadcast into each batch — any crawl doc sharing an n-gram with
    the benchmark is rejected before it can enter the corpus. This is
    the production ordering: leaking eval data into the corpus is
    unrecoverable downstream, so the gate refuses it at the door.

    ``drift_reference`` (optional) adds the DISTRIBUTION-DRIFT arm
    (q142's two-sample KS test) in front of everything: a static
    reference frame of docs (e.g. a sample of the accepted corpus)
    whose ``drift_signal`` values (default: document length — the
    classic batch screen; pass any Column over the doc row, e.g. a
    quality score) define the expected distribution. Each micro-batch's
    signal distribution is KS-tested against it; if the exact D
    statistic exceeds ``drift_max_d`` the WHOLE batch is refused and a
    quarantine row (batch_id, d_stat, ks_stat, n rows) is merged into
    ``drift_table`` for operator review — a scraper regression or a
    source-mix flip shows up as a distribution jump long before any
    per-document filter fires, and admitting such a batch silently
    shifts the training mixture. Batch-idempotent like the other arms:
    a replayed refused batch recomputes the same D and re-merges the
    same keyed quarantine row. Cost: one groupBy over the batch +
    reference signal values (the q142 pre-aggregated shape — the
    serial section is the distinct-value domain).

    ``drift_test`` picks the screen: ``"ks"`` (exact two-sample KS,
    above), ``"psi"`` (Population Stability Index over the fixed
    ``drift_psi_edges`` literal bins, refusing when psi >
    ``drift_max_psi`` — the q142 battery's binned arm; it has NO
    serial section at all, the better fit when the signal is genuinely
    high-cardinality continuous, at the price of choosing bins up
    front), or ``"kll"`` (the fully sketched form: the reference side
    is collapsed ONCE at stream start to a KLL quantile grid and its
    raw values never touched again — per-batch cost is the batch's own
    sketch aggregate, and the D̂ threshold is compared like KS's exact
    D with the sketch's ~0.02 error band in mind). Quarantine rows:
    PSI (batch_id, n_docs, psi); KLL (batch_id, n_docs, d_kll).

    Returns the streaming query; caller drives it."""
    from ironman_medallion_lakehouse_spark.operators import contamination as CO
    from ironman_medallion_lakehouse_spark.operators import dedup as D
    from ironman_medallion_lakehouse_spark.operators.experiment import (
        kll_quantile_grid,
        ks_kll_from_grids,
        ks_two_sample,
        psi_drift,
    )

    if drift_test not in ("ks", "psi", "kll"):
        raise ValueError(
            f"drift_test must be 'ks', 'psi' or 'kll', got {drift_test!r}"
        )
    if drift_test == "psi" and drift_reference is not None and not drift_psi_edges:
        raise ValueError("drift_test='psi' requires drift_psi_edges")

    bench_grams = None
    if benchmark is not None:
        bench_grams = (
            CO.positional_ngram_hashes(benchmark, decontaminate_n, text_col, id_col)
            .select("gram")
            .distinct()
            .localCheckpoint(eager=True)
        )

    signal = (
        F.length(F.col(text_col)) if drift_signal is None else drift_signal
    )
    ref_vals = None
    ref_grid = None
    if drift_reference is not None and drift_test == "kll":
        # the sketched reference: one grid row, values never re-read
        ref_grid = kll_quantile_grid(
            drift_reference.select(signal.cast("double").alias("_sig")), "_sig"
        )
    elif drift_reference is not None:
        # reference signal values computed ONCE at stream start (the
        # reference sample is static; the bench_grams precedent)
        ref_vals = (
            drift_reference.select(
                signal.cast("double").alias("_sig"), F.lit("ref").alias("_side")
            )
            .localCheckpoint(eager=True)
        )

    def _retrying(fn) -> None:
        for attempt in range(commit_retries + 1):
            try:
                fn()
                return
            except ConcurrentCommitError:
                if attempt == commit_retries:
                    raise

    def _gate_batch(batch_df, batch_id: int) -> None:
        batch_df = batch_df.dropDuplicates([id_col])
        if ref_grid is not None:
            cur = kll_quantile_grid(
                batch_df.select(signal.cast("double").alias("_sig")), "_sig"
            )
            rows = ks_kll_from_grids(ref_grid, cur).collect()
            r = rows[0] if rows else None  # null d (empty batch) -> admit
            if r is not None and r.d_kll is not None and r.d_kll > drift_max_d:
                refused = batch_df.sparkSession.createDataFrame(
                    [(int(batch_id), int(batch_df.count()), float(r.d_kll))],
                    "batch_id long, n_docs long, d_kll double",
                )
                _retrying(
                    lambda: store.merge_insert_only(
                        refused, drift_table, keys=["batch_id"]
                    )
                )
                return  # whole batch quarantined; nothing admitted
        if ref_vals is not None:
            both = batch_df.select(
                signal.cast("double").alias("_sig"), F.lit("new").alias("_side")
            ).unionByName(ref_vals)
            refused = None
            if drift_test == "psi":
                rows = psi_drift(
                    both, "_sig", "_side", "new", "ref", bin_edges=drift_psi_edges
                ).collect()
                r = rows[0] if rows else None  # empty batch -> no test, admit
                if (
                    r is not None
                    and r.n_a > 0
                    and r.psi is not None
                    and r.psi > drift_max_psi
                ):
                    refused = batch_df.sparkSession.createDataFrame(
                        [(int(batch_id), int(r.n_a), float(r.psi))],
                        "batch_id long, n_docs long, psi double",
                    )
            else:
                rows = ks_two_sample(both, "_sig", "_side", "new", "ref").collect()
                ks = rows[0] if rows else None  # empty batch -> no test, admit
                if (
                    ks is not None
                    and ks.n_a > 0
                    and ks.d_stat is not None
                    and ks.d_stat > drift_max_d
                ):
                    refused = batch_df.sparkSession.createDataFrame(
                        [
                            (
                                int(batch_id),
                                int(ks.n_a),
                                float(ks.d_stat),
                                float(ks.ks_stat),
                            )
                        ],
                        "batch_id long, n_docs long, d_stat double, ks_stat double",
                    )
            if refused is not None:
                _retrying(
                    lambda: store.merge_insert_only(
                        refused, drift_table, keys=["batch_id"]
                    )
                )
                return  # whole batch quarantined; nothing admitted
        if bench_grams is not None:
            dirty = (
                CO.positional_ngram_hashes(
                    batch_df, decontaminate_n, text_col, id_col
                )
                .join(F.broadcast(bench_grams), "gram", "left_semi")
                .select(id_col)
                .distinct()
            )
            batch_df = batch_df.join(dirty, id_col, "left_anti")
        batch_df = batch_df.localCheckpoint(eager=True)
        if store.table_exists(corpus_table):
            corpus = store.read(corpus_table).select(id_col, text_col)
            corpus_sigs = store.read(sig_table)
            # stored exact-hash table: without it the exact arm would
            # re-md5 the WHOLE corpus every batch (r7 fix — the
            # O(batch) claim was false for that arm at scale)
            corpus_hashes = (
                store.read(hash_table) if store.table_exists(hash_table) else None
            )
            status = D.dedup_incoming(
                batch_df.select(id_col, text_col),
                corpus,
                text_col,
                id_col,
                k=k,
                bands=bands,
                threshold=threshold,
                corpus_sigs=corpus_sigs,
                corpus_hashes=corpus_hashes,
            )
            kept = batch_df.join(
                status.filter(F.col("status") == "kept").select(id_col), id_col
            )
        else:
            kept = batch_df  # bootstrap batch founds the corpus
        kept = kept.localCheckpoint(eager=True)  # read by both merges below
        _retrying(lambda: store.merge_insert_only(kept, corpus_table, keys=[id_col]))
        sigs = D.minhash_signatures(kept, text_col, id_col, k=k)
        _retrying(lambda: store.merge_insert_only(sigs, sig_table, keys=[id_col]))
        hashes = D.exact_hash_frame(kept, text_col, id_col)
        _retrying(lambda: store.merge_insert_only(hashes, hash_table, keys=[id_col]))

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    return (
        stream.writeStream.foreachBatch(_gate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def streaming_dedup(
    spark,
    source_path: str,
    schema,
    keys: list[str],
    event_time: str = "ts",
    watermark: str = "2 hours",
    sink_name: str = "dedup_sink",
):
    """Watermarked streaming deduplication: only the first arrival of
    each key tuple within the watermark horizon is emitted; the
    key-tracking state is dropped once the watermark passes it, so
    state size is O(keys per horizon), not O(stream).

    Returns (query, sink_name) over a memory sink (append mode — dedup
    emits each survivor exactly once)."""
    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    deduped = stream.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        keys
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .start()
    )
    return query, sink_name


def streaming_index_ingest(
    spark,
    index,
    source_path: str,
    schema,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    drift_reference=None,
    drift_min_cosine: float = 0.98,
    drift_log: list | None = None,
):
    """Stream embedding batches into a materialized IVF index
    (operators/similarity.IvfIndex) — the ANN-index twin of
    ``streaming_dedup_ingest``: each micro-batch is assigned against
    the FROZEN codebook and insert-only-merged into the
    cell-partitioned assignment table via ``IvfIndex.add`` (O(touched
    cells) per batch, key-idempotent on replay — exactly-once table
    state under foreachBatch's replay semantics). The index must be
    ``build``-t before the stream starts (the codebook is the static
    side); ``rebuild`` periodically when probe recall degrades.

    ``drift_reference`` (optional) adds the EMBEDDING-DRIFT arm — the
    representation-space twin of the document gate's KS/PSI screens:
    each batch's mean-embedding cosine against a static reference
    sample (operators/similarity.embedding_mean_drift; the reference
    side's per-dimension sums are computed once at stream start) must
    stay ≥ ``drift_min_cosine`` or the WHOLE batch is skipped — a
    changed upstream encoder or a topical source flip would otherwise
    pollute the index with vectors the frozen codebook partitions
    badly (recall silently degrades; this refuses at the door
    instead). Skips are recorded as (batch_id, n, mean_cosine,
    norm_ratio) in ``drift_log`` (caller-owned; replay recomputes the
    same decision — idempotent).

    Returns the streaming query; caller drives it."""
    from ironman_medallion_lakehouse_spark.operators.similarity import (
        embedding_mean_drift,
    )

    ref = (
        drift_reference.select(vec_col).localCheckpoint(eager=True)
        if drift_reference is not None
        else None
    )

    def _add_batch(batch_df, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([id_col]).select(id_col, vec_col)
        if batch.isEmpty():
            return
        if ref is not None:
            rows = embedding_mean_drift(ref, batch, vec_col=vec_col).collect()
            r = rows[0] if rows else None
            if (
                r is not None
                and r.mean_cosine is not None
                and r.mean_cosine < drift_min_cosine
            ):
                if drift_log is not None:
                    drift_log.append(
                        (int(batch_id), int(r.n_cur), r.mean_cosine, r.norm_ratio)
                    )
                return  # whole batch refused; index untouched
        index.add(batch, id_col=id_col, vec_col=vec_col)

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    return (
        stream.writeStream.foreachBatch(_add_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )


def two_sided_cusum(
    series,
    t_col: str,
    x_col: str,
    baseline_n: int = 10,
    k_sd: float = 0.5,
    h_sd: float = 4.0,
):
    """TWO-SIDED Page chart over an ordered (t, x) series — the batch
    kernel ``streaming_volume_monitor`` runs per micro-batch, exposed
    so the same code path is driver-attestable on a static series
    (VERDICT r8 directive 6; q142's ``volmon_*`` arms). Upper chart =
    ``experiment.cusum_changepoint`` on the series; lower chart = the
    upper chart on the REFLECTED series (x → −x, baseline parameters
    re-estimated on the reflection — the textbook
    S⁻ = max(0, S⁻ + mu − k − x) identity). Each side estimates its
    params from its own first ``baseline_n`` points. ONE row:

        (n_points, up_smax, up_alarm_t, down_smax, down_alarm_t)

    alarm_t NULL when that side never crosses its decision interval.
    Cost: two chart passes over a horizon-sized series (one row per
    time point / micro-batch) — bounded regardless of data volume."""
    from ironman_medallion_lakehouse_spark.operators.experiment import (
        cusum_changepoint,
        series_params,
    )

    def _params(s):
        return series_params(
            s, t_col, x_col, baseline_n=baseline_n, k_sd=k_sd, h_sd=h_sd
        )

    up = cusum_changepoint(series, t_col, x_col, _params(series)).select(
        "n_points",
        F.col("s_max").alias("up_smax"),
        F.col("alarm_t").alias("up_alarm_t"),
    )
    refl = series.select(
        F.col(t_col), (-F.col(x_col)).cast("double").alias(x_col)
    )
    down = cusum_changepoint(refl, t_col, x_col, _params(refl)).select(
        F.col("s_max").alias("down_smax"),
        F.col("alarm_t").alias("down_alarm_t"),
    )
    return up.crossJoin(F.broadcast(down))


def streaming_volume_monitor(
    spark,
    store,
    source_path: str,
    schema,
    checkpoint_dir: str,
    volume_table: str = "monitor.batch_volumes",
    alerts_table: str = "monitor.volume_alerts",
    baseline_n: int = 10,
    k_sd: float = 0.5,
    h_sd: float = 4.0,
    chart: str = "cusum",
    commit_retries: int = 5,
):
    """SEQUENTIAL level-shift monitor over per-batch ingest volume —
    the control-chart complement of the two-sample drift gates: KS/PSI
    ask "does THIS batch's distribution match the reference?", this
    asks "has the batch-volume LEVEL shifted, and at which batch?" —
    the screen that catches a scraper losing a source (volume drops)
    or double-fetching (volume jumps) even when each individual
    batch's content distribution still looks fine.

    Per micro-batch: merge ONE (batch_id, n_docs) row into
    ``volume_table`` (keyed by batch_id — replay-idempotent), then run
    the chart over the accumulated series with baseline parameters
    from its first ``baseline_n`` points (``series_params``). While
    the baseline is still forming (≤ baseline_n points) no chart runs.
    ``chart="cusum"`` runs Page's chart TWO-SIDED — the upper chart on
    the series and the lower chart as the upper chart on the REFLECTED
    series (x → −x, params re-estimated on the reflection: the
    textbook S⁻ = max(0, S⁻ + mu − k − x) identity) — so both a
    volume jump (double-fetch) and a volume drop (lost source) fire;
    ``chart="ewma"`` is two-sided by construction (|E − mu| limit).
    When a chart alarms, ONE alert row

        (side, alarm_t, alarm_batch_id, stat, n_points)

    is merged into ``alerts_table`` keyed by (side, alarm_t) with side
    ∈ {'up', 'down'} (CUSUM) or 'both' (EWMA) — the FIRST crossing
    index is stable while a shift persists, so a standing alarm
    re-merges the same row instead of spamming one per batch
    (replay-idempotent for the same reason), and because the merge is
    insert-only the row FREEZES the chart state at first crossing:
    ``stat`` carries s_max (CUSUM, the alarming side's) or ewma_last
    (EWMA) as of that batch, and ``n_points`` says how long the series
    was — re-running the chart over the first ``n_points`` recorded
    batches reproduces ``stat`` exactly.

    This is a MONITOR, not a gate: batches are never refused (a volume
    shift means "page the operator", not "the data is bad" — refuse
    content with the drift gates). Cost: the series is ONE ROW PER
    MICRO-BATCH (horizon-sized by construction — hours of batches, not
    data), so the chart's ordered pass is bounded regardless of data
    volume; per-batch overhead is one count + one tiny merge + one
    chart job over the volume table.

    Returns the streaming query; caller drives it."""
    from ironman_medallion_lakehouse_spark.operators.experiment import (
        ewma_control,
        series_params,
    )

    if chart not in ("cusum", "ewma"):
        raise ValueError(f"chart must be 'cusum' or 'ewma', got {chart!r}")

    def _retrying(fn) -> None:
        for attempt in range(commit_retries + 1):
            try:
                fn()
                return
            except ConcurrentCommitError:
                if attempt == commit_retries:
                    raise

    def _monitor_batch(batch_df, batch_id: int) -> None:
        n = batch_df.count()
        row = batch_df.sparkSession.createDataFrame(
            [(int(batch_id), int(n))], "batch_id long, n_docs long"
        )
        _retrying(
            lambda: store.merge_insert_only(row, volume_table, keys=["batch_id"])
        )
        series = store.read(volume_table).select("batch_id", "n_docs")
        n_series = series.count()
        if n_series <= int(baseline_n):
            return  # baseline still forming
        # the series is horizon-sized (one row per micro-batch) —
        # materialize once for the param/chart passes below
        series = series.localCheckpoint(eager=True)

        def _params(s):
            return series_params(
                s, "batch_id", "n_docs", baseline_n=baseline_n, k_sd=k_sd, h_sd=h_sd
            )

        alarms = []  # (side, alarm_t, stat, n_points)
        if chart == "cusum":
            # both sides in one attestable kernel (two_sided_cusum —
            # the lower chart is the upper chart on the reflection)
            r = next(
                iter(
                    two_sided_cusum(
                        series,
                        "batch_id",
                        "n_docs",
                        baseline_n=baseline_n,
                        k_sd=k_sd,
                        h_sd=h_sd,
                    ).collect()
                ),
                None,
            )
            if r is not None and r.up_alarm_t is not None:
                alarms.append(("up", r.up_alarm_t, r.up_smax, r.n_points))
            if r is not None and r.down_alarm_t is not None:
                alarms.append(("down", r.down_alarm_t, r.down_smax, r.n_points))
        else:
            r = next(
                iter(
                    ewma_control(
                        series,
                        "batch_id",
                        "n_docs",
                        _params(series),
                        # already counted for the baseline check —
                        # keeps the chart lazy (no extra per-batch job)
                        n_points=n_series,
                    ).collect()
                ),
                None,
            )
            if r is not None and r.alarm_t is not None:
                alarms.append(("both", r.alarm_t, r.ewma_last, r.n_points))
        if not alarms:
            return
        # resolve the 1-based alarm indexes to actual batch ids (one
        # tiny job over the horizon-sized series)
        from pyspark.sql import Window

        idx = {
            int(row["_t"]): int(row["batch_id"])
            for row in series.withColumn(
                # bounded-serial: one row per micro-batch (horizon-sized series)
                "_t", F.row_number().over(Window.orderBy("batch_id"))
            )
            .filter(F.col("_t").isin([int(t) for _, t, _, _ in alarms]))
            .collect()
        }
        alert = batch_df.sparkSession.createDataFrame(
            [
                (side, int(t), idx.get(int(t)), float(stat), int(np))
                for side, t, stat, np in alarms
            ],
            "side string, alarm_t long, alarm_batch_id long,"
            " stat double, n_points long",
        )
        _retrying(
            lambda: store.merge_insert_only(
                alert, alerts_table, keys=["side", "alarm_t"]
            )
        )

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    return (
        stream.writeStream.foreachBatch(_monitor_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
