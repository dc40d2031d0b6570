"""Streaming distribution-drift monitor.

The batch catalog has the offline pieces (stats_ks_two_sample,
embeddings_drift_check, text_source_jsd); this is the ONLINE shape: a
windowed value histogram maintained incrementally by Structured Streaming,
scored against a fixed reference distribution inside ``foreachBatch``, with
the per-window Jensen-Shannon divergence and binned-KS gap written to a
parquet sink. This is how a 100 TB ingest pipeline notices that today's
data stopped looking like the data the filters/models were tuned on —
without ever re-scanning history.

Design mirrors the repo's other streaming jobs: the histogram
transformation is ONE DataFrame function applied identically to batch and
stream (the batch twin is the test oracle), state is bounded at
(windows-in-watermark x n_bins) rows, and the sink write is an idempotent
overwrite keyed by window so retries/replays cannot double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BINS = 20
LO, HI = 0.0, 500.0  # the events fixture's value domain


def windowed_value_histogram(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (event-time window, bin) counts over `value` with fixed bin
    edges — fixed, because the REFERENCE defines the binning and both
    sides of a drift comparison must share it. Works unchanged on batch
    and streaming inputs (withWatermark is a no-op in batch)."""
    width = (HI - LO) / N_BINS
    b = F.greatest(
        F.lit(0),
        F.least(
            F.floor((F.col("value") - F.lit(LO)) / F.lit(width)).cast("int"),
            F.lit(N_BINS - 1),
        ),
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), b.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w").start.alias("window_start"),
            "bin",
            F.col("n").cast("long").alias("n"),
        )
    )


def reference_histogram(events: DataFrame) -> list[tuple[int, float]]:
    """Smoothed reference distribution [(bin, q)] over all N_BINS bins,
    built from a (historical) batch — add-one smoothing so JSD never
    divides by a zero reference mass."""
    hist = {
        r["bin"]: r["n"]
        for r in windowed_value_histogram(events)
        .groupBy("bin")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    total = sum(hist.values()) + N_BINS
    return [(b, (hist.get(b, 0) + 1) / total) for b in range(N_BINS)]


def drift_scores(hist: DataFrame, ref: list[tuple[int, float]]) -> DataFrame:
    """Per-window drift vs the reference: Jensen-Shannon divergence and
    the binned-KS max-ECDF gap. Starts from the full reference bin grid
    (broadcast, N_BINS rows per window) so bins the window never saw
    still contribute their reference mass; observed probabilities get the
    same add-one smoothing as the reference."""
    spark = hist.sparkSession
    ref_df = F.broadcast(
        spark.createDataFrame(ref, ["bin", "q"]).select(
            F.col("bin").cast("int").alias("bin"), "q"
        )
    )
    wins = hist.select("window_start").distinct()
    grid = wins.crossJoin(ref_df)  # windows x N_BINS — dimension-sized
    obs = (
        grid.join(hist, ["window_start", "bin"], "left")
        .select(
            "window_start", "bin", "q", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    tot = obs.groupBy("window_start").agg(
        (F.sum("n") + F.lit(N_BINS)).alias("tot")
    )
    p = (F.col("n") + 1) / F.col("tot")
    q = F.col("q")
    m = (p + q) / 2
    kl_term = lambda a, b_: F.when(  # noqa: E731
        a > 0, a * F.log2(a / b_)
    ).otherwise(F.lit(0.0))
    scored = obs.join(tot, "window_start").select(
        "window_start",
        "bin",
        ((kl_term(p, m) + kl_term(q, m)) / 2).alias("jsd_term"),
        p.alias("p"),
        q.alias("qq"),
    )
    from pyspark.sql import Window as W

    cum = W.partitionBy("window_start").orderBy("bin").rowsBetween(
        W.unboundedPreceding, 0
    )
    ks = scored.select(
        "window_start",
        "jsd_term",
        F.abs(F.sum("p").over(cum) - F.sum("qq").over(cum)).alias("gap"),
    )
    return ks.groupBy("window_start").agg(
        F.round(F.sum("jsd_term"), 6).alias("jsd"),
        F.round(F.max("gap"), 6).alias("ks_gap"),
    )


def run_drift_monitor_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    ref: list[tuple[int, float]],
) -> None:
    """TEST TWIN, not the production entry point — deploy
    ``run_drift_monitor_stream_update`` (aliased ``run_drift_monitor``)
    instead. This variant streams the events directory through the
    windowed histogram and scores each micro-batch's complete window set
    against `ref`, writing the per-window drift table to `sink_dir` as an
    idempotent overwrite.

    Output mode is `complete`, which means Spark retains aggregation
    state for EVERY window the stream has ever seen regardless of the
    watermark — state, per-batch recompute, and the overwritten sink all
    grow with the stream's total window count over its lifetime. It is
    kept because its keep-everything semantics make it the simplest
    batch-equals-stream oracle for bounded replays / finite availableNow
    runs (tests/test_streaming_drift.py); an unbounded 24/7 deployment
    must use the update-mode variant, whose watermark evicts closed
    windows and bounds state at (windows-in-watermark x n_bins)."""
    from sri_spark.streaming.jobs import read_events_stream

    stream = read_events_stream(spark, events_dir)
    hist = windowed_value_histogram(stream)

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            drift_scores(batch_df, ref)
            .write.mode("overwrite")
            .parquet(sink_dir)
        )

    q = (
        hist.writeStream.foreachBatch(_score)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_drift_monitor_stream_update(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    sink_dir: str,
    ref: list[tuple[int, float]],
) -> None:
    """THE production entry point (aliased ``run_drift_monitor``) — the
    unbounded-deployment variant of run_drift_monitor_stream:
    `update` output mode + a MERGE-style idempotent sink, so streaming
    state really is bounded at (windows-in-watermark x n_bins) — the
    watermark evicts closed windows instead of `complete` mode's
    keep-everything semantics.

    Update mode delivers only the (window, bin) rows that changed in the
    micro-batch, which may be a SUBSET of a window's bins — scoring the
    batch rows alone would treat the missing bins as zero. So foreachBatch
    merges: for each touched window, keep the stored bins the batch did
    not update, overlay the batch's rows, rewrite ONLY those window
    partitions (dynamic partition overwrite), and re-score drift from the
    merged histogram. Replaying a batch reproduces identical partitions —
    idempotent by construction.

    Layout: `sink_dir/hist` (window-partitioned histogram store) and
    `sink_dir/scores` (window-partitioned drift table). Per batch the
    work is proportional to touched windows x n_bins — never to stream
    history."""
    from sri_spark.streaming.jobs import read_events_stream

    stream = read_events_stream(spark, events_dir)
    hist = windowed_value_histogram(stream)
    hist_dir = f"{sink_dir}/hist"
    scores_dir = f"{sink_dir}/scores"

    def _merge_and_score(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # key the store on an ISO STRING so every engine/tool reading the
        # directory names sees the same lexical key (the catalog's date
        # discipline). NOTE: Spark's partition-column type inference reads
        # the value back as TIMESTAMP anyway (verified empirically), so the
        # read below re-normalizes explicitly rather than leaning on
        # implicit string<->timestamp union coercion.
        batch_df = batch_df.withColumn(
            "window_start",
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss"),
        ).persist()
        touched = [
            r["window_start"]
            for r in batch_df.select("window_start").distinct().collect()
        ]
        from pyspark.errors import AnalysisException

        try:
            # filter FIRST on the raw partition column (partition pruning:
            # only touched window directories are listed/read), THEN force
            # the column back to the canonical ISO string — partition type
            # inference returns TIMESTAMP here, and the union/join with
            # batch_df's string key must not depend on coercion rules or
            # timezone handling. The cast is a no-op if inference is off.
            stored = (
                spark.read.parquet(hist_dir)
                .filter(F.col("window_start").isin(touched))
                .withColumn(
                    "window_start",
                    F.date_format(
                        F.col("window_start").cast("timestamp"),
                        "yyyy-MM-dd HH:mm:ss",
                    ),
                )
            )
            kept = stored.join(
                batch_df.select("window_start", "bin"),
                ["window_start", "bin"],
                "left_anti",
            )
            merged = kept.unionByName(batch_df)
        except AnalysisException:  # first batch only: store path missing
            # any OTHER read failure (corrupt footer, transient FS error)
            # must propagate — falling back to batch-only rows here would
            # silently REPLACE the touched windows' stored bins
            merged = batch_df
        # break the read-modify-overwrite cycle EXPLICITLY: localCheckpoint
        # materializes the merged frame and severs its lineage to hist_dir
        # before the dynamic overwrite commits, so no task retry or
        # cache-block loss can ever re-plan a scan of the store mid-rewrite
        # (a plain persist only makes that ordering likely, not guaranteed).
        # A lost checkpoint block fails the batch; availableNow + the
        # checkpointed offsets replay it, and the partition overwrite is
        # idempotent, so the failure mode is a retry, not corruption.
        merged = merged.localCheckpoint(eager=True)
        (
            merged.repartition("window_start")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(hist_dir)
        )
        (
            drift_scores(merged, ref)
            .repartition("window_start")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start")
            .parquet(scores_dir)
        )
        batch_df.unpersist()  # checkpoint blocks are freed by the
        # ContextCleaner once `merged` goes out of scope

    q = (
        hist.writeStream.foreachBatch(_merge_and_score)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# The name deployments should reach for: bounded state, idempotent
# merge sink. The `complete`-mode twin above exists for tests/replays.
run_drift_monitor = run_drift_monitor_stream_update
