"""Incremental (streaming) MinHash-LSH near-duplicate detection.

A training-corpus ingest pipeline must answer, for every NEW document,
"is this a near-duplicate of anything already ingested?" without
re-scanning the corpus. Batch LSH (dedup/minhash.py) compares a corpus
against itself; this job maintains the band-bucket index ACROSS
micro-batches, so each batch only joins its own buckets against the
accumulated index — per-batch cost is O(batch buckets + collisions), never
O(corpus).

State layout: the index is plain parquet partitioned by the micro-batch id
that wrote it (`<index>/batch_id=N/`). foreachBatch is at-least-once, so a
replayed batch OVERWRITES its own partition instead of appending
duplicates — the same idempotence discipline as
run_foreach_batch_merge_stream's staged publish, with partition dirs
standing in for the manifest. Candidate-pair output uses the identical
scheme (`<pairs>/batch_id=N/`).

Per micro-batch:
1. band buckets for the batch docs — the same fixed MinHash family as the
   batch operator (dedup/minhash.py MINHASH_COEFFS), so stream and batch
   agree bucket-for-bucket;
2. candidates = intra-batch bucket self-join + batch-vs-index join, both
   canonicalized to doc_a < doc_b and deduped;
3. write pairs, then the batch's index partition (pairs first: a crash
   between the writes replays into identical overwrites).

The output is the LSH CANDIDATE set — callers verify candidates with
exact Jaccard (dedup/jaccard.py) exactly as the batch pipeline layers it.
At 100 TB the index partitions are periodically compacted by bucket
(repartition on (band, bucket)) so the probe join prunes; the per-batch
logic is unchanged.

Additive mandate family (the reference has no streaming; its nearest
analogue is the daily full-reload DAG, dags/sri_vehiculos_etl_dag.py:30-39).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.dedup.minhash import _band_buckets, minhash_signatures


def _has_index(index_dir: str) -> bool:
    return os.path.isdir(index_dir) and any(
        e.startswith("batch_id=") for e in os.listdir(index_dir)
    )


def _canonical_pairs(left: DataFrame, right: DataFrame) -> DataFrame:
    """(doc_a < doc_b) pairs sharing a band bucket across the two frames."""
    l_ = left.select(
        F.col("doc_id").alias("__la"), "band", "bucket"
    )
    r_ = right.select(F.col("doc_id").alias("__lb"), "band", "bucket")
    return (
        l_.join(r_, ["band", "bucket"])
        .filter(F.col("__la") != F.col("__lb"))
        .select(
            F.least("__la", "__lb").alias("doc_a"),
            F.greatest("__la", "__lb").alias("doc_b"),
        )
        .distinct()
    )


def make_batch_handler(spark: SparkSession, index_dir: str, pairs_dir: str):
    """The per-micro-batch near-dup step, shared by the streaming job and
    the soak test (tests/test_streaming_near_dup.py) so the bound the test
    proves is the bound production runs: per batch, the index gains
    EXACTLY LSH_BANDS rows per new doc (one bucket row per band) and the
    probe join touches only (batch buckets x accumulated index) — cost
    O(batch + collisions), state O(corpus), never O(corpus^2)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        buckets = _band_buckets(
            minhash_signatures(batch.select("doc_id", "text")), "doc_id"
        ).persist()
        pairs = _canonical_pairs(buckets, buckets)
        if _has_index(index_dir):
            prev = spark.read.parquet(index_dir).select("doc_id", "band", "bucket")
            pairs = pairs.union(_canonical_pairs(buckets, prev)).distinct()
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_id={batch_id}")
        buckets.write.mode("overwrite").parquet(f"{index_dir}/batch_id={batch_id}")
        buckets.unpersist()

    return handle


def run_incremental_near_dup(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Drain every unprocessed docs file (availableNow), update the bucket
    index, and return the accumulated candidate-pair table. Restart-safe:
    rerunning with the same checkpoint skips processed files, and a
    replayed batch rewrites its own partitions byte-identically."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    handle = make_batch_handler(spark, index_dir, pairs_dir)
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(pairs_dir) or not os.listdir(pairs_dir):
        return spark.createDataFrame([], "doc_a long, doc_b long")
    return spark.read.parquet(pairs_dir).select("doc_a", "doc_b").distinct()


COMPACT_PARTITION = "batch_id=compacted"


def compact_near_dup_index(
    spark: SparkSession, index_dir: str, *, n_buckets: int = 32
) -> int:
    """Fold every batch partition of the bucket index into one
    bucket-clustered partition, so the per-batch probe join reads few
    well-organized files instead of one small file set per historical
    batch (the streaming small-files problem).

    Layout: rows repartition by (band, bucket) and sort within partitions,
    so each compacted file covers a contiguous bucket range and the probe
    join's scan prunes on footer stats — the same min/max-skipping
    argument as operators/layout.zorder_layout, applied to the index.

    Crash-safe swap, same discipline as the MERGE sink's staged publish
    (streaming/jobs.py): write to a staging dir, move the old partitions
    aside, rename staging in, delete the old last. The index is a pure
    function of the processed batches, so a crash mid-swap at worst leaves
    both old partitions and the compacted one — the probe join then
    counts duplicate bucket rows, which only ADDS candidate pairs
    (verified away by exact Jaccard downstream), never loses one; rerun
    compaction to converge. Returns rows compacted."""
    import shutil

    if not _has_index(index_dir):
        return 0
    parts = [e for e in os.listdir(index_dir) if e.startswith("batch_id=")]
    idx = spark.read.parquet(index_dir).select("doc_id", "band", "bucket")
    n = idx.count()
    staging = index_dir + ".compacting"
    shutil.rmtree(staging, ignore_errors=True)
    (
        idx.repartition(n_buckets, "band", "bucket")
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite")
        .parquet(os.path.join(staging, COMPACT_PARTITION))
    )
    old = index_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.makedirs(old)
    for e in parts:
        os.rename(os.path.join(index_dir, e), os.path.join(old, e))
    os.rename(
        os.path.join(staging, COMPACT_PARTITION),
        os.path.join(index_dir, COMPACT_PARTITION),
    )
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    return n
