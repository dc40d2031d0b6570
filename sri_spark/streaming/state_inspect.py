"""Streaming state inspection via the state data source (Spark 4).

A stateful streaming job's checkpoint holds THE production state — when a
pipeline misbehaves at 3am the question is always "what is actually in the
state store for this key?". The `statestore` / `state-metadata` readers
answer that offline, from the checkpoint alone, without touching the
running query: state rows come back as ordinary DataFrames, so the whole
relational toolbox (filters, joins against expected values, skew profiling)
applies to operator state.

Scale shape: the reader scans state shards per partition — the same
parallelism the job itself uses; the skew summary is one aggregate over
(partition_id), which is exactly how you find the hot key range that is
bloating one state partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Operator-level metadata for every stateful operator in the
    checkpoint: name, store, partition count, batch id range."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    *,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """Raw state rows (key struct, value struct, partition_id) for one
    operator, optionally pinned to a historical batch id — state time
    travel, the debugging superpower: diff state between two batches to
    see exactly what an incident's micro-batch changed."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint_dir)


def state_skew_summary(
    spark: SparkSession, checkpoint_dir: str, *, operator_id: int = 0
) -> DataFrame:
    """Per-state-partition row counts plus their share of the total —
    the state-store analogue of events_key_skew_profile: a partition
    holding an outsized share of state rows is the shard that will OOM
    first as the stream runs."""
    st = read_state(spark, checkpoint_dir, operator_id=operator_id)
    per = st.groupBy("partition_id").agg(F.count("*").alias("n_rows"))
    total = per.agg(F.sum("n_rows").alias("t"))
    return (
        per.join(F.broadcast(total))
        .select(
            "partition_id",
            "n_rows",
            F.round(F.col("n_rows") / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.desc("n_rows"), F.asc("partition_id"))
    )
