"""Surrogate-key generation (SURVEY §2.4 K1).

The reference assigns sequential 1..N surrogate keys by in-memory row order
(reference `dags/sri_vehiculos_etl_dag.py:70,161,245,534`). Row order is not a
meaningful concept for a distributed DataFrame, so the engine's determinism
contract is: **surrogate keys are 1..N in the total order of an explicit,
caller-supplied ordering key** (for dims: the natural key; for the calendar:
the date).

Two implementations:

- `add_surrogate_key` — `row_number()` over a global `Window.orderBy(...)`.
  Exact and simple, but a global-sort single partition; right for dimension
  tables (≤ a few million rows), wrong for a 100 TB fact.
- `add_surrogate_key_scalable` — sort-free two-phase ranking for huge inputs:
  partition-local `row_number` + per-partition offsets (a tiny driver-side
  cumulative sum over partition counts, not a data collect). Keys are dense
  1..N and deterministic given a deterministic input partitioning+order; at
  scale prefer ordering only within partitions (sortWithinPartitions) to avoid
  any global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame, key_name: str, order_by: list[Column | str]
) -> DataFrame:
    """Dense 1..N key via row_number() over an explicit total order."""
    w = Window.orderBy(*order_by)
    return df.withColumn(key_name, F.row_number().over(w).cast("long"))


def add_surrogate_key_scalable(
    df: DataFrame, key_name: str, order_by: list[Column | str] | None = None
) -> DataFrame:
    """Dense 1..N key without a global sort.

    Phase 1: optionally range-partition + sort within partitions by `order_by`
    (gives a deterministic global order without a single-partition shuffle).
    Phase 2: partition-local row_number + per-partition row-count offsets.

    The only driver-side data is one row count per partition. The
    intermediate stays persisted for the lifetime of the returned plan (the
    final DataFrame reads it); callers looping over many inputs in one
    session should checkpoint/materialize the result and clear the cache.
    """
    if order_by:
        df = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)

    spid = F.spark_partition_id()
    w_local = Window.partitionBy(spid).orderBy(F.monotonically_increasing_id())
    # persist so the count-per-partition action and the final plan see the same
    # partitioning (monotonically_increasing_id is only stable per-materialization)
    from sri_spark.operators.caching import scoped_persist

    with_local = scoped_persist(
        df.withColumn("__pid", spid).withColumn(
            "__local_rn", F.row_number().over(w_local).cast("long")
        )
    )
    # one row per partition — tiny collect, not data
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_local.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    # broadcast-join the per-partition offsets: O(1) expression depth (a
    # when/otherwise chain here would grow with the partition count and blow
    # codegen limits at exactly the scale this function targets)
    offsets_df = with_local.sparkSession.createDataFrame(
        offsets, "__pid int, __offset long"
    )
    return (
        with_local.join(F.broadcast(offsets_df), "__pid")
        .withColumn(key_name, F.col("__local_rn") + F.col("__offset"))
        .drop("__pid", "__local_rn", "__offset")
    )
