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
  partition-local positions + per-partition offsets (a tiny driver-side
  cumulative sum over partition counts, not a data collect). Keys are dense
  1..N and deterministic given a deterministic input partitioning+order.

r14 rewrite of the scalable form, motivated by the 100x ETL replay's
per-stage attribution (docs/ETL_STAGE_ATTRIB_r14.json): the old
`row_number() OVER (PARTITION BY spark_partition_id())` forced an Exchange
hashpartitioning(pid) — a FULL data-sized shuffle of the wide input (one of
the fact leg's four ~7 GiB exchanges) — purely to compute a row's position
within the partition it was ALREADY in. `monotonically_increasing_id()`
encodes exactly that position for free: its layout is
`(partition_id << 33) | row_index`, so `mid & (2^33 - 1)` IS the 0-based
partition-local position, evaluated as a projection with no exchange, no
window, no sort. (Upper bound: 2^33 ≈ 8.6B rows per partition — far above
any sane task size; the id layout is a documented stable contract of the
function.)

`input_ordered=True` additionally skips the internal
repartitionByRange+sortWithinPartitions when the CALLER guarantees the
frame is already partition-ordered by `order_by` — i.e. partitions form
ascending ranges of the ordering key and rows within each partition are
ascending. Two provable sources of that layout exist in this repo:
a frame freshly stamped by `source.with_src_id` and ranked by that id
(monotonically_increasing_id is ascending over (partition, row) BY
CONSTRUCTION), and `repartitionByRange(k).sortWithinPartitions(k)` done
upstream (e.g. fused with dim_vehiculo's dedup). In that mode the input is
also NOT persisted here: the rank is deterministic given the (cached)
upstream layout, so the offsets job and the final plan may each read the
cache instead of writing a second data-sized cache of the wide rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id packs the 0-based row position within a
# partition into the low 33 bits (partition id in the high bits)
_MID_ROW_MASK = (1 << 33) - 1


def add_surrogate_key(
    df: DataFrame, key_name: str, order_by: list[Column | str]
) -> DataFrame:
    """Dense 1..N key via row_number() over an explicit total order."""
    w = Window.orderBy(*order_by)
    return df.withColumn(key_name, F.row_number().over(w).cast("long"))


def add_surrogate_key_scalable(
    df: DataFrame,
    key_name: str,
    order_by: list[Column | str] | None = None,
    *,
    input_ordered: bool = False,
) -> DataFrame:
    """Dense 1..N key without a global sort.

    Phase 1: range-partition + sort within partitions by `order_by` (a
    deterministic global order without a single-partition shuffle) —
    skipped with `input_ordered=True` when the caller already guarantees
    that layout (see module docstring).
    Phase 2: partition-local 0-based positions decoded from
    `monotonically_increasing_id` (a pure projection — no window, no
    exchange) + per-partition row-count offsets (one tiny collect of a
    row per partition, not data).

    Key VALUES are identical to `add_surrogate_key` over the same total
    order: rank in partition-range order + within-partition sorted order
    = global rank.
    """
    if order_by and not input_ordered:
        df = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)

    mid = F.monotonically_increasing_id()
    with_local = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        # 1-based position of the row within its partition, decoded from
        # the id layout — replaces a row_number window whose
        # hashpartitioning(__pid) exchange moved every (wide) row (r14)
        "__local_rn",
        (mid.bitwiseAND(F.lit(_MID_ROW_MASK)) + F.lit(1)).cast("long"),
    )
    if not input_ordered:
        # persist so the count-per-partition action and the final plan see
        # the same partitioning (the range shuffle above is re-sampled per
        # materialization); input_ordered callers read a deterministic
        # cached upstream instead, so no second data-sized cache is built
        from sri_spark.operators.caching import scoped_persist

        with_local = scoped_persist(with_local)
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
