"""Sequence packing for LLM pretraining pipelines: concat-and-chop.

Pretraining consumes a corpus as one long token stream sliced into
fixed-size context windows. The batch form of that operator is an
EXCLUSIVE PREFIX SUM of per-document token counts in a deterministic
document order: `offset` = tokens before the document in the stream,
`seq_id` = offset div budget (the window the document starts in),
`straddles` = whether it crosses into the next window.

A naive `Window.orderBy(order_col)` prefix sum funnels the whole corpus
through ONE partition — the global-sort bottleneck. This implements the
scalable two-phase shape (same pattern as operators/keys.py surrogate
keys): range-partition by the order column, per-partition prefix sums,
then a tiny per-partition total collected to the driver and broadcast back
as offsets. Driver traffic is one row per partition, never data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sri_spark.operators.caching import scoped_persist


def exclusive_prefix_sum(
    df: DataFrame, value_col: str, order_col: str, *, out_col: str = "offset"
) -> DataFrame:
    """df + `out_col` = sum of `value_col` over all rows strictly before the
    row in `order_col` order. `order_col` values must be unique (they define
    the total order; ties would make the result partitioning-dependent)."""
    part = df.repartitionByRange(order_col).sortWithinPartitions(order_col)
    spid = F.spark_partition_id()
    w_local = (
        Window.partitionBy(spid)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = scoped_persist(
        part.withColumn("__pid", spid).withColumn(
            "__incl", F.sum(value_col).over(w_local)
        )
    )
    # one row per partition: (pid, total) — metadata, not data
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.sum(value_col).alias("t")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __part_off long")
    return (
        local.join(F.broadcast(off_df), "__pid")
        .withColumn(
            out_col, (F.col("__part_off") + F.col("__incl") - F.col(value_col))
        )
        .drop("__pid", "__incl", "__part_off")
    )


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
    budget: int = 512,
) -> DataFrame:
    """Assign every document its position in the chopped token stream:
    adds `offset` (exclusive prefix sum of `token_col` in `order_col`
    order), `seq_id` (context window the document starts in) and
    `straddles` (true when the document spills into the next window)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    with_off = exclusive_prefix_sum(df, token_col, order_col)
    end_tok = F.col("offset") + F.greatest(F.col(token_col), F.lit(1)) - 1
    return (
        with_off.withColumn("__end_tok", end_tok)
        .withColumn("seq_id", F.expr(f"offset div {budget}"))
        .withColumn(
            "straddles", F.expr(f"__end_tok div {budget}") != F.col("seq_id")
        )
        .drop("__end_tok")
    )
