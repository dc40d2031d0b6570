"""Z-order (Morton) write layout: cluster a table on two dimensions so
min/max file skipping prunes rectangle predicates.

`layout_zorder_pruning` (plans/sketch_queries.py) MEASURES how much a
Z-layout would prune; this operator WRITES it: interleave the two key
columns' bits into a Morton value, range-partition on it (a range exchange
— Spark samples split points, no single-partition sort), sort within each
partition, and write one file per partition. Every parquet footer then
carries tight min/max ranges on both source columns, which any min/max-
stats-aware reader (Spark parquet filter pushdown, Delta/Iceberg file
skipping) uses to skip files wholesale.

The same recipe is how Delta OPTIMIZE ZORDER BY and Iceberg's z-ordering
rewrite lay files out; here it is a plain DataFrame transform with no
table-format dependency.

Additive mandate family (reference analogue: BigQuery clustering keys
declared at config/variables.yaml:31-36, which the reference never wires
up in code).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 8


def morton_interleave(x: Column, y: Column, *, bits: int = ZORDER_BITS) -> Column:
    """Morton/Z-value of two non-negative ints: bit i of x lands at bit 2i,
    bit i of y at 2i+1. Inputs are masked to `bits` low bits (callers
    bucket/quantize first — raw 64-bit keys would need 128 result bits)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    n_files: int = 64,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Return `df` re-laid-out for a Z-ordered write: range-partitioned and
    partition-sorted by the Morton value of (x_col, y_col). Write with
    `.write.parquet(...)` — one file per partition, each covering a compact
    Z-range (a small rectangle neighbourhood of the key space).

    Shuffle shape: ONE range exchange (sampled split points, parallel
    sort-within-partition) — never a global ORDER BY into a single task.
    `bits` bounds the Morton domain; pass pre-bucketed columns
    (`pmod(key, 2^bits)`, day index, etc.)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    zval = morton_interleave(x, y, bits=bits)
    return (
        df.withColumn("__zval", zval)
        .repartitionByRange(n_files, F.col("__zval"))
        .sortWithinPartitions("__zval")
        .drop("__zval")
    )
