"""Distributed EXACT median (quantile_cont(0.5)-equivalent) without a
global sort or a value-map aggregate.

Why this exists (round 12): Spark's exact `percentile` aggregate buffers
a value→count hash map PER MAP TASK — 2.4M mostly-distinct doubles OOM'd
a plain 1 GiB session — and the row_number-over-global-window alternative
funnels every row through ONE sort task, which the driver-contract sweep
session (hundreds of prior queries' memory pressure) also failed to give
pages to. Both are anti-patterns at 100 TB for the same reason: they
concentrate the full value set in one place.

The selection here is the classic two-phase histogram median:

1. one pass computes (min, max, n) — a scalar aggregate;
2. one pass buckets every value by RANGE into `buckets` cells and counts
   them — a map-side-combined aggregate whose shuffle is `buckets` rows;
3. driver-free bucket bookkeeping (a window over <= `buckets` rows) finds
   which cell(s) contain the two central order statistics lo = ⌊(n+1)/2⌋
   and hi = ⌊(n+2)/2⌋;
4. only the rows of those cells (expected n/buckets of the data) are
   sorted, per-bucket, and the global positions are recovered as
   cumulative-count-before-bucket + rank-in-bucket. Equal values always
   land in the same bucket (the bucket is a function of the value), so
   ranks never straddle a boundary tie.

Every phase is bounded: the wide shuffles carry `buckets` rows, the only
sort touches ~n/buckets rows, and nothing holds the value set in memory.
The median itself is the average of the lo/hi order statistics —
bit-identical to DuckDB's quantile_cont(0.5) interpolation, which is what
the catalog oracles compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_median_1row(
    df: DataFrame, col: str, out: str, *, buckets: int = 1024
) -> DataFrame:
    """1-row frame (<out>,) holding the exact median of `df[col]`.

    NULLs are ignored (SQL aggregate semantics); an empty/all-NULL input
    yields a 1-row frame with a NULL median. The result column is the
    only output column, so callers can crossJoin it as a scalar (the
    repo's provable-1-row broadcast pattern — every aggregate here is
    keys=[], which the plan advisor accepts as a BNLJ build side)."""
    vals = df.filter(F.col(col).isNotNull()).select(F.col(col).alias("__v"))
    rng = vals.agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count("*").alias("__n"),
    )
    # bucket id: 0..buckets-1 by value range; constant column (mx == mn)
    # collapses to bucket 0. The id is a pure function of the VALUE, so
    # equal values share a bucket and cross-bucket rank ties cannot occur.
    width_ok = F.col("__mx") > F.col("__mn")
    bid = F.when(
        width_ok,
        F.least(
            F.floor(
                (F.col("__v") - F.col("__mn"))
                / (F.col("__mx") - F.col("__mn"))
                * buckets
            ).cast("long"),
            F.lit(buckets - 1).cast("long"),
        ),
    ).otherwise(F.lit(0).cast("long"))
    bucketed = vals.crossJoin(rng).select("__v", bid.alias("__b"))
    counts = bucketed.groupBy("__b").agg(F.count("*").alias("__c"))
    # cumulative count BEFORE each bucket: a window over <= `buckets` rows
    cum = counts.withColumn(
        "__before",
        F.coalesce(
            F.sum("__c").over(
                Window.orderBy("__b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    # the two central 1-based positions; lo == hi when n is odd
    lo = F.expr("(__n + 1) div 2")
    hi = F.expr("(__n + 2) div 2")
    targets = (
        cum.crossJoin(rng)
        # a constant (or single-value, or empty) column short-circuits:
        # targets goes empty, no bucket is ever sorted, and the final
        # projection answers from __mn directly — otherwise an all-tied
        # input would funnel every row into bucket 0's sort again
        .filter(width_ok)
        .filter(
            ((lo > F.col("__before")) & (lo <= F.col("__before") + F.col("__c")))
            | ((hi > F.col("__before")) & (hi <= F.col("__before") + F.col("__c")))
        )
        .select("__b", "__before", "__n")
    )
    # sort ONLY the target bucket(s): ~n/buckets rows, per-bucket windows
    sliced = bucketed.join(targets, "__b")
    ranked = sliced.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__b").orderBy("__v")),
    ).withColumn("__pos", F.col("__before") + F.col("__rn"))
    picked = ranked.filter(
        (F.col("__pos") == F.expr("(__n + 1) div 2"))
        | (F.col("__pos") == F.expr("(__n + 2) div 2"))
    )
    general = picked.agg(F.avg("__v").alias("__med_g"))
    # empty -> NULL; constant/single-value -> __mn; else the order stats
    return rng.crossJoin(general).select(
        F.when(F.col("__n") == 0, F.lit(None).cast("double"))
        .when(~width_ok, F.col("__mn").cast("double"))
        .otherwise(F.col("__med_g"))
        .alias(out)
    )
