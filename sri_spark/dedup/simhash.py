"""SimHash (32-bit) document fingerprints (mandate item).

Each token contributes its count-weighted ±1 vote to 32 bit positions of its
md5-derived 32-bit hash; the simhash sets bit i iff the weighted vote is
positive. Near-duplicates land at small Hamming distance; identical simhash
is the cheap blocking key used here.

Expression shape: one explode to (doc, token, count), then a single
hash-aggregate with 32 conditional sums — all codegen, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sri_spark.functions.hashing import md5_int
from sri_spark.text.analysis import tokens_col

SIMHASH_BITS = 32


def _token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = df.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("tok"))
    return toks.groupBy(id_col, "tok").agg(F.count("*").alias("cnt"))


def simhash_df(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash) with a 32-bit simhash as long."""
    tc = _token_counts(df, text_col, id_col).withColumn(
        "h", md5_int(F.col("tok"), 8)
    )
    weight_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"w{i}")
        for i in range(SIMHASH_BITS)
    ]
    weights = tc.groupBy(id_col).agg(*weight_aggs)
    sim: Column = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"w{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return weights.select(F.col(id_col), sim.alias("simhash"))


def simhash_col(text: Column) -> Column:  # pragma: no cover - thin wrapper
    raise NotImplementedError(
        "simhash needs token-count aggregation; use simhash_df on a DataFrame"
    )


def simhash_dup_groups(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate groups blocked on identical simhash: (simhash, keep_id,
    n_docs) for groups with >1 member."""
    sim = simhash_df(df, text_col=text_col, id_col=id_col)
    return (
        sim.groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )
