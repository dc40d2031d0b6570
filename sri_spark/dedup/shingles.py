"""Word n-gram shingling shared by the Jaccard and MinHash dedup paths.

Narrow per-row generate (explode) — the only wide operation downstream is
whatever the consumer groups/joins on. Documents shorter than n tokens
produce no shingles (they can only be exact-duplicates)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sri_spark.text.analysis import tokens_col


def shingles_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs; shingle = n consecutive tokens joined
    with spaces."""
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") >= n
    )
    idx = F.explode(F.sequence(F.lit(1), F.size("__toks") - (n - 1))).alias("__i")
    return (
        toks.select(id_col, "__toks", idx)
        .select(
            id_col,
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__i"), n)).alias("shingle"),
        )
        .distinct()
    )
