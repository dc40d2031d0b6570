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


def shingle_hashes_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle_h) pairs; shingle_h = md5_int of the shingle
    string (60-bit, cross-engine reproducible).

    This is the scale variant the join-heavy dedup paths use: the hash is
    computed BEFORE the distinct, so every downstream exchange — the
    distinct itself, the Jaccard self-join, the MinHash aggregate — moves
    8-byte longs instead of ~n-word strings. Equal to joining/grouping on
    the string modulo md5 collisions (~|shingles|²/2^60, negligible below
    ~10^8 distinct shingles per corpus; the cross-engine oracles verify the
    end results empirically)."""
    from sri_spark.functions.hashing import md5_int

    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") >= n
    )
    idx = F.explode(F.sequence(F.lit(1), F.size("__toks") - (n - 1))).alias("__i")
    return (
        toks.select(id_col, "__toks", idx)
        .select(
            id_col,
            md5_int(
                F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__i"), n))
            ).alias("shingle_h"),
        )
        .distinct()
    )
