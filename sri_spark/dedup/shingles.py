"""Word n-gram shingling shared by the Jaccard and MinHash dedup paths.

Fully NARROW: shingles are built, hashed, and deduplicated per document with
array expressions (`transform` + `array_distinct`) before the explode, so
producing the distinct (id, shingle) set costs ZERO shuffles — dedup is
per-document by definition, and a `DataFrame.distinct()` here would shuffle
the entire shingle multiset for nothing. The only wide operations are
whatever the consumer groups/joins on. Documents shorter than n tokens
produce no shingles (they can only be exact-duplicates)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sri_spark.text.analysis import tokens_col


def _shingle_array(n: int, value) -> Column:
    """Array of per-doc-distinct shingle values over the `__toks` column;
    `value(shingle_string_col) -> Column` maps each shingle string."""
    arr = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - (n - 1)),
        lambda i: value(F.concat_ws(" ", F.slice(F.col("__toks"), i, n))),
    )
    return F.array_distinct(arr)


def shingles_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs; shingle = n consecutive tokens joined
    with spaces."""
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") >= n
    )
    return toks.select(
        id_col, F.explode(_shingle_array(n, lambda s: s)).alias("shingle")
    )


def shingle_hashes_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    *,
    hasher: str = "md5",
) -> DataFrame:
    """Distinct (id, shingle_h) pairs; shingle_h = a 60/64-bit hash of the
    shingle string.

    This is the scale variant the join-heavy dedup paths use: the hash is
    computed BEFORE per-doc dedup, so everything downstream — the Jaccard
    self-join, the MinHash aggregate — moves 8-byte longs instead of ~n-word
    strings. Equal to joining/grouping on the string modulo hash collisions
    (~|shingles|²/2^60, negligible below ~10^8 distinct shingles per corpus;
    the cross-engine oracles verify the end results empirically).

    `hasher` picks the hash family:

    - ``'md5'`` (default): 60-bit md5 prefix — cross-engine reproducible
      (DuckDB computes the identical value), so every oracle-checked
      catalog query uses it. Costs ~35% of the shingle-build time.
    - ``'xxhash64'``: Spark's native codegen hash — ~1.6x faster shingle
      builds, same collision behavior for dedup purposes, but NOT
      reproducible outside the JVM. The production fast path when no
      cross-engine verification is in the loop; set-similarity RESULTS
      (pair sets, Jaccard values) are identical under either hasher
      whenever neither collides (tests assert this on fixtures)."""
    if hasher == "md5":
        from sri_spark.functions.hashing import md5_int as hash_fn
    elif hasher == "xxhash64":
        hash_fn = F.xxhash64
    else:
        raise ValueError(f"hasher must be 'md5' or 'xxhash64', got {hasher!r}")

    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")).filter(
        F.size("__toks") >= n
    )
    return toks.select(
        id_col, F.explode(_shingle_array(n, hash_fn)).alias("shingle_h")
    )
