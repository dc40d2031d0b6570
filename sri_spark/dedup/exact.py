"""Exact deduplication (mandate item; the reference's only dedup is dim
drop_duplicates, SURVEY §2.5).

Hash-groupBy dedup: group documents by a content hash, keep the lowest id.
At 100 TB this is one shuffle on the (short) hash key with map-side partial
aggregation — never on the full text — and the md5 computation is
codegen'd JVM-side."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Whitespace-collapsed, lower-cased canonical form for near-exact dedup
    (same document modulo spacing/case)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    normalized: bool = False,
) -> DataFrame:
    """One row per distinct content: (content_hash, keep_id, n_copies).
    Survivor = minimum id (deterministic)."""
    content = F.col(text_col)
    if normalized:
        content = normalize_text(content)
    return (
        df.select(F.md5(content).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )
