"""Bucketed table writers — co-located joins without a shuffle.

At 100 TB the biggest recurring cost is re-shuffling the fact table for
every join on its natural key (e.g. lineitem ⋈ orders on orderkey). Writing
both sides bucketed by that key with the same bucket count lets Spark plan a
sort-merge join with NO Exchange on either side: each task reads matching
bucket files directly.

Bucketing requires the table catalog (`saveAsTable`) — plain `.parquet()`
paths don't carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
) -> None:
    """Save as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)

