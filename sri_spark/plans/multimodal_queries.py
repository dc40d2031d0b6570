"""Multimodal catalog query: binary asset-column inventory with an oracle.

The multimodal family (sri_spark/multimodal/binary.py: decode / resize /
frame-sample plumbing over opaque binary columns) is pytest-covered
because the fixture tables carry no binary columns and the decode step is
environment-dependent. This query closes the oracle gap for the
RELATIONAL half of that surface: it materializes a deterministic binary
asset per document (a tagged UTF-8 payload — the plumbing cares about
bytes, not pixels), and runs the inventory pass every asset pipeline
starts with — sizes, content-hash identity, per-source rollup — entirely
on the BinaryType column.

Cross-engine note: Spark's md5() accepts BINARY while DuckDB's accepts
only VARCHAR; both hash the same UTF-8 bytes here, so content ids agree
bit-for-bit. Sizes compare via Spark length(binary) == DuckDB
octet_length(encode(...)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

_TAG = "IMG0"
_LARGE_BYTES = 300


@register(
    "multimodal_asset_inventory",
    f"""
    WITH assets AS (
      SELECT source,
             octet_length(encode('{_TAG}' || text)) AS size_bytes,
             md5('{_TAG}' || text) AS content_id
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_assets,
           CAST(count(DISTINCT content_id) AS BIGINT) AS n_unique_assets,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           CAST(max(size_bytes) AS BIGINT) AS max_bytes,
           CAST(sum(CASE WHEN size_bytes > {_LARGE_BYTES} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_large
    FROM assets GROUP BY source
    """,
)
def multimodal_asset_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset inventory per source: asset count, content-hash-distinct
    count (exact-dup assets collapse), byte totals, and an oversize flag —
    computed ON a BinaryType column (encode -> length/md5 stay JVM-side;
    the bytes never reach Python). At 100 TB this is the manifest scan that
    sizes a decode fleet before any Pandas-UDF decoding runs; dedup by
    content id is the multimodal twin of dedup_exact."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.concat(F.lit(_TAG), F.col("text")), "UTF-8")
    assets = docs.select(
        "source",
        F.length(blob).alias("size_bytes"),
        F.md5(blob).alias("content_id"),
    )
    return assets.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.countDistinct("content_id").alias("n_unique_assets"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
        F.max("size_bytes").cast("long").alias("max_bytes"),
        F.sum(F.when(F.col("size_bytes") > _LARGE_BYTES, 1).otherwise(0))
        .cast("long")
        .alias("n_large"),
    )
