"""Readers for the driver-generated parquet fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

Parquet is the scan format, so Catalyst gets predicate pushdown, column
pruning and (on a real lake) partition pruning for free; readers here add
nothing eager.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # timestamp-bearing queries format wall-clock strings compared against a
    # timezone-naive DuckDB oracle — pin the session to UTC so results don't
    # depend on the caller's environment (runtime-settable, driver-safe)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # runtime-settable; required because the fixture stores timestamp[ns]
        # (works even when the caller owns the SparkSession, e.g. the driver)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize the events `ts` column to session-zoned TimestampType.

    The driver has regenerated the fixture with different physical types
    across rounds, so every reader funnels through this:
    - timestamp[ns] read under nanosAsLong → epoch-nanos long: truncate to
      microseconds with integer division (`div 1000`, not `/ 1000`: float
      division of an epoch-ns long loses precision past 2^53 and lands
      ~12% of values 1 µs off DuckDB's exact ns→µs truncation);
    - timestamp[us] with isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark 4:
      cast to the session-zoned type (session tz pinned to UTC) so epoch
      arithmetic (unix_micros) works and instants match DuckDB's naive
      reading;
    - already TimestampType → no-op.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so `spark.sql` queries run
    verbatim (SURVEY §7.1: every output is also reachable through SQL)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
