"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
configuration scales to a multi-executor cluster because nothing here depends
on local mode: AQE handles partition coalescing/skew at runtime, shuffle
partition counts come from config, and all operators in this package are
expressed declaratively (DataFrame/SQL) so Catalyst picks physical strategies.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "sri_spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Notes on scale: these settings are chosen to be correct at 100 TB, not just
    locally —
    - AQE on: runtime coalescing of small shuffle partitions, skew-join
      splitting (the reference's m:m fan-out joins are skew-prone, SURVEY §1.3 Q4).
    - Session timezone pinned to UTC so date/timestamp semantics are stable
      across driver/executor locales and match the DuckDB oracle.
    - Arrow enabled for the (rare) Pandas-UDF paths; every hot-path operator
      stays JVM-side.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the events fixture stores timestamp[ns]; read as long and convert in
        # the loader (Spark has no native nanosecond timestamp)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write µs-precision INT64 timestamps, not legacy INT96 (interops
        # cleanly with pyarrow/DuckDB readers and our own schema probes)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # long sessions (bench runs ~300 executions incl. a 46M-row star
        # build) accrete status-store state: plan graphs for 1000 SQL
        # executions and 100k task rows/stage are hundreds of MB of heap
        # that starve the build's hash maps — cap retention; the audits
        # scrape stage metrics right after each run, well inside these caps
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "20000")
        .config("spark.ui.retainedJobs", "200")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
