"""Time-series shaping operators over the event stream (mandate items —
no reference citations; the reference has no event/time-series surface):
gaps-and-islands run collapse and fixed-grid resampling with gap fill.

Both follow the events_queries contract: Spark orders windows by the
µs-truncated TimestampType while the DuckDB oracle orders by
epoch_us(ts) so sub-microsecond ordering can never diverge across
engines (see events_sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table


@register(
    "events_gaps_islands",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                            ROWS UNBOUNDED PRECEDING) AS run_seq
      FROM flagged
    )
    SELECT user_id, CAST(run_seq AS BIGINT) AS run_seq, event_type,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS run_end,
           count(*) AS n_events
    FROM runs
    GROUP BY user_id, run_seq, event_type
    """,
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse consecutive same-type events per user into
    runs with validity bounds — the change-capture / SCD-interval builder
    (lag-compare flags a change, the running sum numbers the island, one
    rollup per island). All windows partition by user_id: per-key sorts,
    never a global one."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_seq", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return runs.groupBy("user_id", "run_seq", "event_type").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("run_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("run_end"),
        F.count("*").alias("n_events"),
    )


@register(
    "events_resample_gapfill",
    """
    WITH bounds AS (
      SELECT user_id, date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM bounds
    ),
    daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(d.total_value, 0.0) AS total_value
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a fixed daily grid with gap fill: per-user day bounds ->
    sequence() + explode generates the dense grid, left join brings in the
    sparse daily sums, missing days land as 0. The grid is generated
    distributed (explode of a per-user array), never driver-side; both
    shuffles key on user_id so the join co-partitions with the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    grid = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("d0"),
            F.date_trunc("day", F.max("ts")).alias("d1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )
