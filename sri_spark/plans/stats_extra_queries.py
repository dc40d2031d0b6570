"""Second statistics batch: seasonal-strength decomposition, exact rolling
medians, and an order-independent table digest.

Additive mandate surface (no reference citations): the robust-smoothing and
decomposition statistics a metrics pipeline layers over event streams, and
the content-fingerprint primitive a replication/publish pipeline uses to
prove two copies of a table are identical without sorting either one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

# --------------------------------------------------------------------------
# hour-of-day seasonal strength
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH ev AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS h, value FROM events
),
hmeans AS (
  SELECT event_type, h, avg(value) AS hm, count(*) AS hn
  FROM ev GROUP BY 1, 2
),
tmeans AS (SELECT event_type, avg(value) AS tm FROM ev GROUP BY 1),
scored AS (
  SELECT ev.event_type,
         (ev.value - hmeans.hm) * (ev.value - hmeans.hm) AS r2,
         (ev.value - tmeans.tm) * (ev.value - tmeans.tm) AS t2
  FROM ev JOIN hmeans USING (event_type, h) JOIN tmeans USING (event_type)
),
peak AS (
  SELECT event_type, h AS peak_hour
  FROM (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hm DESC, h) AS rk
        FROM hmeans)
  WHERE rk = 1
)
SELECT scored.event_type,
       count(*)::BIGINT AS n_events,
       round(greatest(0.0, 1.0 - sum(r2) / sum(t2)), 6) AS seasonal_strength,
       min(peak.peak_hour) AS peak_hour
FROM scored JOIN peak USING (event_type)
GROUP BY scored.event_type
"""


@register("events_seasonal_strength", _SEASONAL_ORACLE)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal strength per event type — the STL-style
    variance-explained statistic 1 - Var(residual)/Var(centered), where
    the seasonal component is the per-(type, hour) mean. Near 1 means the
    metric is dominated by time-of-day cycle; near 0 means an hourly
    seasonal model adds nothing. Also reports the peak hour (argmax of
    the seasonal profile, ties to the earliest hour).

    Shape: one aggregate over the (type, hour) key (bounded at
    |types| x 24), a type-sized aggregate, both broadcast back onto the
    stream for a single residual-scoring pass — two full-data scans
    total, no data-sized shuffle key anywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("long").alias("h"), "value"
    )
    hmeans = ev.groupBy("event_type", "h").agg(F.avg("value").alias("hm"))
    tmeans = ev.groupBy("event_type").agg(F.avg("value").alias("tm"))
    peak = (
        hmeans.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("hm"), F.asc("h")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("h").alias("peak_hour"))
    )
    r2 = (F.col("value") - F.col("hm")) * (F.col("value") - F.col("hm"))
    t2 = (F.col("value") - F.col("tm")) * (F.col("value") - F.col("tm"))
    return (
        ev.join(F.broadcast(hmeans), ["event_type", "h"])
        .join(F.broadcast(tmeans), "event_type")
        .select("event_type", r2.alias("r2"), t2.alias("t2"))
        .join(F.broadcast(peak), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            # try_divide: a constant-valued series has Var(centered) == 0;
            # ANSI would abort, try_divide yields NULL and greatest()
            # skips it to 0.0 — DuckDB (div-by-zero -> NULL, greatest
            # ignores NULLs) lands on the same 0.0
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0 - F.try_divide(F.sum("r2"), F.sum("t2")),
                ),
                6,
            ).alias("seasonal_strength"),
            F.min("peak_hour").alias("peak_hour"),
        )
    )


# --------------------------------------------------------------------------
# exact rolling median
# --------------------------------------------------------------------------

_ROLLMED_ORACLE = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(median(value) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) AS med5
FROM events
"""


@register("events_rolling_median", _ROLLMED_ORACLE)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-row rolling median of event value per user — the robust
    smoother that, unlike the rolling mean, ignores single spikes
    entirely (pair with events_anomaly_mad for detection).

    Spark has no median window aggregate, so the frame's values are
    collected into a bounded array (<= 5 elements — constant memory per
    row BY CONSTRUCTION, unlike an unbounded collect), sorted, and
    interpolated exactly like quantile_cont(0.5): middle element for odd
    counts, mean of the middle two for even. One per-user window sort,
    everything else is per-row array math in codegen."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid = (n + 1) / 2
    med = F.when(
        n % 2 == 1, F.element_at(arr, mid.cast("int"))
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(med, 6).alias("med5"),
    )


# --------------------------------------------------------------------------
# order-independent table digest
# --------------------------------------------------------------------------

# Row rendering must be bit-identical across engines: keys cast to BIGINT
# strings, doubles printed with fixed decimals via C-style printf (Spark
# format_string == DuckDB printf), strings used raw. The per-row md5's
# leading 15 hex digits fit a BIGINT (2^60), and SUM is commutative, so the
# digest is independent of row order and partitioning.
_DIGEST_ORACLE = """
WITH rows_r AS (
  SELECT c_custkey % 16 AS bucket,
         CAST(('0x' || substring(md5(
             CAST(c_custkey AS BIGINT)::VARCHAR || '|' || c_name || '|' ||
             CAST(c_nationkey AS BIGINT)::VARCHAR || '|' ||
             printf('%.2f', c_acctbal) || '|' || c_mktsegment
         ), 1, 15)) AS BIGINT) AS h
  FROM customer
)
SELECT bucket,
       count(*)::BIGINT AS n_rows,
       CAST(sum(h) AS VARCHAR) AS digest
FROM rows_r GROUP BY bucket
"""


@register("governance_table_digest", _DIGEST_ORACLE)
def governance_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content digest of the customer table, bucketed 16
    ways: md5 each canonically-rendered row, keep 60 bits, SUM per bucket.
    Two replicas of the table agree iff all 16 (n_rows, digest) pairs
    agree; a mismatched bucket localizes the diff to 1/16 of the keyspace
    (recurse on the bucket to bisect further). This is how a publish or
    replication step proves table equality across engines/clusters
    without sorting or shipping either copy.

    Shape: pure per-row expression work + one 16-key hash aggregate; the
    map-side combine reduces each partition to 16 partial sums, so the
    exchange carries O(16 x partitions) rows at any scale. The commutative
    SUM (not xor-of-ordered-concat) is what buys order independence."""
    cust = load_table(spark, sf_dir, "customer")
    rendered = F.concat_ws(
        "|",
        F.col("c_custkey").cast("long").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("long").cast("string"),
        F.format_string("%.2f", F.col("c_acctbal")),
        F.col("c_mktsegment"),
    )
    h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")
    return (
        cust.select(
            (F.col("c_custkey") % 16).cast("long").alias("bucket"),
            h.alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            # 128-bit decimal accumulator: row hashes are 60-bit, so a
            # long SUM overflows under ANSI at ~2^3 rows x 2^60; decimal
            # sums never do at any realistic row count, and both engines
            # render the integer digest identically as a string
            F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias(
                "digest"
            ),
        )
    )
