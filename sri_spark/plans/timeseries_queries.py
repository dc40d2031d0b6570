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


EWMA_ALPHA = 0.3  # weight on the most recent observation
EWMA_DEPTH = 8  # bounded frame: lags 0..7 (weights below ~8% of w0 truncated)

# decay weights (1-alpha)^k for k = 0..DEPTH-1, as SQL literals
_EWMA_W = [(1.0 - EWMA_ALPHA) ** k for k in range(EWMA_DEPTH)]

# Portable formulation both engines evaluate bit-identically: an explicit
# lag chain over one window (single pass — all lags share the frame) with
# per-row renormalization over the lags that actually exist. A
# collect_list/list_transform formulation would be shorter but DuckDB and
# Spark disagree on lambda-index support; lag() is ANSI.
_EWMA_NUM_SQL = " + ".join(
    f"coalesce(lag(value, {k}) OVER w * {w!r}, 0)" for k, w in enumerate(_EWMA_W)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0 ELSE {w!r} END)"
    for k, w in enumerate(_EWMA_W)
)

_EWMA_ORACLE = f"""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(value, 6) AS value,
       round(({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}), 6) AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


@register("events_ewma", _EWMA_ORACLE)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window exponentially weighted moving average per user — the
    smoothing/anomaly-baseline primitive. True EWMA is an infinite
    recurrence (not window-expressible without UDAF state); the standard
    scale-safe approximation truncates the tail at DEPTH lags, where the
    dropped mass is (1-alpha)^DEPTH (<6% here), and renormalizes over the
    weights actually present so series starts are unbiased.

    Shape: one per-user window carries all DEPTH lag() calls (Spark fuses
    same-window functions into a single Window exec — one shuffle + per-key
    sort, no self-joins)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        F.coalesce(F.lag("value", k).over(w) * F.lit(wt), F.lit(0.0))
        for k, wt in enumerate(_EWMA_W)
    )
    den = sum(
        F.when(F.lag("value", k).over(w).isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        for k, wt in enumerate(_EWMA_W)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 6).alias("value"),
        F.round(num / den, 6).alias("ewma"),
    )


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


MAD_K = 3.0 * 1.4826  # 3 sigma-equivalents under normality

_MAD_ORACLE = f"""
WITH med AS (SELECT user_id, median(value) AS med FROM events GROUP BY 1),
dev AS (
  SELECT e.user_id, e.event_id, e.ts, e.value, abs(e.value - m.med) AS ad
  FROM events e JOIN med m USING (user_id)
),
mad AS (SELECT user_id, median(ad) AS mad FROM dev GROUP BY 1)
SELECT d.user_id, d.event_id,
       strftime(d.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       round(d.value, 6) AS value,
       round(d.ad, 6) AS deviation,
       round({MAD_K!r} * m.mad, 6) AS threshold
FROM dev d JOIN mad m USING (user_id)
WHERE m.mad > 0 AND d.ad > {MAD_K!r} * m.mad
"""


@register("events_anomaly_mad", _MAD_ORACLE)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly flags via median absolute deviation — the
    outlier detector that, unlike z-scores (events_rolling_zscore), is not
    itself corrupted by the outliers it hunts (median breakdown point 50%
    vs mean's 0). Flags |v - median| > 3·1.4826·MAD.

    Shape: two grouped exact medians + two joins, all keyed on user_id, so
    every stage reuses one hash partitioning; output is only the flagged
    rows. Exact median is a per-group sort at bounded per-user cardinality
    — for heavy multi-billion-row keys swap in approx_percentile, same
    plan shape."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("user_id").agg(F.median("value").alias("med"))
    dev = ev.join(med, "user_id").select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("ad"),
    )
    mad = dev.groupBy("user_id").agg(F.median("ad").alias("mad"))
    return (
        dev.join(mad, "user_id")
        .filter((F.col("mad") > 0) & (F.col("ad") > MAD_K * F.col("mad")))
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            F.round("value", 6).alias("value"),
            F.round("ad", 6).alias("deviation"),
            F.round(MAD_K * F.col("mad"), 6).alias("threshold"),
        )
    )


_TREND_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       round(regr_slope(value, epoch_us(ts) / 86400000000.0), 6) AS slope_per_day,
       round(regr_intercept(value, epoch_us(ts) / 86400000000.0), 6) AS intercept,
       round(coalesce(regr_r2(value, epoch_us(ts) / 86400000000.0), 0.0), 6) AS r2
FROM events
GROUP BY user_id
"""


@register("events_user_trend", _TREND_ORACLE)
def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event values over time (slope/day,
    intercept, fit quality) — the trend feature a churn/engagement model
    consumes. regr_* aggregates are partial-aggregatable (sums of x, y,
    xy, x²), so this is ONE map-combinable hash aggregate — the reason to
    prefer them over a per-group OLS UDF, which would ship raw rows to
    Python."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros("ts") / F.lit(86_400_000_000.0)  # days since epoch
    v = F.col("value")
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.regr_slope(v, x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(v, x), 6).alias("intercept"),
        F.round(F.coalesce(F.regr_r2(v, x), F.lit(0.0)), 6).alias("r2"),
    )


_RANGE_FRAME_ORACLE = """
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       round(sum(value) OVER w, 6) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) / 1000000
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("events_rolling_1h_range", _RANGE_FRAME_ORACLE)
def events_rolling_1h_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling count/sum per user with a RANGE frame — the
    time-based frame family (every other window in the catalog uses ROWS).
    RANGE frames bound by VALUE distance, so irregular event spacing is
    handled exactly: each row aggregates whatever fell in its last hour,
    not its last N rows. One per-user window pass; the frame is evaluated
    with a sliding aggregate inside the sorted partition (no self-join
    formulation needed)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_micros("ts") / F.lit(1_000_000.0)
    w = (
        W.partitionBy("user_id")
        .orderBy(sec.alias("__sec"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.round(F.sum("value").over(w), 6).alias("sum_1h"),
    )


_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) / 1000000.0
           AS gap_s
  FROM events
)
SELECT user_id,
       count(gap_s) AS n_gaps,
       round(avg(gap_s), 6) AS mean_gap_s,
       round(median(gap_s), 6) AS median_gap_s,
       round(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s,
       round(max(gap_s), 6) AS max_gap_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY user_id
"""


@register("events_interarrival_stats", _INTERARRIVAL_ORACLE)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival time distribution (mean/median/p90/max gap
    seconds) — the activity-cadence profile behind session-gap tuning
    (events_sessionize's 30-minute threshold should sit far above the
    typical p90 intra-session gap). One per-user lag window + one grouped
    aggregate; exact per-group percentiles at bounded per-user cardinality
    (approx_percentile is the swap-in at extreme keys)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / F.lit(
        1_000_000.0
    )
    return (
        ev.select("user_id", gap.alias("gap_s"))
        .filter(F.col("gap_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
            F.round(F.median("gap_s"), 6).alias("median_gap_s"),
            F.round(F.percentile("gap_s", F.lit(0.9)), 6).alias("p90_gap_s"),
            F.round(F.max("gap_s"), 6).alias("max_gap_s"),
        )
    )


_TWAP_ORACLE = """
WITH seg AS (
  SELECT user_id,
         strftime(ts, '%Y-%m-%d') AS dia,
         value,
         epoch_us(ts) / 1000000.0 AS t0,
         lead(epoch_us(ts) / 1000000.0) OVER
           (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
            ORDER BY epoch_us(ts), event_id) AS t1
  FROM events
),
weighted AS (
  SELECT user_id, dia, value, t1 - t0 AS dur
  FROM seg WHERE t1 IS NOT NULL
)
SELECT user_id, dia,
       count(*)::BIGINT AS n_segments,
       round(sum(value * dur) / sum(dur), 6) AS twap,
       round(avg(value), 6) AS row_avg
FROM weighted
GROUP BY user_id, dia
HAVING sum(dur) > 0
"""


@register("events_twap_daily", _TWAP_ORACLE)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily TIME-weighted average value (TWAP): each observation
    holds until the next one, so its weight is the seconds it was the
    latest — the integral of the last-observation-carried-forward curve.
    For irregular event spacing TWAP is the honest daily average; the
    row_avg column sits beside it to show the sampling bias a plain
    avg() hides (bursts over-weighted). The final segment of each day has
    no successor and carries zero width — excluded on both engines.

    Shape: one per-(user, day) lead() window + one hash aggregate — same
    two-pass cost as any lag/lead feature; no state beyond the window
    sort."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_micros("ts") / F.lit(1_000_000.0)
    dia = F.date_format("ts", "yyyy-MM-dd")
    w = Window.partitionBy("user_id", dia).orderBy(sec, F.col("event_id"))
    seg = ev.select(
        "user_id",
        dia.alias("dia"),
        "value",
        (F.lead(sec).over(w) - sec).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    # a (user, day) group whose events all share one timestamp has
    # sum(dur) == 0: under ANSI a plain division would abort at runtime
    # (before any isNotNull filter could run), and even without ANSI it
    # would yield NaN, not NULL — so divide with try_divide and drop the
    # group on sum(dur) > 0, the exact HAVING clause the oracle uses
    return (
        seg.groupBy("user_id", "dia")
        .agg(
            F.count("*").cast("long").alias("n_segments"),
            F.round(
                F.try_divide(
                    F.sum(F.col("value") * F.col("dur")), F.sum("dur")
                ),
                6,
            ).alias("twap"),
            F.round(F.avg("value"), 6).alias("row_avg"),
            F.sum("dur").alias("_sum_dur"),
        )
        .filter(F.col("_sum_dur") > 0)
        .drop("_sum_dur")
    )
