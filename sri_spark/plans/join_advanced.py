"""Advanced join surface: as-of (temporal) join and range (interval) join.

Neither exists in the reference (SURVEY §2.6 records their absence) nor as a
built-in Spark join type — both are mandated custom operators, implemented
shuffle-scalably in sri_spark.operators.{asof,range_join} and checked here
against DuckDB's native ASOF JOIN / non-equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.operators.asof import asof_join
from sri_spark.operators.range_join import bin_range_join
from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table


@register(
    "join_asof_attribution",
    """
    SELECT c.event_id AS click_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           v.event_id AS view_id,
           CAST(epoch_us(c.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS BIGINT)
             AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute every click to the user's most recent prior (or
    simultaneous) view — the canonical as-of join. One shuffle on user_id +
    per-key sort (operators/asof.py), no candidate-pair blowup; exact-µs lag
    is hash-compared against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    matched = asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_id", "view_ts"],
    )
    return matched.select(
        "click_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "view_id",
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )


BAND_WIDTH = 50_000.0  # band i covers [i*50k, i*50k + 100k) — overlapping


@register(
    "join_range_price_bands",
    f"""
    WITH bands AS (
      SELECT i AS band_id,
             i * {BAND_WIDTH} AS lo,
             i * {BAND_WIDTH} + {2 * BAND_WIDTH} AS hi
      FROM generate_series(0, 9) t(i)
    )
    SELECT b.band_id, b.lo, b.hi,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS monto
    FROM orders o
    JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id, b.lo, b.hi
    ORDER BY b.band_id
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping price-band rollup via the binning range join: each order
    matched to every [lo, hi) band containing its total price (m:n fan-out
    by construction). bin_range_join turns the non-equi predicate into a
    hash equi-join on bin id — the plan a BroadcastNestedLoopJoin would
    otherwise serve only while the interval side stays broadcastable."""
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * BAND_WIDTH).alias("lo"),
        (F.col("id") * BAND_WIDTH + 2 * BAND_WIDTH).alias("hi"),
    )
    points = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    joined = bin_range_join(
        points,
        bands,
        point_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        bin_width=BAND_WIDTH,
    )
    return (
        joined.groupBy("band_id", "lo", "hi")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("monto"),
        )
        .orderBy("band_id")
    )


@register(
    "join_fuzzy_blocked",
    """
    WITH w AS (SELECT DISTINCT c_name AS name FROM customer)
    SELECT a.name AS name_a, b.name AS name_b
    FROM w a JOIN w b
      ON a.name < b.name AND levenshtein(a.name, b.name) = 1
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 similarity join via DELETION-NEIGHBORHOOD blocking
    (FastSS): each name expands to itself plus its single-character
    deletions (length+1 variants), candidates are pairs sharing ANY
    variant (an equi-join — two strings within edit distance 1 always
    share one), and exact levenshtein verifies candidates (variant overlap
    alone admits distance-2 transpositions).

    This is the scalable shape for fuzzy joins: the quadratic
    all-pairs levenshtein (what the oracle runs, O(n^2) comparisons)
    becomes one equi-join moving (variant, name) pairs — O(n * length)
    rows — plus exact verification on the collision set only. The oracle
    being the BRUTE-FORCE join makes this a cross-engine completeness
    proof: blocking loses no pair."""
    names = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    n = F.col("name")
    variants = names.select(
        "name",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.length(n).cast("int")),
                lambda i: F.when(i == 0, n).otherwise(
                    F.concat(
                        n.substr(F.lit(1), i - 1),
                        n.substr(i + 1, F.length(n) - i),
                    )
                ),
            )
        ).alias("v"),
    ).distinct()
    a = variants.select(F.col("name").alias("name_a"), "v")
    b = variants.select(F.col("name").alias("name_b"), "v")
    return (
        a.join(b, "v")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .filter(F.levenshtein("name_a", "name_b") == 1)
    )
