"""SQL-API surface + engine-completeness queries.

- `flagship_sql` proves the verbatim-SQL path (SURVEY §7.1: every pipeline
  output is also reachable through spark.sql over registered views).
- window-function queries cover the analytic-function surface the reference
  never used (SURVEY §2.9) but a complete engine must have.
- `agg_approx_distinct` is the documented 100 TB alternative to exact
  COUNT(DISTINCT) — rows-only check (HLL sketches differ across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.plans.relational import FLAGSHIP_ORACLE
from sri_spark.sources.testdata import load_table, register_views


@register("flagship_sql", FLAGSHIP_ORACLE)
def flagship_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship star rollup expressed as literal SQL — identical Catalyst
    plan to the DataFrame version (both compile to the same logical plan)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS Anio,
               n.n_name AS Nacion,
               c.c_mktsegment AS Segmento,
               count(*) AS total_registros,
               round(avg(l.l_extendedprice * (1 - l.l_discount)), 4) AS precio_promedio,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS monto_total
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY year(o.o_orderdate), n.n_name, c.c_mktsegment
        ORDER BY total_registros DESC, Anio, Nacion, Segmento
        LIMIT 10
        """
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           row_number() OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             AS rango_precio
    FROM orders
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic functions: per-customer running sum + price rank. Windows
    partition by customer, so the sort is per-key — no global-sort
    bottleneck at scale."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
        F.row_number().over(w_rank).cast("long").alias("rango_precio"),
    )


@register(
    "agg_rollup",
    """
    SELECT year(o_orderdate) AS Anio, o_orderpriority AS Prioridad,
           count(*) AS n_registros, round(sum(o_totalprice), 2) AS monto
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (subtotals + grand total) — grouping-sets surface
    the reference never used; one pass, Catalyst expands the grouping sets."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup(
        F.year("o_orderdate").cast("long").alias("Anio"),
        F.col("o_orderpriority").alias("Prioridad"),
    ).agg(
        F.count("*").alias("n_registros"),
        F.round(F.sum("o_totalprice"), 2).alias("monto"),
    )


@register(
    "agg_approx_distinct",
    """
    SELECT count(DISTINCT o_custkey) AS clientes_exactos,
           TRUE AS estimacion_dentro_tolerancia
    FROM orders
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the scale path for A2 when
    exact distinct counts would shuffle 100 TB of keys; rsd=1%.

    Cross-engine contract: HLL sketch values are engine-specific, so the
    oracle-checked output is the exact count plus a boolean asserting the
    estimate landed within 5×rsd of it — the estimator's own accuracy
    guarantee, verifiable by any engine."""
    orders = load_table(spark, sf_dir, "orders")
    exact = F.countDistinct("o_custkey")
    approx = F.approx_count_distinct("o_custkey", 0.01)
    return orders.agg(
        exact.alias("clientes_exactos"),
        (F.abs(approx - exact) <= exact * F.lit(0.05)).alias(
            "estimacion_dentro_tolerancia"
        ),
    )


@register(
    "agg_cube",
    """
    SELECT year(o_orderdate) AS Anio, o_orderstatus AS Estado,
           count(*) AS n_registros, round(sum(o_totalprice), 2) AS monto
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderstatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, status): all four grouping-set combinations in one
    pass — completes the grouping-sets family beside ROLLUP (Catalyst
    expands the sets into a single Expand + hash aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube(
        F.year("o_orderdate").cast("long").alias("Anio"),
        F.col("o_orderstatus").alias("Estado"),
    ).agg(
        F.count("*").alias("n_registros"),
        F.round(F.sum("o_totalprice"), 2).alias("monto"),
    )


@register(
    "window_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS fecha,
           CAST(date_diff('day',
                lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS dias_desde_anterior,
           round(lead(o_totalprice) OVER w - o_totalprice, 2) AS delta_siguiente
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation per customer: days since the previous order and
    price delta to the next — per-key windows, so the sort stays partition-
    local (no global-sort bottleneck)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("fecha"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("dias_desde_anterior"),
        F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2)
        .alias("delta_siguiente"),
    )


@register(
    "agg_hll_sketch_merge",
    """
    SELECT n.n_regionkey AS region_key,
           count(DISTINCT c.c_custkey) AS clientes_exactos,
           TRUE AS estimacion_dentro_tolerancia
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey
    """,
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — THE 100 TB distinct-count pattern: build
    one Datasketches HLL per nation (partial aggregation), then
    hll_union_agg the partials up to region level and estimate. This is how
    a lakehouse maintains per-partition/per-day sketches and answers
    any-granularity distinct questions without re-scanning raw keys.

    Cross-engine contract (same as agg_approx_distinct): sketch bytes are
    engine-specific, so the checked output is the exact per-region count
    plus a boolean asserting the merged estimate lands within the
    estimator's accuracy guarantee (HLL lgK=12 → ~1.6% rsd; 5x margin)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sketch"),
            F.countDistinct("c_custkey").alias("exact_n"),
        )
    )
    merged = per_nation.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
        # nation partitions customers (c_nationkey is single-valued), so the
        # region-exact count is the sum of disjoint nation-exact counts
        F.sum("exact_n").alias("clientes_exactos"),
    )
    return merged.select(
        "region_key",
        "clientes_exactos",
        (
            F.abs(F.col("est") - F.col("clientes_exactos"))
            <= F.col("clientes_exactos") * F.lit(0.08)
        ).alias("estimacion_dentro_tolerancia"),
    )
