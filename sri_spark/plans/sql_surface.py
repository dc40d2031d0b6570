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
