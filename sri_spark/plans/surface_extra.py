"""Engine-surface completeness queries for operator families the reference
never used (SURVEY §2.6/§2.9 'not present' notes) but a complete engine must
offer: semi/anti joins, exact percentiles, the string-function family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table


@register(
    "join_semi_anti",
    """
    SELECT c.c_custkey, 'con_pedidos' AS estado
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c.c_custkey, 'sin_pedidos' AS estado
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti — existence joins that never replicate the
    probe side (no fan-out risk, broadcastable build side)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = cust.c_custkey == orders.o_custkey
    with_orders = cust.join(orders, cond, "left_semi").select(
        "c_custkey", F.lit("con_pedidos").alias("estado")
    )
    without = cust.join(orders, cond, "left_anti").select(
        "c_custkey", F.lit("sin_pedidos").alias("estado")
    )
    return with_orders.unionByName(without)


@register(
    "agg_percentiles",
    """
    SELECT o_orderpriority AS Prioridad,
           round(quantile_cont(o_totalprice, 0.5), 4) AS mediana,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (`percentile`, the sort-based
    exact form; `approx_percentile` is the documented sketch alternative for
    100 TB group cardinalities)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("Prioridad")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("mediana"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "string_functions",
    """
    SELECT p_partkey,
           substr(p_name, 1, 10) AS prefijo,
           concat(p_brand, '#', p_type) AS etiqueta,
           length(p_name) AS largo,
           replace(p_type, ' ', '_') AS tipo_guion,
           CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS contiene_a,
           regexp_replace(p_name, '[aeiou]', '.', 'g') AS sin_vocales,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS talla,
           reverse(p_brand) AS marca_invertida
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-expression family (substr/concat/length/replace/like/
    regexp_replace/lpad/reverse) — all codegen'd JVM-side."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.substring("p_name", 1, 10).alias("prefijo"),
        F.concat_ws("#", "p_brand", "p_type").alias("etiqueta"),
        F.length("p_name").cast("long").alias("largo"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("tipo_guion"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0).alias("contiene_a"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("sin_vocales"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("talla"),
        F.reverse(F.col("p_brand")).alias("marca_invertida"),
    )
