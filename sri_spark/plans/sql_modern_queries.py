"""Modern SQL-surface family (Spark 4 features): recursive CTEs, the
VARIANT semi-structured type, and LATERAL correlated subqueries.

These close the engine-surface gaps a user migrating complex SQL would hit
first: hierarchy walks (WITH RECURSIVE landed in Spark 4.0), binary-encoded
semi-structured access (VARIANT replaces per-call JSON string parsing with
a parse-once columnar encoding), and correlated per-row subqueries
(LATERAL). Each has an exact DuckDB twin, so the oracle checks the SQL
semantics themselves, not a DataFrame re-expression.

Scale notes: the recursion below is depth-bounded by the synthetic
hierarchy's log-structure (each level divides keys by 10 — ~7 levels at
any SF) and each step is one equi-join; parse_json is a narrow per-row
expression that at 100 TB you'd run ONCE at ingest and store the variant
column; the LATERAL top-n decorrelates into a ranking window, never a
per-row re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

# --------------------------------------------------------------------------
# recursive CTE: management-chain walk over a derived hierarchy
# --------------------------------------------------------------------------

# parent(custkey) = custkey / 10 — a deterministic forest over the existing
# key domain (roots: custkey < 10). Depth and ancestor-path aggregates per
# level exercise multi-round recursion with a growing frontier.
_RECURSIVE_SQL = """
WITH RECURSIVE chain(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, 0
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1
  FROM customer c JOIN chain ON CAST(c.c_custkey / 10 AS BIGINT) = chain.custkey
  WHERE c.c_custkey >= 10
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(min(custkey) AS BIGINT) AS min_key,
       CAST(max(custkey) AS BIGINT) AS max_key
FROM chain GROUP BY depth
"""

_RECURSIVE_ORACLE = """
WITH RECURSIVE chain(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, 0
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, chain.root, chain.depth + 1
  FROM customer c JOIN chain ON CAST(floor(c.c_custkey / 10) AS BIGINT) = chain.custkey
  WHERE c.c_custkey >= 10
)
SELECT depth,
       count(*)::BIGINT AS n_nodes,
       count(DISTINCT root)::BIGINT AS n_roots,
       min(custkey)::BIGINT AS min_key,
       max(custkey)::BIGINT AS max_key
FROM chain GROUP BY depth
"""


@register("sql_recursive_cte_chain", _RECURSIVE_ORACLE)
def sql_recursive_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE management-chain walk (Spark 4.0's recursive CTE):
    roots are custkeys < 10, each node's parent is custkey/10, the
    recursion carries (node, root, depth) and per-level aggregates come
    out the other side. Depth is log10(|customer|) — bounded at any SF —
    and every recursive step is one equi-join against the persisted-once
    customer scan, the relational shape iterative graph walks compile to
    here (cf. dedup/components.py doing the same loop manually)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    df = spark.sql(_RECURSIVE_SQL)
    return df.selectExpr(
        "depth",
        "CAST(n_nodes AS BIGINT) AS n_nodes",
        "CAST(n_roots AS BIGINT) AS n_roots",
        "CAST(min_key AS BIGINT) AS min_key",
        "CAST(max_key AS BIGINT) AS max_key",
    )


# --------------------------------------------------------------------------
# VARIANT: parse-once semi-structured access
# --------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       count(*)::BIGINT AS n,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       CAST(max(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS max_k,
       CAST(sum(CASE WHEN json_extract(props, '$.k')::BIGINT % 2 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_even_k
FROM events GROUP BY event_type
"""


@register("semi_json_variant", _VARIANT_ORACLE)
def semi_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT path for the `props` JSON column: parse_json ONCE into
    Spark 4's binary-encoded semi-structured type, then typed
    variant_get extractions feed an ordinary aggregate. Versus
    get_json_object (semi_json_roundtrip), VARIANT parses each document
    once instead of once per path — the difference between O(paths) and
    O(1) string parses per row, which is why an ingest pipeline stores
    the variant column and queries never touch JSON text again."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__events_v")
    return spark.sql(
        """
        WITH parsed AS (
          SELECT event_type, parse_json(props) AS v FROM __events_v
        )
        SELECT event_type,
               count(*) AS n,
               sum(variant_get(v, '$.k', 'long')) AS sum_k,
               max(variant_get(v, '$.k', 'long')) AS max_k,
               CAST(sum(CASE WHEN variant_get(v, '$.k', 'long') % 2 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_even_k
        FROM parsed GROUP BY event_type
        """
    )


# --------------------------------------------------------------------------
# LATERAL: correlated per-row subquery (top-2 orders per nation's customers)
# --------------------------------------------------------------------------

_LATERAL_ORACLE = """
SELECT n.n_name AS nacion, t.o_orderkey, round(t.o_totalprice, 2) AS precio
FROM nation n,
LATERAL (
  SELECT o.o_orderkey, o.o_totalprice
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 2
) t
"""


@register("sql_lateral_topn", _LATERAL_ORACLE)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: for every nation, its two
    highest-value orders. The naive reading is a per-nation re-scan of
    orders; both engines decorrelate the LIMIT-per-group into a ranked
    window over one join — asserted for Spark in
    tests/test_plan_shapes.py (single scan of orders, no nested loop), so
    the SQL stays declarative AND the plan stays 100 TB-shaped."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name AS nacion, t.o_orderkey,
               round(t.o_totalprice, 2) AS precio
        FROM nation n,
        LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey
          LIMIT 2
        ) t
        """
    )


# --------------------------------------------------------------------------
# collation-aware grouping (Spark 4 collations)
# --------------------------------------------------------------------------

_COLLATION_ORACLE = """
WITH mixed AS (
  SELECT CASE WHEN p_partkey % 2 = 1 THEN lower(p_brand) ELSE p_brand END
           AS marca
  FROM part
)
SELECT lower(min(marca)) AS marca_canon,
       count(*)::BIGINT AS n,
       count(DISTINCT marca)::BIGINT AS n_variantes
FROM mixed GROUP BY lower(marca)
"""


@register("string_collation_ci_group", _COLLATION_ORACLE)
def string_collation_ci_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 collations: brand names
    arrive in mixed case (odd partkeys lowered — a deterministic stand-in
    for dirty source data) and group under UTF8_LCASE, so 'brand#12' and
    'Brand#12' are ONE group without rewriting every predicate through
    lower(). The oracle groups by lower() — proving the collation's
    grouping semantics equal explicit normalization. Collation is
    metadata on the comparison, not a row transform: the hash aggregate
    keys on the collation key directly (one pass, map-side combine
    intact), which is the 100 TB argument for collations over
    wrap-everything-in-lower() expression soup."""
    from pyspark.sql import functions as F

    part = load_table(spark, sf_dir, "part")
    mixed = part.select(
        F.when(
            F.col("p_partkey") % 2 == 1, F.lower(F.col("p_brand"))
        )
        .otherwise(F.col("p_brand"))
        .alias("marca")
    )
    return (
        mixed.groupBy(F.expr("collate(marca, 'UTF8_LCASE')").alias("__k"))
        .agg(
            F.lower(F.min("marca")).alias("marca_canon"),
            F.count("*").cast("long").alias("n"),
            F.countDistinct("marca").cast("long").alias("n_variantes"),
        )
        .select("marca_canon", "n", "n_variantes")
    )


_PIPE_ORACLE = """
SELECT o_orderpriority,
       count(*)::BIGINT AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY n DESC, o_orderpriority
LIMIT 3
"""


@register("sql_pipe_syntax", _PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|> operators, SPARK-49555): the same
    filtered rollup the classic-SQL oracle computes, written as a
    top-to-bottom pipeline — FROM |> WHERE |> AGGREGATE |> ORDER BY |>
    LIMIT. Surface-completeness entry: pipe stages compile to the
    identical Catalyst plan as the classic form, so the top-k arrives as
    TakeOrderedAndProject like any other LIMIT."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n, round(sum(o_totalprice), 2) AS total
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, CAST(n AS BIGINT) AS n, total
        |> ORDER BY n DESC, o_orderpriority
        |> LIMIT 3
        """
    )
