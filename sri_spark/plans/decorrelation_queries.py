"""Correlated-subquery decorrelation shapes (round-9 verdict stretch item 8).

tpch_shapes.py covers the classic join/aggregate suite with DataFrame-API
plans; this module covers the one optimizer surface that set had no
representative for: SQL written with *correlated subqueries*, where the
scale-safety of the plan depends entirely on Catalyst's decorrelation
rewrites, not on how the author arranged the joins:

- ``tpch_q4_order_priority`` — correlated ``EXISTS`` per order
  (RewritePredicateSubquery -> left SEMI join on the equi key);
- ``tpch_q17_small_quantity_revenue`` — correlated *scalar aggregate* per
  part (RewriteCorrelatedScalarSubquery -> per-key aggregate + equi join);
- ``tpch_q22_dormant_accounts`` — ``NOT EXISTS`` (left ANTI join) plus an
  uncorrelated scalar threshold subquery (one-row subplan, no join at all).

A naive engine executes each subquery per outer row — O(n*m) at 100 TB.
The plan-shape test (tests/test_decorrelation_shapes.py) asserts the
rewritten form: semi/anti hash joins and key-grouped aggregates, never a
nested loop; the catalog-wide classifier gate covers them automatically.

Unlike tpch_shapes.py these queries go through ``spark.sql`` on purpose:
the correlated text IS the tested input. Both engines run near-identical
SQL, so the oracle also proves DuckDB's decorrelation agrees on semantics.

Schema adaptations (same conventions as tpch_shapes.py): no
l_commitdate/l_receiptdate -> Q4's lateness is l_shipdate > o_orderdate +
60 days; no p_container -> Q17 filters brand + size; no c_phone -> Q22
groups dormant high-balance accounts by nation with "dormant" = no order
since 2000-01-01 (every customer here has SOME order, unlike TPC-H).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import register_views


@register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): correlated EXISTS — count the
    quarter's orders having at least one line shipped >60 days after the
    order date. Catalyst decorrelates the EXISTS into a left semi join on
    l_orderkey (the non-equi lateness predicate rides along as the join
    filter), so the plan is one shuffle join + one map-combinable
    aggregate; the per-order subquery a naive engine would run n times
    never executes."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= DATE '1997-01-01'
          AND o.o_orderdate < DATE '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 10
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated SCALAR
    subquery — each line compares its quantity against 0.2x the average
    quantity of ITS part. Catalyst rewrites the scalar-per-group into a
    keys=[l_partkey] aggregate joined back on the key
    (RewriteCorrelatedScalarSubquery): two scans of lineitem, one
    map-combinable aggregate, one equi join — never one subquery per row.
    At 100 TB the aggregate side is |parts| rows, far smaller than the
    fact, and AQE picks the join strategy."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23' AND p.p_size <= 10
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        """
    )


@register(
    "tpch_q22_dormant_accounts",
    """
    SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c.c_nationkey
    ORDER BY nation
    """,
)
def tpch_q22_dormant_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): per nation, the
    above-average-balance customers with no order since 2000 — an
    uncorrelated scalar subquery (the balance threshold: a 1-row subplan
    evaluated once, no join) plus a correlated NOT EXISTS that Catalyst
    rewrites to a left ANTI join on c_custkey with the date filter pushed
    below the join's build side. Scale shape: one aggregate over customer,
    one anti join against the date-pruned orders scan, one final group-by
    — all equi-keyed."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
               count(*) AS numcust,
               round(sum(c.c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= DATE '2000-01-01')
        GROUP BY c.c_nationkey
        ORDER BY nation
        """
    )
