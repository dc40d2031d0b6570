"""Equivalence properties for the adapted TPC-H shapes (plans/tpch_shapes.py).

The suite's risky rewrites are validated against the LITERAL spec
formulation on randomized small inputs:

- Q21: the per-order aggregation (count distinct suppliers / late
  suppliers, attribute to the sole late one) must equal the spec's
  EXISTS(other supplier) AND NOT EXISTS(other late supplier) double
  correlated self-join.
- Q13: the join-condition filter + count(o_orderkey) histogram must count
  zero-order customers (the point of the outer-join shape).
- Q2: the window-min rewrite must equal the correlated-min subquery
  (groupBy-min + join formulation), ties included.
- Q15: the scalar-max broadcast must keep ALL tied argmax suppliers.

Randomized but seeded — deterministic in CI.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _mk_lineitem(spark, seed: int, n_orders: int = 40, max_lines: int = 6):
    rng = random.Random(seed)
    rows = []
    for ok in range(n_orders):
        for ln in range(rng.randint(1, max_lines)):
            rows.append((ok, ln, rng.randint(1, 8), rng.random() < 0.3))
    return spark.createDataFrame(
        rows, "l_orderkey int, l_linenumber int, l_suppkey int, late boolean"
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_q21_aggregation_equals_double_exists(spark, seed):
    li = _mk_lineitem(spark, seed)

    # literal spec shape: EXISTS (another supplier on the order) AND
    # NOT EXISTS (another LATE supplier on the order), over late lines
    l1 = li.filter("late").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter("late").alias("l3")
    exists = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    not_exists = exists.alias("l1").join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    spec = (
        not_exists.select("l_orderkey", "l_suppkey")
        .distinct()  # spec counts per supplier per order once
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )

    # the catalog's re-expression: one aggregation per order
    late_supp = F.when(F.col("late"), F.col("l_suppkey"))
    agg = (
        li.groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(late_supp).alias("n_late"),
            F.max(late_supp).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy(F.col("late_supp").alias("l_suppkey"))
        .agg(F.count("*").alias("numwait"))
    )

    assert sorted(map(tuple, spec.collect())) == sorted(map(tuple, agg.collect()))


@pytest.mark.parametrize("seed", [7, 8])
def test_q13_histogram_counts_zero_order_customers(spark, seed):
    rng = random.Random(seed)
    custs = spark.createDataFrame([(c,) for c in range(30)], "c_custkey int")
    orders = spark.createDataFrame(
        [
            (i, rng.randint(0, 29), rng.choice(["KEEP", "DROP"]))
            for i in range(60)
        ],
        "o_orderkey int, o_custkey int, flag string",
    )
    per_cust = (
        custs.join(
            orders.filter(F.col("flag") == "KEEP"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    hist = {
        r["c_count"]: r["custdist"]
        for r in per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .collect()
    }
    # python oracle
    kept = [(r["o_custkey"]) for r in orders.filter("flag = 'KEEP'").collect()]
    from collections import Counter

    per = Counter(kept)
    expected = Counter(per.get(c, 0) for c in range(30))
    assert hist == dict(expected)
    # zero-order customers MUST appear in the 0 bucket
    assert 0 in hist or all(per.get(c, 0) > 0 for c in range(30))


@pytest.mark.parametrize("seed", [11, 12])
def test_q2_window_min_equals_correlated_min(spark, seed):
    rng = random.Random(seed)
    ps = spark.createDataFrame(
        [
            (rng.randint(0, 9), s, float(rng.randint(1, 5)))
            for s in range(40)
        ],
        "ps_partkey int, ps_suppkey int, ps_supplycost double",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("ps_partkey")
    via_window = (
        ps.withColumn("mn", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mn"))
        .select("ps_partkey", "ps_suppkey")
    )
    mins = ps.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("mn")
    )
    via_join = ps.join(
        mins,
        (F.col("ps_partkey") == F.col("mk")) & (F.col("ps_supplycost") == F.col("mn")),
    ).select("ps_partkey", "ps_suppkey")
    assert sorted(map(tuple, via_window.collect())) == sorted(
        map(tuple, via_join.collect())
    )


def test_q15_scalar_max_keeps_all_ties(spark):
    rev = spark.createDataFrame(
        [(1, 100.0), (2, 100.0), (3, 50.0)], "supplier_no int, total_revenue double"
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("m")
    )
    assert {r["supplier_no"] for r in top.collect()} == {1, 2}
