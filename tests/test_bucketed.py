"""Bucketed tables: same-bucketed join plans with no shuffle Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from sri_spark.sources.bucketed import write_bucketed
from sri_spark.sources.testdata import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "li_b", bucket_by=["l_orderkey"], n_buckets=8,
                       sort_by=["l_orderkey"])
        write_bucketed(orders, "ord_b", bucket_by=["o_orderkey"], n_buckets=8,
                       sort_by=["o_orderkey"])

        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        # and it is still correct
        n = joined.count()
        expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
