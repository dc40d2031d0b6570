"""Unit tests for the as-of join and binning range join operators
(sri_spark.operators.asof / range_join) beyond the catalog oracle gate:
boundary inclusivity, no-match nulls, and equivalence to the naive
non-equi join Catalyst would otherwise run."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sri_spark.operators.asof import asof_join
from sri_spark.operators.range_join import bin_range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:00:00"), 10.0),
            ("A", _ts("2024-01-01 09:05:00"), 11.0),
            ("A", _ts("2024-01-01 09:10:00"), 12.0),
            ("B", _ts("2024-01-01 09:03:00"), 50.0),
        ],
        "sym string, qts timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 09:04:00")),  # between quotes -> 10.0
            (2, "A", _ts("2024-01-01 09:05:00")),  # exactly at quote -> 11.0
            (3, "A", _ts("2024-01-01 08:59:00")),  # before any quote -> null
            (4, "B", _ts("2024-01-01 10:00:00")),  # long after -> 50.0
            (5, "C", _ts("2024-01-01 09:00:00")),  # key with no quotes -> null
        ],
        "trade_id long, sym string, tts timestamp",
    )
    return quotes, trades


def test_asof_join_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades,
        quotes.select("sym", "qts", F.col("price").alias("quote_price")),
        on=["sym"],
        left_ts="tts",
        right_ts="qts",
        right_cols=["quote_price"],
    )
    got = {r["trade_id"]: r["quote_price"] for r in out.collect()}
    assert got == {1: 10.0, 2: 11.0, 3: None, 4: 50.0, 5: None}
    # every left row survives exactly once (left-join cardinality)
    assert out.count() == trades.count()


def test_asof_join_rejects_column_collision(spark, quotes_trades):
    quotes, trades = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades,
            quotes.select("sym", "qts", F.col("price").alias("tts")),
            on=["sym"],
            left_ts="tts",
            right_ts="qts",
            right_cols=["tts"],
        )


def test_bin_range_join_matches_naive_theta_join(spark, sf_dir):
    from sri_spark.sources.testdata import load_table

    points = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    intervals = spark.range(12).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * 40_000.0 - 10_000.0).alias("lo"),
        (F.col("id") * 40_000.0 + 70_000.0).alias("hi"),
    )
    naive = points.join(
        intervals,
        (points["o_totalprice"] >= intervals["lo"])
        & (points["o_totalprice"] < intervals["hi"]),
    )
    binned = bin_range_join(
        points,
        intervals,
        point_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        bin_width=25_000.0,
    )
    key = lambda r: (r["o_orderkey"], r["iv_id"])
    assert sorted(map(key, binned.collect())) == sorted(map(key, naive.collect()))


def test_bin_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 500.0)], "pid long, v double")
    intervals = spark.createDataFrame([(1, 0.0, 10.0)], "iv long, lo double, hi double")
    out = bin_range_join(
        points, intervals, point_col="v", lo_col="lo", hi_col="hi",
        bin_width=10.0, how="left",
    )
    got = {r["pid"]: r["iv"] for r in out.collect()}
    assert got == {1: 1, 2: None}
    with pytest.raises(ValueError, match="how"):
        bin_range_join(
            points, intervals, point_col="v", lo_col="lo", hi_col="hi",
            bin_width=10.0, how="full",
        )


def test_fuzzy_blocked_equals_brute_force(spark, sf_dir):
    """Deletion-neighborhood blocking must find EXACTLY the brute-force
    edit-distance-1 pair set (completeness + verification correctness)."""
    import pyspark.sql.functions as F

    from sri_spark.plans.join_advanced import join_fuzzy_blocked
    from sri_spark.sources.testdata import load_table

    got = {(r.name_a, r.name_b) for r in join_fuzzy_blocked(spark, sf_dir).collect()}
    names = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_name").alias("name"))
        .distinct()
    )
    a = names.select(F.col("name").alias("name_a"))
    b = names.select(F.col("name").alias("name_b"))
    brute = (
        a.join(b, F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") == 1)
    )
    want = {(r.name_a, r.name_b) for r in brute.collect()}
    assert got == want and got
