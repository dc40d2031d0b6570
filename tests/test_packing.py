"""Sequence-packing operator: the scalable prefix sum must equal the
single-window truth regardless of input partitioning, and the chop
semantics must hold exactly."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sri_spark.operators.packing import exclusive_prefix_sum, pack_sequences


def _truth(df, value_col, order_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, -1)
    return {
        r["k"]: r["off"]
        for r in df.select(
            F.col(order_col).alias("k"),
            F.coalesce(F.sum(value_col).over(w), F.lit(0)).alias("off"),
        ).collect()
    }


def test_prefix_sum_matches_global_window(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    )
    truth = _truth(df, "v", "k")
    for n_parts in (1, 7, 32):
        got = {
            r["k"]: r["offset"]
            for r in exclusive_prefix_sum(
                df.repartition(n_parts), "v", "k"
            ).collect()
        }
        assert got == truth, f"partitioning {n_parts} changed the prefix sum"


def test_pack_sequences_chop_semantics(spark):
    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 100), (4, 500), (5, 0)],
        "doc_id long, n_tokens long",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(df, budget=512).collect()
    }
    # stream: doc1 [0,300) seq0 ok; doc2 [300,600) straddles 0->1;
    # doc3 [600,700) seq1; doc4 [700,1200) straddles 1->2;
    # doc5 zero tokens at 1200 -> seq2, no straddle
    assert (rows[1]["offset"], rows[1]["seq_id"], rows[1]["straddles"]) == (0, 0, False)
    assert (rows[2]["offset"], rows[2]["seq_id"], rows[2]["straddles"]) == (300, 0, True)
    assert (rows[3]["offset"], rows[3]["seq_id"], rows[3]["straddles"]) == (600, 1, False)
    assert (rows[4]["offset"], rows[4]["seq_id"], rows[4]["straddles"]) == (700, 1, True)
    assert (rows[5]["offset"], rows[5]["seq_id"], rows[5]["straddles"]) == (1200, 2, False)


def test_pack_sequences_rejects_bad_budget(spark):
    import pytest

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
