"""Runtime AQE evidence: on a deliberately skewed join, adaptive
execution must (a) split the skewed partition (skew=true in the final
plan) and (b) still produce exactly the rows a plain join produces.
This is the engine-level half of the skew story — operators/skew.py's
salting is the manual fallback; AQE handling is what a 100 TB deployment
leans on first (SURVEY §4.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    """Shrink AQE's skew thresholds so the fixture-scale hot key triggers
    the same code path a hot key triggers at production scale."""
    keep = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark):
    # 50k rows on ONE key, a trickle on 200 others; dim has one row per key
    facts = spark.range(60_000).select(
        F.when(F.col("id") < 50_000, F.lit(7))
        .otherwise((F.col("id") % 200).cast("int"))
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    dim = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("attr-"), F.col("id")).alias("attr"),
    )
    return facts, dim


def test_aqe_splits_skewed_join_and_preserves_rows(spark, skew_conf):
    facts, dim = _skewed_frames(spark)
    joined = facts.join(dim, "k")

    # collect through THIS DataFrame's query execution so the adaptive
    # plan we inspect is the finalized one (count() would execute a
    # different QueryExecution and leave this one isFinalPlan=false)
    rows = joined.collect()
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan

    assert len(rows) == 60_000
    # hot key = the 50k forced rows plus the trickle ids ≡ 7 (mod 200)
    assert sum(1 for r in rows if r["k"] == 7) == 50_050


def test_skew_result_equals_broadcast_reference(spark, skew_conf):
    facts, dim = _skewed_frames(spark)
    skewed = facts.join(dim, "k")
    reference = facts.join(F.broadcast(dim), "k")
    assert skewed.exceptAll(reference).isEmpty()
    assert reference.exceptAll(skewed).isEmpty()
