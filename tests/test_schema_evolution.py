"""Schema evolution on the corpus store: a 100 TB corpus is written over
months — later shards gain columns (quality scores, language tags) that
earlier shards lack. The engine must read the union schema with nulls for
missing columns (mergeSchema), and the curation queries must keep running
on evolved tables."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_merge_schema_unions_columns(spark, tmp_path):
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], "doc_id long, text string"
    ).write.parquet(out + "/shard=a")
    spark.createDataFrame(
        [(3, "gamma text", 0.9, "en")],
        "doc_id long, text string, quality double, lang string",
    ).write.parquet(out + "/shard=b")

    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"doc_id", "text", "quality", "lang", "shard"}
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].quality is None and rows[1].lang is None
    assert rows[3].quality == 0.9 and rows[3].lang == "en"


def test_evolved_table_still_aggregates(spark, tmp_path):
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(4)], "doc_id long, text string"
    ).write.parquet(out + "/shard=a")
    spark.createDataFrame(
        [(i, f"doc {i}", float(i) / 10) for i in range(4, 8)],
        "doc_id long, text string, quality double",
    ).write.parquet(out + "/shard=b")

    df = spark.read.option("mergeSchema", "true").parquet(out)
    # null-safe aggregation over the evolved column: old shards contribute
    # nothing to avg(quality) but still count rows
    agg = df.agg(
        F.count("*").alias("n"),
        F.count("quality").alias("n_scored"),
        F.round(F.avg("quality"), 4).alias("avg_q"),
    ).first()
    assert agg.n == 8 and agg.n_scored == 4
    assert abs(agg.avg_q - 0.55) < 1e-9
    # and a quality gate over the union treats unscored docs explicitly
    gated = df.filter(F.coalesce(F.col("quality"), F.lit(1.0)) >= 0.5)
    assert gated.count() == 4 + 3  # 4 unscored pass-by-default + {0.5, 0.6, 0.7}
