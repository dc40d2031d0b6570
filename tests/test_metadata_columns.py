"""Hidden file-metadata columns (_metadata.file_path / file_size /
file_modification_time) — the provenance surface a lineage-aware pipeline
reads for per-file auditing without a custom source."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F


def test_metadata_file_path_partitions_rowcounts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "multi")
    spark.range(1000).withColumn("part", F.col("id") % 4).repartition(
        4, "part"
    ).write.parquet(out)

    df = spark.read.parquet(out).select("id", F.col("_metadata.file_path").alias("f"))
    per_file = df.groupBy("f").agg(F.count("*").alias("n")).collect()
    assert sum(r["n"] for r in per_file) == 1000
    assert len(per_file) > 1
    assert all(r["f"].endswith(".parquet") for r in per_file)


def test_metadata_matches_os_file_sizes(spark, tmp_path):
    out = str(tmp_path / "sized")
    spark.range(100).coalesce(1).write.parquet(out)
    row = (
        spark.read.parquet(out)
        .select(
            F.col("_metadata.file_path").alias("p"),
            F.col("_metadata.file_size").alias("sz"),
        )
        .first()
    )
    local = re.sub(r"^file:/+", "/", row["p"])
    assert os.path.getsize(local) == row["sz"]


def test_metadata_agrees_with_input_file_name(spark, sf_dir):
    norm = lambda c: F.regexp_replace(c, "^file:/+", "/")  # noqa: E731
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        norm(F.input_file_name()).alias("a"),
        norm(F.col("_metadata.file_path")).alias("b"),
    )
    bad = df.filter(F.col("a") != F.col("b")).count()
    assert bad == 0
