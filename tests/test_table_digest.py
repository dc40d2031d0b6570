"""governance_table_digest's contract: the digest is a pure function of
table CONTENT — row order, partitioning, and physical layout must not
move it, and any single-row change must."""

from __future__ import annotations

from pyspark.sql import functions as F

from sri_spark.plans.registry import all_queries


def _digest_of(df):
    rendered = F.concat_ws(
        "|",
        F.col("c_custkey").cast("long").cast("string"),
        F.col("c_name"),
        F.col("c_nationkey").cast("long").cast("string"),
        F.format_string("%.2f", F.col("c_acctbal")),
        F.col("c_mktsegment"),
    )
    h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")
    return {
        r["bucket"]: (r["n_rows"], r["digest"])
        for r in df.select(
            (F.col("c_custkey") % 16).cast("long").alias("bucket"), h.alias("h")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("digest"),
        )
        .collect()
    }


def test_digest_is_order_and_partitioning_independent(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = _digest_of(cust)
    shuffled = _digest_of(
        cust.repartition(13, F.col("c_mktsegment")).sortWithinPartitions(
            F.desc("c_name")
        )
    )
    assert base == shuffled
    coalesced = _digest_of(cust.coalesce(1))
    assert base == coalesced


def test_digest_detects_single_row_change(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = _digest_of(cust)
    victim = cust.limit(1).collect()[0]
    tampered = cust.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") == victim["c_custkey"],
            F.col("c_acctbal") + 0.01,
        ).otherwise(F.col("c_acctbal")),
    )
    changed = _digest_of(tampered)
    diff = {b for b in base if base[b] != changed.get(b)}
    assert diff == {victim["c_custkey"] % 16}
    # row counts unchanged — only the content digest moved
    assert all(base[b][0] == changed[b][0] for b in base)


def test_digest_catalog_entry_matches_direct(spark, sf_dir):
    q = all_queries()["governance_table_digest"]
    got = {
        r["bucket"]: (r["n_rows"], r["digest"]) for r in q(spark, sf_dir).collect()
    }
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    assert got == _digest_of(cust)
