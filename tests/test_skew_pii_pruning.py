"""Salted-join equivalence, PII redaction, and partition-pruning proof."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sri_spark.operators.skew import salted_join
from sri_spark.sources.testdata import load_table
from sri_spark.text.analysis import pii_counts, redact_pii


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def skewed(spark):
    # 900 of 1000 fact rows hit key 7 — the hot-key shape salting exists for
    fact = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(40).select(
        F.col("id").alias("dk"), F.concat(F.lit("seg_"), F.col("id")).alias("seg")
    )
    return fact, dim


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain(skewed, how):
    fact, dim = skewed
    plain = fact.join(dim, fact["k"] == dim["dk"], how)
    salted = salted_join(
        fact, dim, fact["k"] == dim["dk"], n_salt=8, salt_by="row_id", how=how
    )
    cols = ["row_id", "k", "v", "dk", "seg"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)
    assert salted.count() == plain.count() > 0


def test_salted_join_rejects_bad_args(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, fact["k"] == dim["dk"], n_salt=0)
    with pytest.raises(ValueError):
        salted_join(fact, dim, fact["k"] == dim["dk"], how="full_outer")


def test_redact_pii_masks_and_counts(spark):
    rows = [
        (0, "mail me at jane.doe+x@corp.example.org today"),
        (1, "call +59391234567 or (02)555-1212x"),  # second: digits+parens run
        (2, "no pii here at all"),
        (3, "two mails a@b.io c.d@e-f.com and tel +12025550123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        redact_pii(F.col("text")).alias("red"),
        *[c.alias(n) for n, c in pii_counts(F.col("text")).items()],
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["red"] == "mail me at [EMAIL] today"
    assert (by_id[0]["n_emails"], by_id[0]["n_phones"]) == (1, 0)
    assert "[PHONE]" in by_id[1]["red"] and "+59391234567" not in by_id[1]["red"]
    assert by_id[2]["red"] == "no pii here at all"
    assert (by_id[2]["n_emails"], by_id[2]["n_phones"]) == (0, 0)
    assert by_id[3]["n_emails"] == 2 and by_id[3]["n_phones"] == 1
    assert "@" not in by_id[3]["red"].replace("[EMAIL]", "")


def test_partition_pruning_on_year_partitioned_write(spark, sf_dir, tmp_path):
    """Reference Q6 declares partitioned output; prove the read side actually
    prunes: a year-partitioned parquet write + year filter must scan only the
    matching partition (PartitionFilters in the FileSourceScan, and the
    filtered count equals the unpartitioned filter count)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "anio", F.year("o_orderdate")
    )
    target = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("anio").parquet(target)

    back = spark.read.parquet(target)
    year = orders.select(F.min("anio")).first()[0]
    filtered = back.filter(F.col("anio") == year)

    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert f"anio = {year}" in plan.replace(f"anio#", "anio #") or str(year) in plan

    expected = orders.filter(F.col("anio") == year).count()
    assert expected > 0
    assert filtered.count() == expected
    # the partition directory alone holds exactly the filtered rows
    assert spark.read.parquet(f"{target}/anio={year}").count() == expected
