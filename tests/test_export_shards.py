"""Training-shard export: determinism, completeness, in-shard order."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from sri_spark.functions.hashing import md5_int
from sri_spark.sources.export import (
    ORDER_SALT,
    with_shard_assignment,
    write_training_shards,
)
from sri_spark.sources.testdata import load_table


def test_export_round_trip_complete(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, id_col="doc_id", n_shards=4)

    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert set(r["doc_id"] for r in back.select("doc_id").collect()) == set(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # the shard id is a directory partition key, readable and prunable
    assert sorted(back.select("shard").distinct().toPandas()["shard"]) == [0, 1, 2, 3]
    shard_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    assert shard_dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]


def test_export_is_deterministic(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    # different input partitioning must not change shard membership
    write_training_shards(docs, out1, id_col="doc_id", n_shards=4)
    write_training_shards(docs.repartition(13), out2, id_col="doc_id", n_shards=4)

    def members(out):
        rows = spark.read.json(out).select("shard", "doc_id").collect()
        m: dict[int, set] = {}
        for r in rows:
            m.setdefault(r["shard"], set()).add(r["doc_id"])
        return m

    assert members(out1) == members(out2)


def test_in_shard_order_is_salted_hash_order(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = str(tmp_path / "ordered")
    write_training_shards(docs, out, id_col="doc_id", n_shards=2)

    expected_key = {
        r["doc_id"]: r["k"]
        for r in docs.select(
            "doc_id",
            md5_int(
                F.concat(F.lit(ORDER_SALT), F.col("doc_id").cast("string"))
            ).alias("k"),
        ).collect()
    }
    for shard_dir in glob.glob(os.path.join(out, "shard=*")):
        ids = []
        for part in sorted(glob.glob(os.path.join(shard_dir, "part-*"))):
            with open(part) as fh:
                ids.extend(json.loads(line)["doc_id"] for line in fh if line.strip())
        keys = [expected_key[i] for i in ids]
        assert keys == sorted(keys), f"{shard_dir} not in salted-hash order"


def test_shard_assignment_matches_catalog_contract(spark, sf_dir):
    """with_shard_assignment is a pure id function: same id -> same shard
    for any n_shards, every shard in range."""
    docs = load_table(spark, sf_dir, "documents")
    a = with_shard_assignment(docs, id_col="doc_id", n_shards=8)
    rows = a.select("shard").distinct().collect()
    assert all(0 <= r["shard"] < 8 for r in rows)
