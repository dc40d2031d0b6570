"""Incremental streaming near-dup (streaming/near_dup.py): cross-batch
candidate detection against the accumulated index, restart/no-op safety,
and batch-operator agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from sri_spark.streaming.near_dup import run_incremental_near_dup

_BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _pairs(df):
    return sorted((r.doc_a, r.doc_b) for r in df.collect())


def test_cross_batch_near_dup_detected_once(spark, tmp_path):
    docs = str(tmp_path / "docs")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: two unrelated docs
    _write_docs(
        spark,
        docs,
        [(1, _BASE), (2, "completely different text about spark shuffles and joins")],
    )
    got1 = run_incremental_near_dup(spark, docs, index, pairs, ckpt)
    assert _pairs(got1) == []

    # batch 2: doc 3 is a near-copy of doc 1 (one appended token), doc 4 new
    _write_docs(
        spark,
        docs,
        [(3, _BASE + " today"), (4, "unrelated fourth document mentioning parquet")],
    )
    got2 = run_incremental_near_dup(spark, docs, index, pairs, ckpt)
    assert (1, 3) in _pairs(got2)
    assert all(a == 1 and b == 3 for a, b in _pairs(got2))

    # restart with nothing new: a strict no-op
    got3 = run_incremental_near_dup(spark, docs, index, pairs, ckpt)
    assert _pairs(got3) == _pairs(got2)


def test_intra_batch_pairs_and_batch_agreement(spark, tmp_path):
    docs = str(tmp_path / "docs")
    rows = [
        (10, _BASE),
        (11, _BASE + " extra"),
        (12, "nothing in common with the others at all in any way"),
    ]
    _write_docs(spark, docs, rows)
    got = run_incremental_near_dup(
        spark,
        docs,
        str(tmp_path / "index"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
    )
    # the single-batch stream must agree with the batch LSH candidate set
    from sri_spark.dedup.minhash import _band_buckets, minhash_signatures

    b = _band_buckets(
        minhash_signatures(
            spark.createDataFrame(rows, "doc_id long, text string")
        ),
        "doc_id",
    )
    l_ = b.select(F.col("doc_id").alias("a"), "band", "bucket")
    r_ = b.select(F.col("doc_id").alias("b"), "band", "bucket")
    want = (
        l_.join(r_, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    assert _pairs(got) == sorted((r.a, r.b) for r in want.collect())
    assert (10, 11) in _pairs(got)


def test_compaction_preserves_detection(spark, tmp_path):
    from sri_spark.streaming.near_dup import (
        COMPACT_PARTITION,
        compact_near_dup_index,
    )

    docs = str(tmp_path / "docs")
    index = str(tmp_path / "index")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, docs, [(1, _BASE), (2, "totally different content here")])
    run_incremental_near_dup(spark, docs, index, pairs, ckpt)

    import os

    n = compact_near_dup_index(spark, index)
    assert n > 0
    assert os.listdir(index) == [COMPACT_PARTITION]

    # the compacted index must catch a near-dup arriving AFTER compaction
    _write_docs(spark, docs, [(3, _BASE + " trailing")])
    got = run_incremental_near_dup(spark, docs, index, pairs, ckpt)
    assert (1, 3) in _pairs(got)

    # compaction is idempotent: rerunning folds the post-compaction batch in
    n2 = compact_near_dup_index(spark, index)
    assert n2 >= n
    assert os.listdir(index) == [COMPACT_PARTITION]


def test_compaction_on_missing_index_is_noop(spark, tmp_path):
    from sri_spark.streaming.near_dup import compact_near_dup_index

    assert compact_near_dup_index(spark, str(tmp_path / "nope")) == 0
