"""Python DataSource API contracts for the synthdocs source: schema,
determinism across partitionings, filter-pushdown partition pruning, and
the streaming reader's offset-replay determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull, LessThanOrEqual

from sri_spark.sources.pyds import (
    SynthDocsDataSource,
    SynthDocsReader,
    SynthDocsStreamReader,
    _doc_row,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
    yield
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def _load(spark, **opts):
    r = spark.read.format("synthdocs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_schema_and_contents(spark):
    df = _load(spark, n=500, partitions=8)
    assert df.columns == ["doc_id", "source", "text", "n_tokens"]
    rows = df.collect()
    assert len(rows) == 500
    assert sorted(r["doc_id"] for r in rows) == list(range(500))
    sample = next(r for r in rows if r["doc_id"] == 123)
    assert tuple(sample) == _doc_row(123, 7)


def test_content_is_partitioning_independent(spark):
    a = sorted(map(tuple, _load(spark, n=300, partitions=2).collect()))
    b = sorted(map(tuple, _load(spark, n=300, partitions=17).collect()))
    assert a == b


def test_filtered_read_is_correct(spark):
    df = _load(spark, n=1000, partitions=10).filter(
        (F.col("doc_id") > 149) & (F.col("doc_id") <= 250)
    )
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(150, 251))


def test_pushdown_prunes_partitions():
    """Unit-level pushdown contract: doc_id bounds fold into partition
    planning (only slices intersecting [lo, hi) are scheduled); other
    predicates come back as residuals."""
    r = SynthDocsReader({"n": "1000", "partitions": "10"})
    residual = list(
        r.pushFilters(
            [
                GreaterThan(("doc_id",), 149),
                LessThanOrEqual(("doc_id",), 250),
                IsNotNull(("source",)),
            ]
        )
    )
    assert [type(f) for f in residual] == [IsNotNull]
    parts = r.partitions()
    # ids 150..250 span exactly two 100-wide slices
    assert [(p.lo, p.hi) for p in parts] == [(150, 200), (200, 251)]

    eq = SynthDocsReader({"n": "1000", "partitions": "10"})
    list(eq.pushFilters([EqualTo(("doc_id",), 777)]))
    assert [(p.lo, p.hi) for p in eq.partitions()] == [(777, 778)]


def test_stream_reader_offsets_and_replay():
    sr = SynthDocsStreamReader({"n": "250", "rowsPerBatch": "100"})
    assert sr.initialOffset() == {"pos": 0}
    rows1, o1 = sr.read({"pos": 0})
    rows2, o2 = sr.read(o1)
    rows3, o3 = sr.read(o2)
    rows4, o4 = sr.read(o3)
    batches = [list(rows1), list(rows2), list(rows3), list(rows4)]
    assert [len(b) for b in batches] == [100, 100, 50, 0]
    assert o3 == o4 == {"pos": 250}
    # recovery replay reproduces exactly the committed range
    assert list(sr.readBetweenOffsets({"pos": 0}, o1)) == batches[0]
    assert list(sr.readBetweenOffsets(o1, o2)) == batches[1]


def test_stream_end_to_end_equals_batch(spark, tmp_path):
    stream = (
        spark.readStream.format("synthdocs")
        .option("n", 230)
        .option("rowsPerBatch", 60)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synthdocs_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # simple Python stream sources don't implement Trigger.AvailableNow;
    # processAllAvailable blocks until the feed reports no new offsets
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("synthdocs_sink").collect()))
    want = sorted(map(tuple, _load(spark, n=230).collect()))
    assert got == want
