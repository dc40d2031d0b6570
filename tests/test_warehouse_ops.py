"""SCD2 changelog collapse and MERGE upsert semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sri_spark.operators.merge import merge_upsert
from sri_spark.operators.scd import scd2_from_changelog


def _ts(h):
    return dt.datetime(2025, 1, 1, h, 0, 0)


def test_scd2_collapses_runs_and_flags_current(spark):
    rows = [
        # key 1: A A B A -> three versions (idempotent re-delivery absorbed)
        (1, _ts(1), "A", 10),
        (1, _ts(2), "A", 11),
        (1, _ts(3), "B", 12),
        (1, _ts(4), "A", 13),
        # key 2: single row -> one current version
        (2, _ts(5), "Z", 14),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, attr string, eid long")
    out = scd2_from_changelog(
        df, key="k", attrs=["attr"], ts_col="ts", tie_breaker="eid"
    )
    got = {
        (r["k"], r["version"]): (
            r["attr"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in out.collect()
    }
    assert got[(1, 1)] == ("A", _ts(1), _ts(3), False)
    assert got[(1, 2)] == ("B", _ts(3), _ts(4), False)
    assert got[(1, 3)] == ("A", _ts(4), None, True)
    assert got[(2, 1)] == ("Z", _ts(5), None, True)
    assert len(got) == 4


def test_scd2_null_attr_changes_tracked(spark):
    rows = [(1, _ts(1), None, 1), (1, _ts(2), "X", 2), (1, _ts(3), None, 3)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, attr string, eid long")
    out = scd2_from_changelog(
        df, key="k", attrs=["attr"], ts_col="ts", tie_breaker="eid"
    ).collect()
    assert [r["attr"] for r in sorted(out, key=lambda r: r["version"])] == [
        None,
        "X",
        None,
    ]


def test_merge_upsert_update_insert_passthrough_delete(spark):
    target = spark.createDataFrame(
        [(1, "ana", 100.0), (2, "bob", 200.0), (3, "eve", 300.0)],
        "id long, name string, bal double",
    )
    source = spark.createDataFrame(
        [(2, 999.0), (4, 50.0)], "id long, bal double"
    )
    out = merge_upsert(target, source, key="id", update_cols=["bal"])
    got = {r["id"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {
        1: ("ana", 100.0),  # untouched
        2: ("bob", 999.0),  # matched update keeps other columns
        3: ("eve", 300.0),
        4: (None, 50.0),  # insert with missing attrs NULL
    }

    # delete branch: matched rows whose source balance is negative drop out
    src2 = spark.createDataFrame([(1, -1.0), (2, 5.0)], "id long, bal double")
    out2 = merge_upsert(
        target,
        src2,
        key="id",
        update_cols=["bal"],
        delete_condition=F.col("s.bal") < 0,
    )
    got2 = {r["id"]: r["bal"] for r in out2.collect()}
    assert got2 == {2: 5.0, 3: 300.0}

    # insert_not_matched=False keeps the target's key space
    out3 = merge_upsert(
        target, source, key="id", update_cols=["bal"], insert_not_matched=False
    )
    assert {r["id"] for r in out3.collect()} == {1, 2, 3}


def test_merge_upsert_null_source_key_errors_by_default(spark):
    target = spark.createDataFrame([(1, 100.0)], "id long, bal double")
    source = spark.createDataFrame([(None, 5.0), (1, 7.0)], "id long, bal double")
    out = merge_upsert(target, source, key="id", update_cols=["bal"])
    with pytest.raises(Exception, match="NULL source merge key"):
        out.collect()


def test_merge_upsert_null_source_key_filter_policy(spark):
    target = spark.createDataFrame([(1, 100.0)], "id long, bal double")
    source = spark.createDataFrame([(None, 5.0), (1, 7.0)], "id long, bal double")
    out = merge_upsert(
        target, source, key="id", update_cols=["bal"], on_null_source_key="filter"
    )
    got = {r["id"]: r["bal"] for r in out.collect()}
    assert got == {1: 7.0}  # null-key row dropped, no ghost all-NULL row


def test_merge_upsert_partial_null_composite_key(spark):
    target = spark.createDataFrame(
        [(1, "a", 100.0)], "k1 long, k2 string, bal double"
    )
    source = spark.createDataFrame(
        [(2, None, 5.0), (1, "a", 7.0)], "k1 long, k2 string, bal double"
    )
    # partially-null composite key is rejected too
    with pytest.raises(Exception, match="NULL source merge key"):
        merge_upsert(target, source, key=["k1", "k2"], update_cols=["bal"]).collect()
    out = merge_upsert(
        target,
        source,
        key=["k1", "k2"],
        update_cols=["bal"],
        on_null_source_key="filter",
    )
    got = {(r["k1"], r["k2"]): r["bal"] for r in out.collect()}
    assert got == {(1, "a"): 7.0}


def test_merge_upsert_rejects_bad_null_policy(spark):
    df = spark.createDataFrame([(1, 1.0)], "id long, bal double")
    with pytest.raises(ValueError, match="on_null_source_key"):
        merge_upsert(df, df, key="id", on_null_source_key="ignore")


def test_cache_scope_releases_only_scope_entries(spark):
    from sri_spark.operators.caching import (
        cache_scope,
        scoped_persist,
        unpersist_all,
    )

    outer = scoped_persist(spark.range(10))
    with cache_scope():
        inner = scoped_persist(spark.range(20))
        inner.count()
        assert inner.storageLevel.useMemory
    # scope exit released the inner cache but not the outer registry entry
    assert not inner.storageLevel.useMemory
    outer.count()
    assert outer.storageLevel.useMemory
    assert unpersist_all() >= 1
    assert not outer.storageLevel.useMemory
