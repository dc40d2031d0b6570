"""Invariant tests for the round-5 operators, on small synthetic fixtures
with hand-computable truth (the oracle sweep checks engine-vs-engine
equality; these pin the SEMANTICS against brute force)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _write(spark, tmp_path, table, df):
    out = tmp_path / "sf"
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
    return str(out)


# --- CDC latest-wins compaction --------------------------------------------


@pytest.fixture()
def cdc_fixture(spark, tmp_path):
    # user 1: latest (ts order) is event 13 (update) -> survives
    # user 2: latest is event 20 (delete tombstone)  -> disappears
    # user 3: single update                          -> survives
    rows = [
        (11, 1, dt.datetime(2024, 1, 1, 10), 1.0),
        (13, 1, dt.datetime(2024, 1, 1, 12), 3.0),
        (10, 1, dt.datetime(2024, 1, 1, 11), 2.0),  # delete, but not latest
        (15, 2, dt.datetime(2024, 1, 2, 9), 5.0),
        (20, 2, dt.datetime(2024, 1, 2, 10), 6.0),  # delete, latest
        (7, 3, dt.datetime(2024, 1, 3, 8), 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    return _write(spark, tmp_path, "events", ev)


def test_cdc_compaction_latest_wins_and_tombstones(spark, cdc_fixture):
    from sri_spark.plans.ops_extra_queries import warehouse_cdc_compaction

    out = {r["user_id"]: r for r in warehouse_cdc_compaction(spark, cdc_fixture).collect()}
    assert set(out) == {1, 3}  # user 2's latest change is a delete
    assert out[1]["last_value"] == 3.0 and out[1]["n_versions"] == 3
    assert out[1]["n_deletes"] == 1
    assert out[3]["last_value"] == 7.0 and out[3]["n_versions"] == 1


def test_cdc_compaction_at_most_one_row_per_key(spark, sf_dir):
    from sri_spark.plans.ops_extra_queries import warehouse_cdc_compaction

    out = warehouse_cdc_compaction(spark, sf_dir)
    assert out.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0


# --- Matryoshka fidelity ---------------------------------------------------


def test_matryoshka_full_width_is_lossless(spark, tmp_path, monkeypatch):
    import sri_spark.plans.ops_extra_queries as m

    emb = spark.createDataFrame(
        [(i, [float(i + d) for d in range(16)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    sf = _write(spark, tmp_path, "embeddings", emb)
    # truncation width == full width -> the two cosines are identical
    monkeypatch.setattr(m, "_TRUNC_DIMS", 16)
    r = m.embeddings_matryoshka_fidelity(spark, sf).collect()[0]
    assert r["n_pairs"] == 5
    assert r["mean_abs_err"] == 0.0 and r["max_abs_err"] == 0.0


def test_matryoshka_reports_bounded_error(spark, sf_dir):
    from sri_spark.plans.ops_extra_queries import (
        embeddings_matryoshka_fidelity,
    )

    r = embeddings_matryoshka_fidelity(spark, sf_dir).collect()[0]
    # cosines live in [-1, 1], so no abs error can exceed 2; corr defined
    assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] <= 2.0
    assert r["cosine_corr"] is None or -1.0 <= r["cosine_corr"] <= 1.0


# --- phrase retrieval ------------------------------------------------------


def test_phrase_top_docs_counts_adjacent_only(spark, tmp_path):
    from sri_spark.plans.curation_extra_queries import (
        retrieval_phrase_top_docs,
    )

    docs = spark.createDataFrame(
        [
            # separator tokens kill the fox->red back-adjacency, so
            # 'red fox' is unambiguously the top bigram (x3 here)
            (1, "red fox a red fox b red fox"),
            (2, "red and fox red fox"),  # x1 — 'red ... fox' must NOT count
            (3, "fox red"),  # reversed order must NOT count
        ],
        "doc_id long, text string",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    rows = retrieval_phrase_top_docs(spark, sf).collect()
    assert rows[0]["phrase_w1"] == "red" and rows[0]["phrase_w2"] == "fox"
    hits = {r["doc_id"]: r["n_hits"] for r in rows}
    assert hits == {1: 3, 2: 1}  # doc 3 has zero adjacent matches


# --- curriculum schedule ---------------------------------------------------


def test_curriculum_schedule_invariants(spark, sf_dir):
    from sri_spark.plans.curation_extra_queries import (
        corpus_curriculum_schedule,
    )

    rows = corpus_curriculum_schedule(spark, sf_dir).orderBy(
        F.desc("phase")
    ).collect()
    # cumulative token budget is monotone when consuming best-first
    cums = [r["cum_tokens_from_best"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["phase_tokens"] for r in rows)
    assert abs(sum(r["doc_frac"] for r in rows) - 1.0) < 1e-4


# --- quality-aware canonical selection -------------------------------------


def test_keep_best_prefers_quality_over_id(spark, tmp_path):
    from sri_spark.plans.curation_extra_queries import dedup_cluster_keep_best
    from sri_spark.text.analysis import quality_score

    # two near-identical docs (long shared body, two-token tails so the
    # shingle Jaccard clears the LSH threshold); doc 2 (higher id) has the
    # cleaner tail and must win the canonical slot over min-id doc 1
    shared = " ".join(
        f"token{i} word{i} item{i}" for i in range(20)
    )  # 60 shared tokens
    docs = spark.createDataFrame(
        [(1, f"{shared} 111 !!!"), (2, f"{shared} quiet river")],
        "doc_id long, text string",
    )
    sf = _write(spark, tmp_path, "documents", docs)
    q = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    assert q[2] > q[1], "fixture must make doc 2 higher quality"
    clusters = dedup_cluster_keep_best(spark, sf).collect()
    assert len(clusters) == 1
    c = clusters[0]
    assert c["cluster_id"] == 1  # cluster labeled by min member id
    assert c["keep_doc_id"] == 2  # but canonical = best quality
    assert c["n_members"] == 2


# --- snapshot profile drift ------------------------------------------------


def test_snapshot_drift_profiles_every_declared_column(spark, sf_dir):
    from sri_spark.plans.curation_extra_queries import (
        governance_snapshot_profile_drift,
    )

    rows = governance_snapshot_profile_drift(spark, sf_dir).collect()
    cols = {r["col"] for r in rows}
    assert cols == {"o_totalprice", "o_orderstatus", "o_orderpriority"}
    for r in rows:
        assert r["n_prev"] > 0 and r["n_cur"] > 0
        assert 0.0 <= r["null_rate_prev"] <= 1.0
        assert r["min_prev"] <= r["max_prev"]
