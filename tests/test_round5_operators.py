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
    def _ord(v):
        # min/max are STRINGIFIED in the profile; compare numerically
        # when the column is numeric (lexicographic '999.9' > '49955.17'
        # would be a false failure), lexicographically otherwise
        try:
            return float(v)
        except ValueError:
            return v

    for r in rows:
        assert r["n_prev"] > 0 and r["n_cur"] > 0
        assert 0.0 <= r["null_rate_prev"] <= 1.0
        assert _ord(r["min_prev"]) <= _ord(r["max_prev"])


# --- randomized oracles (hypothesis) ---------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HSETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _py_phrase_truth(texts):
    """Pure-Python phrase oracle: global top bigram (count desc, then
    lexicographic), then per-doc adjacent-occurrence counts, top 10 by
    (count desc, doc_id)."""
    from collections import Counter

    big = Counter()
    per_doc = []
    for text in texts:
        toks = [t for t in text.lower().split() if t]
        bigrams = list(zip(toks, toks[1:]))
        per_doc.append(Counter(bigrams))
        big.update(bigrams)
    if not big:
        return None, {}
    top = min(big, key=lambda k: (-big[k], k))
    hits = {i: c[top] for i, c in enumerate(per_doc) if c[top] > 0}
    ranked = sorted(hits.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return top, dict(ranked)


@settings(**_HSETTINGS)
@given(texts=_corpus)
def test_phrase_matches_python_oracle(spark, tmp_path_factory, texts):
    from sri_spark.plans.curation_extra_queries import (
        retrieval_phrase_top_docs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = tmp_path_factory.mktemp("phrase_prop")
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    rows = retrieval_phrase_top_docs(spark, str(out)).collect()
    top, want = _py_phrase_truth(texts)
    if top is None:
        assert rows == []
        return
    got = {r["doc_id"]: r["n_hits"] for r in rows}
    assert got == want
    if rows:
        assert (rows[0]["phrase_w1"], rows[0]["phrase_w2"]) == top


@settings(**_HSETTINGS)
@given(
    quals=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    )
)
def test_curriculum_bins_match_python_oracle(spark, tmp_path_factory, quals):
    """The curriculum's FIXED-bin phase assignment is pure arithmetic:
    rebuild it in Python from the same quality scores Spark computes and
    compare doc counts per phase."""
    from sri_spark.plans.curation_extra_queries import (
        corpus_curriculum_schedule,
    )
    from sri_spark.text.analysis import quality_score

    # synthesize docs whose text yields a spread of quality scores by
    # varying length/digits — then read back SPARK's own quality to
    # drive the python oracle (the binning is what's under test)
    texts = [
        (i, " ".join(["tok"] * max(1, int(q * 120))) + (" 99" if q < 0.3 else ""))
        for i, q in enumerate(quals)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    out = tmp_path_factory.mktemp("curr_prop")
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    sq = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", quality_score(F.col("text")).alias("q")
        ).collect()
    }
    from collections import Counter

    want = Counter(min(int(q * 10), 9) for q in sq.values())
    got = {
        r["phase"]: r["n_docs"]
        for r in corpus_curriculum_schedule(spark, str(out)).collect()
    }
    assert got == dict(want)
