"""Invariant tests for the round-3 operator additions (EWMA, histogram,
containment, weighted sample, basket pairs, funnel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sri_spark.plans.curation_queries import WSAMPLE_N, corpus_sample_weighted
from sri_spark.plans.dedup_queries import dedup_containment
from sri_spark.plans.surface_extra import (
    BASKET_MIN_SUPPORT,
    agg_histogram,
    orders_basket_pairs,
)
from sri_spark.plans.timeseries_queries import events_ewma
from sri_spark.sources.testdata import load_table


def test_ewma_first_row_equals_value_and_bounds(spark, sf_dir):
    rows = events_ewma(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        first = user_rows[0]
        assert abs(first["ewma"] - first["value"]) < 1e-6
        vals = [r["value"] for r in user_rows]
        lo, hi = min(vals), max(vals)
        for r in user_rows:  # convex combination stays inside the envelope
            assert lo - 1e-6 <= r["ewma"] <= hi + 1e-6


def test_ewma_constant_series_is_identity(spark):
    df = spark.createDataFrame(
        [(1, i, float(7.5)) for i in range(10)], "user_id long, event_id long, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1_000_000))
    from pyspark.sql import Window

    from sri_spark.plans.timeseries_queries import _EWMA_W

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num = sum(
        F.coalesce(F.lag("value", k).over(w) * F.lit(wt), F.lit(0.0))
        for k, wt in enumerate(_EWMA_W)
    )
    den = sum(
        F.when(F.lag("value", k).over(w).isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        for k, wt in enumerate(_EWMA_W)
    )
    out = df.select((num / den).alias("ewma")).collect()
    assert all(abs(r["ewma"] - 7.5) < 1e-9 for r in out)


def test_histogram_counts_total_and_bounds(spark, sf_dir):
    hist = agg_histogram(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r["n"] for r in hist) == orders.count()
    from sri_spark.plans.surface_extra import HIST_BIN_WIDTH

    for r in hist:
        assert r["bin_lo"] <= r["min_v"] <= r["max_v"] < r["bin_lo"] + HIST_BIN_WIDTH


def test_containment_dominates_jaccard(spark, sf_dir):
    """containment >= jaccard for every pair (min-denominator vs union)."""
    from sri_spark.plans.dedup_queries import dedup_ngram_jaccard

    cont = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup_containment(spark, sf_dir).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert cont, "containment found no pairs at test SF"
    for pair, j in jac.items():
        if pair in cont:
            assert cont[pair] >= j - 1e-6


def test_weighted_sample_size_and_determinism(spark, sf_dir):
    s1 = corpus_sample_weighted(spark, sf_dir).collect()
    s2 = corpus_sample_weighted(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(s1) == min(WSAMPLE_N, n_docs)
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    # keys are valid A-Res keys: ln(u)/w <= 0, strictly increasing weight
    # cannot decrease a doc's key given the same u — spot-check monotonic sign
    assert all(r["sample_key"] <= 0 for r in s1)


def test_basket_pairs_support_floor_and_symmetry(spark, sf_dir):
    rows = orders_basket_pairs(spark, sf_dir).collect()
    for r in rows:
        assert r["support"] >= BASKET_MIN_SUPPORT
        assert r["part_a"] < r["part_b"]


def test_funnel_is_monotone(spark, sf_dir):
    from sri_spark.plans.curation_queries import corpus_curation_funnel

    rows = sorted(
        corpus_curation_funnel(spark, sf_dir).collect(), key=lambda r: r["stage_idx"]
    )
    assert [r["stage"] for r in rows] == [
        "language",
        "min_length",
        "quality",
        "near_dedup",
    ]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_in"] == prev["n_out"]  # cumulative stages chain
    for r in rows:
        assert r["n_dropped"] == r["n_in"] - r["n_out"] >= 0


# --- round-4 span-dedup invariants (hypothesis-driven) -----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcde", min_size=1, max_size=4)
_text = st.lists(_word, min_size=0, max_size=40).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_span_partition_is_lossless(spark, texts):
    """Spans partition the token sequence: re-joining a doc's spans in
    span_idx order reproduces its normalized token stream exactly."""
    from sri_spark.dedup.spans import explode_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    spans = explode_spans(df, k=5).collect()
    rebuilt: dict[int, list] = {}
    for r in sorted(spans, key=lambda r: (r.doc_id, r.span_idx)):
        rebuilt.setdefault(r.doc_id, []).append(r.span)
        assert r.span_tokens == len(r.span.split(" "))
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().strip().split() if w]
        got = " ".join(rebuilt.get(i, []))
        assert got == " ".join(toks)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_span_dedup_keeps_exactly_one_occurrence(spark, texts):
    from sri_spark.dedup.spans import explode_spans, mark_duplicate_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    marked = mark_duplicate_spans(explode_spans(df, k=5)).collect()
    keepers: dict[str, int] = {}
    for r in marked:
        if r.occurrence == 1:
            keepers[r.span] = keepers.get(r.span, 0) + 1
        else:
            assert r.is_dup
    # one keeper per distinct span value, and the keeper is the minimal
    # (doc_id, span_idx) occurrence
    assert all(v == 1 for v in keepers.values())
    firsts = {}
    for r in marked:
        key = r.span
        if key not in firsts or (r.doc_id, r.span_idx) < firsts[key][:2]:
            firsts[key] = (r.doc_id, r.span_idx, r.occurrence)
    assert all(occ == 1 for _, _, occ in firsts.values())
