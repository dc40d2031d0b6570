"""Hot-shingle document-frequency cap semantics (dedup/jaccard.py max_df).

The catalog corpus never exceeds the cap (max df 25 < 32 at sf0.1), so the
oracle equality there proves only the identity case; these tests construct a
boilerplate-heavy corpus where the cap actually fires and prove the
documented contract: capped Jaccard is a lower bound of exact Jaccard, and
pairs whose overlap is entirely boilerplate-carried drop out.
"""

from __future__ import annotations

import pytest

from sri_spark.dedup.jaccard import ngram_jaccard_pairs


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    # every doc shares the same 10-word header (8 hot shingles with df=12);
    # docs 0/1 additionally share a unique 8-word body (near-duplicates via
    # non-boilerplate content); docs 2..11 have distinct random-ish bodies
    header = "terms of service apply to all users of this site"
    body_dup = "the quick brown fox jumps over lazy dogs"
    rows = [
        (0, f"{header} {body_dup}"),
        (1, f"{header} {body_dup} extra"),
    ] + [
        (i, f"{header} unique body number {i} words alpha{i} beta{i} gamma{i}")
        for i in range(2, 12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(df, **kw):
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.0, **kw).collect()
    }


def test_capped_jaccard_is_lower_bound(boilerplate_docs):
    exact = _pairs(boilerplate_docs)
    capped = _pairs(boilerplate_docs, max_df=3)  # header shingles df=12 > 3
    # every capped pair exists in exact and never exceeds its exact value
    for pair, j in capped.items():
        assert pair in exact
        assert j <= exact[pair] + 1e-9
    # the (0,1) near-dup pair survives: its overlap is body-carried
    assert capped[(0, 1)] > 0.3


def test_cap_drops_boilerplate_only_pairs(boilerplate_docs):
    exact = _pairs(boilerplate_docs)
    capped = _pairs(boilerplate_docs, max_df=3)
    # pairs among docs 2..11 overlap ONLY on the shared header -> exact sees
    # them, the capped intersection is empty so they vanish entirely
    boiler_pairs = [p for p in exact if p[0] >= 2 and p[1] >= 2]
    assert boiler_pairs, "fixture lost its boilerplate-only pairs"
    assert all(p not in capped for p in boiler_pairs)


def test_cap_above_max_df_is_identity(boilerplate_docs):
    exact = _pairs(boilerplate_docs)
    capped = _pairs(boilerplate_docs, max_df=1000)
    assert capped == exact


def test_jaccard_results_invariant_to_hash_family(spark, sf_dir):
    """The xxhash64 production fast path must produce the exact same pair
    set and Jaccard values as the oracle-reproducible md5 path (hashes are
    an internal representation; set similarity is hash-family-invariant
    absent collisions)."""
    from sri_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    md5_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    xx_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, hasher="xxhash64").collect()
    }
    assert md5_pairs == xx_pairs and md5_pairs


def test_unknown_hasher_rejected(spark):
    import pytest as _pytest

    from sri_spark.dedup.shingles import shingle_hashes_df

    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="hasher"):
        shingle_hashes_df(df, hasher="sha1")
