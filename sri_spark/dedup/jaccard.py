"""n-gram Jaccard near-duplicate pairs — the exact (quadratic-in-collisions)
baseline that MinHash-LSH approximates.

Plan shape: hashed shingles (narrow; 8-byte keys, strings never shuffle) →
self-equi-join on the shingle hash (shuffle on an 8-byte key) → pair-count
aggregate → join per-doc shingle sizes → Jaccard filter. The self-join cost
is bounded by shingle collision counts, not |docs|²; hot shingles
(boilerplate) are the skew risk at scale — AQE skew-join handles moderate
cases, MinHash-LSH is the real scale path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sri_spark.dedup.shingles import shingle_hashes_df
from sri_spark.operators.caching import scoped_persist


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    hasher: str = "md5",
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for all pairs with Jaccard >= threshold over
    word n-gram shingle sets; doc_a < doc_b. See
    `jaccard_pairs_from_shingles` for `max_df` (hot-shingle cap) and
    `shingle_hashes_df` for `hasher` ('xxhash64' is the faster production
    path; the PAIR RESULTS are hash-family-invariant absent collisions,
    only the oracle-reproducibility of intermediate hashes differs)."""
    # the shingle set feeds both join sides and the size aggregate — persist
    # so tokenize+distinct runs once (scoped: harnesses release it between
    # queries via operators.caching.unpersist_all)
    sh = scoped_persist(shingle_hashes_df(df, text_col, id_col, n, hasher=hasher))
    return jaccard_pairs_from_shingles(
        sh, id_col=id_col, threshold=threshold, max_df=max_df
    )


def jaccard_pairs_from_shingles(
    sh: DataFrame,
    *,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Jaccard pairs from a precomputed distinct (id, shingle_h) set —
    callers that reuse the shingle set elsewhere (MinHash verification) pass
    the same DataFrame, persisted once, instead of re-tokenizing per
    consumer.

    Singleton shingles (in exactly one doc) cannot contribute to any
    intersection, so the self-join runs only over shared shingles — on
    natural-text corpora that drops most of the join input while leaving the
    result bit-identical (sizes still count every shingle).

    `max_df` is the standard hot-shingle guard that bounds the quadratic
    blowup: shingles appearing in more than `max_df` documents (boilerplate —
    headers, license text, navigation chrome) are EXCLUDED from the
    intersection join, capping the join's output at C(max_df, 2) pairs per
    shingle regardless of corpus size. Sizes still count every shingle, so
    capped Jaccard is a lower bound of exact Jaccard: the tradeoff is recall
    on pairs whose overlap is carried by boilerplate (which are usually the
    pairs you don't want to call near-duplicates anyway). `None` = exact."""
    return (
        _pair_overlap(sh, id_col=id_col, max_df=max_df)
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs_from_shingles(
    sh: DataFrame,
    *,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup: containment |A∩B| / min(|A|, |B|) >= threshold.

    Jaccard under-scores pairs of very unequal length (a paragraph quoted
    inside a long article has tiny Jaccard but containment ≈ 1) — this is
    the standard quote/subset detector next to it (the Broder resemblance /
    containment pair). Same intermediates as Jaccard: the shared-shingle
    intersection join and the per-doc size table."""
    o = _pair_overlap(sh, id_col=id_col, max_df=max_df)
    cont = F.col("inter") / F.least(F.col("na"), F.col("nb"))
    return (
        o.withColumn("containment", F.round(cont, 6))
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def _pair_overlap(
    sh: DataFrame, *, id_col: str, max_df: int | None
) -> DataFrame:
    """(doc_a, doc_b, inter, na, nb) for every candidate pair sharing a
    shingle: singleton shingles are pruned (they cannot intersect), hot
    shingles optionally df-capped, sizes joined without broadcast hints —
    the size tables are one row per document, "small" only at test scale;
    a forced BroadcastExchange on them OOMs at a billion docs, so AQE
    decides."""
    shared = sh.groupBy("shingle_h").agg(F.count("*").alias("__df"))
    if max_df is not None:
        shared = shared.filter(F.col("__df") <= max_df)
    shared = shared.filter(F.col("__df") >= 2).select("shingle_h")
    sh_shared = sh.join(shared, "shingle_h")
    a = sh_shared.select(F.col(id_col).alias("doc_a"), "shingle_h")
    b = sh_shared.select(F.col(id_col).alias("doc_b"), "shingle_h")
    inter = (
        a.join(b, "shingle_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("nb"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")
