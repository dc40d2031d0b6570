"""Span-grain exact substring deduplication, relationally.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better", arXiv:2107.06499) remove repeated *substrings* across a corpus,
not just whole duplicate documents, because boilerplate (license headers,
navigation chrome, templated sentences) repeats inside otherwise-unique
pages. Their suffix-array implementation is a single-machine algorithm; the
shuffle-friendly re-expression used at corpus scale is span (a.k.a.
paragraph/line) dedup: cut every document into fixed-width token windows,
hash each window, and keep only the first occurrence of each window
globally.

Relational shape (all narrow per-row work + ONE shuffle):

1. tokenize + window per row — fuses into the parquet scan (higher-order
   array functions, no Python);
2. posexplode to (doc_id, span_idx, span) rows — still narrow;
3. `row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx)` —
   the only exchange, a hash shuffle on the span key. Occurrence 1 is the
   keeper; everything else is removable boilerplate.

100 TB notes: partitioning by raw span text ships the full text through
the shuffle; `mark_duplicate_spans(..., hash_key=True)` shuffles a 64-bit
xxhash of the span instead (collision odds ~n²/2⁶⁵ — acceptable for
dedup, not for exact reporting; the catalog queries keep the text key so
the DuckDB oracle can reproduce them). Hot spans (empty boilerplate) are
exactly the rows the dedup removes, and row_number degrades gracefully on
a hot key because only rank 1 is kept per partition.

The reference has no substring dedup (it is an additive mandate family);
grain and first-occurrence semantics mirror dedup/exact.py's
whole-document rule (reference dedup cite: dags/sri_vehiculos_etl_dag.py:158).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SPAN_TOKENS = 8


def _tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased — same normalization as
    dedup.shingles so span and shingle families agree on token grain."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != "")


def explode_spans(
    docs: DataFrame,
    *,
    k: int = SPAN_TOKENS,
    text_col: str = "text",
) -> DataFrame:
    """One row per k-token window of each document.

    Adds `span_idx` (0-based window position), `span` (space-joined window
    text) and `span_tokens` (window width — the last window may be
    shorter). All other input columns pass through. Every expression here
    is a per-row higher-order array function: the stage is narrow and
    whole-stage-codegen'd, so it fuses into the scan."""
    toks = _tokens(F.col(text_col))
    with_t = docs.withColumn("__t", toks).withColumn("__n", F.size(F.col("__t")))
    # guard: F.sequence(0, -1) would yield [0, -1] (descending), not empty
    windows = F.when(
        F.col("__n") > 0,
        F.transform(
            F.sequence(F.lit(0), (F.ceil(F.col("__n") / k) - 1).cast("int")),
            lambda i: F.slice(F.col("__t"), i * k + 1, k),
        ),
    ).otherwise(F.lit(None).cast("array<array<string>>"))
    passthrough = [c for c in docs.columns if c != "__t"]
    return (
        with_t.select(*passthrough, F.posexplode(windows).alias("span_idx", "__w"))
        .withColumn("span", F.array_join(F.col("__w"), " "))
        .withColumn("span_tokens", F.size(F.col("__w")))
        .drop("__w")
    )


def mark_duplicate_spans(
    spans: DataFrame,
    *,
    hash_key: bool = False,
    order_cols: tuple[str, ...] = ("doc_id", "span_idx"),
) -> DataFrame:
    """Rank every occurrence of each span globally; `occurrence > 1` is a
    duplicate. `order_cols` defines "first" (deterministic across reruns).

    `hash_key=True` shuffles on xxhash64(span) instead of the span text —
    the 100 TB shape (fixed-width shuffle key regardless of span length)."""
    key = F.xxhash64(F.col("span")) if hash_key else F.col("span")
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return spans.withColumn("occurrence", F.row_number().over(w)).withColumn(
        "is_dup", F.col("occurrence") > 1
    )


def dedup_spans(docs: DataFrame, *, k: int = SPAN_TOKENS, hash_key: bool = True) -> DataFrame:
    """End-to-end: rebuild each document with duplicate spans removed.

    Keeps occurrence-1 spans only, then reassembles per-document text in
    span order. The reassembly groupBy shuffles on doc_id — bounded fan-in
    (a document's own span count), no skew hazard."""
    kept = mark_duplicate_spans(explode_spans(docs, k=k), hash_key=hash_key).filter(
        ~F.col("is_dup")
    )
    others = [c for c in docs.columns if c != "text"]
    return (
        kept.groupBy(*others)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("span_idx"), F.col("span")))
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("text"),
            F.sum(F.col("span_tokens")).cast("long").alias("kept_tokens"),
        )
    )
