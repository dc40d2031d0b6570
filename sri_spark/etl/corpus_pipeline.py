"""The composed LLM-corpus curation pipeline — every already-verified
stage chained into ONE measured run (round-5 verdict item 6): the mandate
surface's analogue of `etl/pipeline.py`'s SRI star replay.

    langID -> quality gate -> exact dedup -> near-dup keep-best
    -> decontaminate -> token-budget select -> pack -> shard export

Each stage reuses the SAME operator the corresponding oracle-checked
catalog query runs — `language_id`/`quality_score` (text/analysis.py),
the md5 survivorship window (plans/curation_queries.py ::
corpus_select_training), `keep_best_members`
(plans/curation_extra_queries.py :: dedup_cluster_keep_best), the
benchmark-shingle semi-join (plans/training_queries.py ::
corpus_decontaminate), the per-language budget window
(corpus_token_budget_select), `pack_sequences` (operators/packing.py) and
`write_training_shards` (sources/export.py) — so
tests/test_corpus_pipeline.py can assert the pipeline's per-stage counts
against the individual catalog queries' outputs, and the bench block
(`corpus_pipeline_replay`) measures the composition the catalog verifies
piecewise.

Stage-boundary semantics chosen for corpus-scale correctness:

- The language/quality/exact-dedup cascade equals corpus_select_training
  exactly: exact duplicates share text, hence share language and quality,
  so ranking within the filtered set keeps the same survivor as ranking
  before filtering.
- Near-dup clusters are computed CORPUS-WIDE (the keep/drop decision is a
  property of the corpus, not of which filters ran first — and this keeps
  the decision identical to dedup_cluster_keep_best's). Survivors then
  drop any doc that is a non-canonical member of a corpus-wide cluster.
- The benchmark slice is defined corpus-wide too (the eval suite does not
  shrink because filters ran); contamination per doc depends only on the
  doc's own shingles vs the bench shingles, so flags match
  corpus_decontaminate's row for row.

Scale shape: every stage is a projection/filter, a bucketed join, or a
bounded-frame window; stage frames are persisted only to attribute wall
time per stage (at 100 TB these boundaries would be checkpointed tables,
which is the same materialization decision).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.functions.hashing import md5_int
from sri_spark.operators.packing import pack_sequences
from sri_spark.sources.export import write_training_shards
from sri_spark.sources.testdata import load_table
from sri_spark.text.analysis import language_id, quality_score, tokens_col

N_EXPORT_SHARDS = 8


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    export_dir: str,
    *,
    decontaminate_ngram: int = 3,
) -> dict:
    """Run the full curation pipeline over `sf_dir`'s documents table,
    exporting training shards to `export_dir`. Returns
    {"stages": [{stage, n_in, n_out, sec}...], "total_sec", "n_shards",
    "packed_sequences"} — rows-in/rows-out/seconds per stage.

    `decontaminate_ngram` is the overlap grain of the benchmark-
    decontamination stage. The default 3 matches the corpus_decontaminate
    catalog query and its DuckDB oracle exactly (the parity contract
    tests/test_corpus_pipeline.py pins at sf0.01). Production corpora
    decontaminate on much longer spans — the GPT-3 paper used 13-gram
    overlap — because on a phrase-repetitive corpus ANY-3-gram overlap
    flags essentially everything (measured: 100% of sf0.1 training docs
    share a 3-gram with the 3% bench slice; at 13-gram it is 18 of
    4,833). The bench replay runs the production grain so the
    budget/pack/export tail is exercised on real volume. Every stage is
    empty-safe: a filter that drops all rows yields an empty (schema'd)
    export, not a failure."""
    from sri_spark.plans.curation_extra_queries import keep_best_members
    from sri_spark.plans.curation_queries import (
        QUALITY_FLOOR,
        TOKEN_BUDGET_PER_LANG,
    )
    from sri_spark.plans.training_queries import (
        BENCH_PCT,
        BENCH_SALT,
        PACK_BUDGET,
    )

    t_start = time.perf_counter()
    stages: list[dict] = []
    persisted: list[DataFrame] = []

    def _stage(name: str, n_in: int, df: DataFrame) -> tuple[DataFrame, int]:
        df = df.persist()
        persisted.append(df)
        t0 = time.perf_counter()
        n_out = df.count()
        stages.append(
            {
                "stage": name,
                "n_in": n_in,
                "n_out": n_out,
                "sec": round(time.perf_counter() - t0, 4),
            }
        )
        return df, n_out

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    # one enrichment pass: tokenization feeds langID, quality AND token
    # counts — scan the text column once, not three times
    toks = tokens_col(F.col("text"))
    enriched, n0 = _stage(
        "score",
        -1,
        docs.select(
            "doc_id",
            "lang",
            "source",
            "text",
            language_id(F.col("text"), toks=toks).alias("pred_lang"),
            F.size(toks).cast("long").alias("n_tokens"),
            quality_score(F.col("text"), toks=toks).alias("quality"),
        ),
    )
    stages[-1]["n_in"] = n0  # the scoring stage is 1:1

    s_lang, n1 = _stage("lang_id", n0, enriched.filter(F.col("pred_lang") == "en"))
    s_qual, n2 = _stage(
        "quality_gate", n1, s_lang.filter(F.col("quality") >= QUALITY_FLOOR)
    )
    # exact-dedup survivorship: identical text => identical lang/quality,
    # so ranking within the filtered set matches corpus_select_training's
    # rank-before-filter exactly (see module docstring)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    s_exact, n3 = _stage(
        "exact_dedup",
        n2,
        s_qual.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk"),
    )

    # corpus-wide near-dup canonical selection (dedup_cluster_keep_best's
    # operator): drop survivors that are non-keeper members of a cluster.
    # The persisted enrichment pass already scored the whole corpus, so
    # hand that frame over instead of paying a second full-text scan
    non_canonical = (
        keep_best_members(docs, quality=enriched.select("doc_id", "quality"))
        .filter(F.col("rk") != 1)
        .select("doc_id")
    )
    s_neardup, n4 = _stage(
        "near_dup_keep_best", n3, s_exact.join(non_canonical, "doc_id", "left_anti")
    )

    # benchmark decontamination (corpus_decontaminate's operator): the
    # bench slice is a corpus-wide deterministic hash slice; drop bench
    # members themselves plus any survivor sharing a 3-gram with them
    from sri_spark.dedup.shingles import shingle_hashes_df

    bench_bucket = md5_int(
        F.concat(F.lit(BENCH_SALT), F.col("doc_id").cast("string"))
    ) % 100
    bench_docs = docs.filter(bench_bucket < BENCH_PCT).select("doc_id", "text")
    bench_sh = (
        shingle_hashes_df(bench_docs, "text", "doc_id", n=decontaminate_ngram)
        .select("shingle_h")
        .distinct()
    )
    train = s_neardup.filter(bench_bucket >= BENCH_PCT)
    contaminated = (
        shingle_hashes_df(
            train.select("doc_id", "text"), "text", "doc_id", n=decontaminate_ngram
        )
        .join(bench_sh, "shingle_h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    s_decon, n5 = _stage(
        "decontaminate", n4, train.join(contaminated, "doc_id", "left_anti")
    )

    # per-language token-budget assembly (corpus_token_budget_select's
    # window: per-stratum sort, never a global order)
    wb = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s_budget, n6 = _stage(
        "token_budget",
        n5,
        s_decon.withColumn(
            "cum_tokens", F.sum("n_tokens").over(wb).cast("long")
        ).filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG),
    )

    # concat-and-chop packing (operators/packing.py two-phase prefix sum)
    s_packed, n7 = _stage(
        "pack",
        n6,
        pack_sequences(
            s_budget.select("doc_id", "lang", "source", "text", "n_tokens"),
            budget=PACK_BUDGET,
        ),
    )
    n_sequences = s_packed.select("seq_id").distinct().count()

    # deterministic shard export (sources/export.py): hash membership,
    # per-shard local sort, idempotent overwrite
    t0 = time.perf_counter()
    export_df = s_packed.select(
        "doc_id", "lang", "source", "n_tokens", "seq_id", "text"
    )
    write_training_shards(
        export_df, export_dir, id_col="doc_id", n_shards=N_EXPORT_SHARDS
    )
    # read back with the EXPLICIT export schema: JSON inference needs at
    # least one data file, so an all-rows-filtered (empty) export would
    # crash the read-back count instead of reporting 0
    n_exported = spark.read.schema(export_df.schema).json(export_dir).count()
    stages.append(
        {
            "stage": "shard_export",
            "n_in": n7,
            "n_out": n_exported,
            "sec": round(time.perf_counter() - t0, 4),
        }
    )

    for df in persisted:
        df.unpersist()
    return {
        "stages": stages,
        "total_sec": round(time.perf_counter() - t_start, 4),
        "n_shards": N_EXPORT_SHARDS,
        "packed_sequences": n_sequences,
        "decontaminate_ngram": decontaminate_ngram,
    }
