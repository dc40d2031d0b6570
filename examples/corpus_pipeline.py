"""End-to-end LLM training-corpus pipeline, composed from the library.

    python examples/corpus_pipeline.py [sf_dir]

(defaults to /root/testdata/sf0.001). The canonical curation funnel a
training-data team runs before a pretraining job, each stage the operator
the catalog ships — here chained on real DataFrames so the example shows
the COMPOSITION, not just the stages:

    raw documents
      -> exact dedup            (hash-groupBy, keep first)
      -> near-dedup             (MinHash-LSH pairs -> connected components,
                                 keep cluster representative)
      -> quality gate           (heuristic score + language ID, native exprs)
      -> decontamination        (n-gram overlap vs an eval set, anti-join)
      -> source mixing weights  (per-source token share vs target mix)
      -> shard export           (salted-hash shards, per-shard sorted JSONL)

Every stage is shuffle-bounded and collect-free, so the same script is the
100 TB shape: swap sf_dir for the corpus path and raise n_shards.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from sri_spark.session import get_spark

    spark = get_spark("sri-spark-corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    from sri_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    print(f"raw corpus: {n_raw} docs")

    # 1. exact dedup: normalized text hash, keep the lowest doc_id per group
    from sri_spark.dedup.exact import normalize_text

    fp = F.md5(normalize_text(F.col("text"))).alias("__fp")
    survivors = (
        docs.select("doc_id", fp)
        .groupBy("__fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(survivors, "doc_id", "left_semi")
    n_exact = docs.count()
    print(f"after exact dedup: {n_exact} (-{n_raw - n_exact})")

    # 2. near-dedup: MinHash-LSH candidate pairs, exact-Jaccard verified,
    #    connected components pick one representative per duplicate cluster
    from sri_spark.dedup.components import connected_components
    from sri_spark.dedup.minhash import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs.select("doc_id", "text"), id_col="doc_id", text_col="text",
        threshold=0.5,
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comps = connected_components(pairs, src="src", dst="dst")
    # keep the cluster minimum; docs in no cluster survive by default
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti")
    n_near = docs.count()
    print(f"after near-dedup: {n_near} (-{n_exact - n_near})")

    # 3. quality gate: native-expression score + language ID, no UDFs
    from sri_spark.text.analysis import language_id, quality_score, tokens_col

    toks = tokens_col(F.col("text"))
    docs = (
        docs.withColumn("__toks", toks)
        .withColumn("quality", quality_score(F.col("text"), toks=F.col("__toks")))
        .withColumn("lang_id", language_id(F.col("text"), toks=F.col("__toks")))
    )
    kept = docs.filter(F.col("quality") >= 0.3)
    n_quality = kept.count()
    print(f"after quality gate (score >= 0.3): {n_quality} (-{n_near - n_quality})")

    # 4. decontamination: any doc sharing an 8-gram with the eval set is out.
    #    Eval set here: every 50th doc (stands in for a benchmark suite).
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("__toks") - 8, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, 8)),
    )
    eval_grams = (
        kept.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    train_grams = kept.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    contaminated = train_grams.join(eval_grams, "gram", "left_semi").select(
        "doc_id"
    ).distinct()
    clean = kept.filter(F.col("doc_id") % 50 != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    n_clean = clean.count()
    print(f"after decontamination: {n_clean} (-{n_quality - n_clean}, incl. eval docs)")

    # 5. source mixing report: observed token share per source
    mix = (
        clean.groupBy("source")
        .agg(F.sum(F.size("__toks")).alias("tokens"))
        .withColumn(
            "share",
            F.round(
                F.col("tokens") / F.sum("tokens").over(Window.partitionBy()), 4
            ),
        )
        .orderBy("source")
    )
    print("token mix by source:")
    mix.show(truncate=False)

    # 6. shard export: salted-hash shard + per-shard sorted JSONL
    from sri_spark.sources.export import write_training_shards

    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        write_training_shards(
            clean.select("doc_id", "text", "source", "quality", "lang_id"),
            out,
            id_col="doc_id",
            n_shards=4,
        )
        shards = sorted(
            d for d in os.listdir(out) if d.startswith("shard=")
        )
        back = spark.read.json(os.path.join(out, "shard=*"))
        print(f"exported {back.count()} docs into {len(shards)} shards: {shards}")

    # 7. the ONE-CALL library version of this whole funnel: every stage
    #    above (plus keep-best canonical selection, per-language token
    #    budget and concat-and-chop packing) chained with per-stage
    #    rows-in/rows-out/seconds — the entry point a production job
    #    schedules. Stage counts are pinned to the oracle-checked catalog
    #    queries by tests/test_corpus_pipeline.py; production corpora
    #    decontaminate on 13-grams (the default 3 matches the catalog).
    from sri_spark.etl.corpus_pipeline import run_corpus_pipeline

    with tempfile.TemporaryDirectory() as tmp:
        report = run_corpus_pipeline(
            spark, sf_dir, os.path.join(tmp, "shards"), decontaminate_ngram=13
        )
    print("\nlibrary pipeline (run_corpus_pipeline):")
    for s in report["stages"]:
        print(
            f"  {s['stage']:<20} {s['n_in']:>7} -> {s['n_out']:<7}"
            f" {s['sec']:.2f}s"
        )
    print(
        f"  total {report['total_sec']:.2f}s, "
        f"{report['packed_sequences']} packed sequences, "
        f"{report['n_shards']} shards"
    )

    spark.stop()


if __name__ == "__main__":
    main()
