"""End-to-end corpus curation: the composed training-data selection a
large-scale pipeline actually runs — language filter + quality floor +
exact-dedup survivorship in one declarative plan (filters fuse into the
scan pass; the only shuffle is the dedup hash-groupBy)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.plans.text_queries import _LANG_ORACLE, _QUALITY_ORACLE
from sri_spark.sources.testdata import load_table
from sri_spark.text.analysis import language_id, quality_score

QUALITY_FLOOR = 0.7

_CURATION_ORACLE = f"""
WITH lang AS ({_LANG_ORACLE}),
q AS ({_QUALITY_ORACLE}),
survivors AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
  FROM documents
)
SELECT d.doc_id, l.pred_lang, q.quality
FROM documents d
JOIN lang l ON d.doc_id = l.doc_id
JOIN q ON d.doc_id = q.doc_id
JOIN survivors s ON d.doc_id = s.doc_id
WHERE l.pred_lang = 'en' AND q.quality >= {QUALITY_FLOOR} AND s.rk = 1
"""


@register("corpus_select_training", _CURATION_ORACLE)
def corpus_select_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus selection: English, quality >= 0.7, first copy of
    each exact-duplicate group. Language/quality are pure projections; the
    survivorship rank is one window over the content hash."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "text",
        language_id(F.col("text")).alias("pred_lang"),
        quality_score(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(
            (F.col("pred_lang") == "en")
            & (F.col("quality") >= QUALITY_FLOOR)
            & (F.col("rk") == 1)
        )
        .select("doc_id", "pred_lang", "quality")
    )


SAMPLE_RATES = {"en": 80, "es": 40, "zh": 40}  # percent; other langs 20
SAMPLE_DEFAULT = 20
_SAMPLE_SALT = "sample:"

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items())
    + f" ELSE {SAMPLE_DEFAULT} END"
)

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang,
       (('0x' || substr(md5('{_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
         % 100 AS bucket
FROM documents
WHERE (('0x' || substr(md5('{_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
         % 100 < {_RATE_CASE}
"""


@register("corpus_sample_stratified", _SAMPLE_ORACLE)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling by deterministic key hash (not
    rand()): bucket = md5(salt || doc_id) % 100, keep buckets below the
    language's rate. Rerun-stable, partition-layout-independent, and
    resumable — the sampling contract a 100 TB curation pipeline needs;
    a rand()-based sample changes membership on every retry/re-shuffle.
    Pure projection + filter: fuses into the scan, zero shuffles."""
    from sri_spark.functions.hashing import md5_int

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_int(F.concat(F.lit(_SAMPLE_SALT), F.col("doc_id").cast("string"))) % 100
    )
    rate = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]
        )[F.col("lang")],
        F.lit(SAMPLE_DEFAULT),
    )
    return docs.select(
        "doc_id", "lang", bucket.alias("bucket")
    ).filter(F.col("bucket") < rate)
