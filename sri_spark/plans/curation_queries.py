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
    from sri_spark.text.analysis import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokens_col(F.col("text")).alias("__toks")
    )
    scored = docs.select(
        "doc_id",
        "text",
        language_id(F.col("text"), toks=F.col("__toks")).alias("pred_lang"),
        quality_score(F.col("text"), toks=F.col("__toks")).alias("quality"),
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


MIX_ALPHA = 0.7  # sampling temperature: weight ∝ share^alpha (alpha<1
# flattens the domain distribution — the standard multilingual/multi-source
# rebalancing; alpha=1 is proportional, alpha=0 uniform)

_MIXING_ORACLE = f"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
shares AS (
  SELECT source, n_docs,
         n_docs / (sum(n_docs) OVER ()) AS share,
         pow(n_docs / (sum(n_docs) OVER ()), {MIX_ALPHA}) AS w_raw
  FROM per_source
)
SELECT source, n_docs,
       round(share, 6) AS share,
       round(w_raw / sum(w_raw) OVER (), 6) AS mix_weight,
       round((w_raw / sum(w_raw) OVER ()) / share, 6) AS epochs
FROM shares
"""


@register("corpus_mixing_weights", _MIXING_ORACLE)
def corpus_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing: per source, the corpus share, the
    alpha-flattened sampling weight (share^alpha renormalized), and the
    implied epochs multiplier (weight/share — how many times the domain is
    seen relative to proportional sampling). One hash aggregate over the
    corpus + window sums over the |sources|-row result — the heavy pass is
    the count, everything after is metadata-sized."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    w_all = Window.partitionBy()
    share = F.col("n_docs") / F.sum("n_docs").over(w_all)
    shares = per_source.select(
        "source", "n_docs", share.alias("share"), F.pow(share, MIX_ALPHA).alias("w_raw")
    )
    mix = F.col("w_raw") / F.sum("w_raw").over(w_all)
    return shares.select(
        "source",
        "n_docs",
        F.round("share", 6).alias("share"),
        F.round(mix, 6).alias("mix_weight"),
        F.round(mix / F.col("share"), 6).alias("epochs"),
    )


LENGTH_BUCKET_WIDTH = 64  # tokens per bucket — fixed-width integer buckets
# are exactly cross-engine (no float log2 edge cases)

_LENGTH_BUCKETS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != '')) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens, n_tokens // {LENGTH_BUCKET_WIDTH} AS bucket
  FROM toks
)
SELECT bucket,
       (bucket * {LENGTH_BUCKET_WIDTH}) AS lo_tokens,
       ((bucket + 1) * {LENGTH_BUCKET_WIDTH} - 1) AS hi_tokens,
       count(*) AS n_docs,
       min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens,
       round(avg(n_tokens), 6) AS avg_tokens,
       round(1.0 - sum(n_tokens) /
             (count(*) * ((bucket + 1) * {LENGTH_BUCKET_WIDTH} - 1.0)), 6)
         AS pad_waste
FROM b
GROUP BY bucket
"""


@register("corpus_length_buckets", _LENGTH_BUCKETS_ORACLE)
def corpus_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length bucketing for padding-efficient batch assembly: docs
    binned into fixed 64-token buckets, with per-bucket counts, length
    stats, and the padding waste if every doc in the bucket were padded to
    the bucket cap. The per-doc token count is a pure projection (fuses
    into the scan); the only shuffle is the |buckets|-cardinality hash
    aggregate. At training time batches draw from one bucket so attention
    masks waste <= width-1 tokens per row."""
    from sri_spark.text.analysis import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens_col(F.col("text")))
    b = docs.select(
        n_tokens.alias("n_tokens"),
        (n_tokens / LENGTH_BUCKET_WIDTH).cast("long").alias("bucket"),
    )
    cap = (F.col("bucket") + 1) * LENGTH_BUCKET_WIDTH - 1
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.round(
                1.0 - F.sum("n_tokens") / (F.count("*") * (cap.cast("double"))), 6
            ).alias("pad_waste"),
        )
        .select(
            "bucket",
            (F.col("bucket") * LENGTH_BUCKET_WIDTH).alias("lo_tokens"),
            cap.alias("hi_tokens"),
            "n_docs",
            "min_tokens",
            "max_tokens",
            "avg_tokens",
            "pad_waste",
        )
    )


N_SHARDS = 16
_SHARD_SALT = "shard:"
_ORDER_SALT = "order:"

_SHUFFLE_ORACLE = f"""
SELECT doc_id,
       (('0x' || substr(md5('{_SHARD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
         % {N_SHARDS} AS shard,
       (('0x' || substr(md5('{_ORDER_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
         AS sort_key
FROM documents
"""


@register("corpus_shuffle_assign", _SHUFFLE_ORACLE)
def corpus_shuffle_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every doc gets a
    hash shard and an in-shard sort key (salted md5 — rerun-stable,
    partition-layout-independent, resumable; a rand() shuffle changes order
    on every retry). Pure projection — zero shuffles to ASSIGN; the writer
    then does repartition(shard) + sortWithinPartitions(sort_key), one
    exchange, so no per-shard row-numbering (a window rank per shard would
    serialize each shard through one task at 100 TB — the sort key itself
    IS the order)."""
    from sri_spark.functions.hashing import md5_int

    docs = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        (md5_int(F.concat(F.lit(_SHARD_SALT), sid)) % N_SHARDS).alias("shard"),
        md5_int(F.concat(F.lit(_ORDER_SALT), sid)).alias("sort_key"),
    )


_RESAMPLE_SALT = "rs:"

_RESAMPLE_ORACLE = f"""
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
),
shares AS (
  SELECT lang, n_docs,
         n_docs / (sum(n_docs) OVER ()) AS share,
         pow(n_docs / (sum(n_docs) OVER ()), {MIX_ALPHA}) AS w_raw
  FROM per_lang
),
epochs AS (
  SELECT lang,
         CAST(round(1000.0 * (w_raw / sum(w_raw) OVER ()) / share) AS BIGINT)
           AS epochs_milli
  FROM shares
),
planned AS (
  SELECT d.doc_id, d.lang,
         (e.epochs_milli // 1000)
         + CASE WHEN (('0x' || substr(md5('{_RESAMPLE_SALT}' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT)
                     % 1000 < e.epochs_milli % 1000
                THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN epochs e ON d.lang = e.lang
)
SELECT doc_id, lang, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
FROM planned WHERE n_copies > 0
"""


@register("corpus_resample_epochs", _RESAMPLE_ORACLE)
def corpus_resample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature mixture (corpus_mixing_weights) as actual
    training rows: grouped per language (the skewed axis in this corpus), each doc replicated floor(epochs) times, plus one more
    for a deterministic hash-selected fraction of docs so the EXPECTED copy
    count per source equals its epochs multiplier exactly — stochastic
    rounding with a salted key hash instead of rand(), so the materialized
    epoch plan is rerun-stable and resumable.

    Scale shape: one corpus count + window math over the sources-sized
    aggregate, one join of docs to the |sources|-row epochs table
    (AQE-broadcast), then a narrow explode(sequence(1, n_copies)) — no
    shuffle touches the replicated output. Epochs quantized to millis so
    floor/fraction arithmetic is integer-exact cross-engine."""
    from sri_spark.functions.hashing import md5_int

    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w_all = Window.partitionBy()
    share = F.col("n_docs") / F.sum("n_docs").over(w_all)
    shares = per_source.select(
        "lang", share.alias("share"), F.pow(share, MIX_ALPHA).alias("w_raw")
    )
    epochs = shares.select(
        "lang",
        F.round(
            1000.0 * (F.col("w_raw") / F.sum("w_raw").over(w_all)) / F.col("share")
        )
        .cast("long")
        .alias("epochs_milli"),
    )
    h = md5_int(F.concat(F.lit(_RESAMPLE_SALT), F.col("doc_id").cast("string"))) % 1000
    planned = (
        docs.select("doc_id", "lang")
        .join(epochs, "lang")
        .select(
            "doc_id",
            "lang",
            (
                (F.col("epochs_milli") / 1000).cast("long")
                + F.when(h < F.col("epochs_milli") % 1000, 1).otherwise(0)
            ).alias("n_copies"),
        )
    )
    return (
        planned.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy_idx"
            ),
        )
    )


_WSAMPLE_SALT = "wsample-v1"
WSAMPLE_N = 100

_WSAMPLE_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ln(((('0x' || substr(md5('{_WSAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) + 1)
            / 1152921504606846977.0) / n_chars AS k
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars AS weight, round(k, 9) AS sample_key
FROM keyed ORDER BY k DESC, doc_id LIMIT {WSAMPLE_N}
"""


@register("corpus_sample_weighted", _WSAMPLE_ORACLE)
def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, deterministic: the
    Efraimidis-Spirakis A-Res scheme (public "Weighted random sampling with
    a reservoir", IPL 2006) with the uniform drawn from a salted doc_id
    hash instead of rand() — longer documents (weight = n_chars) are
    proportionally more likely to be kept, and reruns select the same
    sample (resumable pipelines, reproducible training mixes).

    key = ln(u)/w orders identically to the paper's u^(1/w) (exp is
    monotone) while avoiding cross-engine pow() rounding; u is shifted to
    (0, 1] so ln never sees 0. One narrow projection + global top-N
    (TakeOrderedAndProject — N rows through the driver, no full sort)."""
    from sri_spark.functions.hashing import md5_int

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        md5_int(F.concat(F.lit(_WSAMPLE_SALT), F.col("doc_id").cast("string"))) + 1
    ) / F.lit(float(2**60 + 1))
    k = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id", "lang", F.col("n_chars").alias("weight"), k.alias("__k")
        )
        .orderBy(F.desc("__k"), F.asc("doc_id"))  # exact key, like the oracle
        .limit(WSAMPLE_N)
        .select(
            "doc_id", "lang", "weight", F.round("__k", 9).alias("sample_key")
        )
    )


FUNNEL_MIN_CHARS = 100
FUNNEL_MIN_QUALITY = 0.65

_FUNNEL_FP = """list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(
                   list_slice(
                     list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'),
                                 x -> x != ''),
                     1, 16),
                   t -> (('0x' || substr(md5(t), 1, 15))::BIGINT) % 1000003)),
               (a, b) -> (a * 131 + b) % 1000000007
             )"""

_FUNNEL_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang,
         length(text)::BIGINT AS n_chars,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != ''))::BIGINT AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS n_punct,
         len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
         row_number() OVER (PARTITION BY {_FUNNEL_FP} ORDER BY doc_id) AS fp_rank
  FROM documents
),
flags AS (
  SELECT doc_id,
         (lang = 'en') AS f1,
         (lang = 'en' AND n_chars >= {FUNNEL_MIN_CHARS}) AS f2,
         (lang = 'en' AND n_chars >= {FUNNEL_MIN_CHARS}
          AND round(0.5 * least(n_tokens / 100.0, 1.0)
              + 0.3 * (1 - round(n_punct / greatest(n_chars, 1), 6))
              + 0.2 * (1 - round(n_digits / greatest(n_chars, 1), 6)), 6)
              >= {FUNNEL_MIN_QUALITY}) AS f3,
         fp_rank = 1 AS keeper
  FROM f
),
agg AS (
  SELECT count(*) AS n0,
         sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS n2,
         sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS n3,
         sum(CASE WHEN f3 AND keeper THEN 1 ELSE 0 END) AS n4
  FROM flags
)
SELECT * FROM (
  SELECT 1 AS stage_idx, 'language' AS stage,
         CAST(n0 AS BIGINT) AS n_in, CAST(n1 AS BIGINT) AS n_out,
         CAST(n0 - n1 AS BIGINT) AS n_dropped FROM agg
  UNION ALL
  SELECT 2, 'min_length', CAST(n1 AS BIGINT), CAST(n2 AS BIGINT), CAST(n1 - n2 AS BIGINT) FROM agg
  UNION ALL
  SELECT 3, 'quality', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT), CAST(n2 - n3 AS BIGINT) FROM agg
  UNION ALL
  SELECT 4, 'near_dedup', CAST(n3 AS BIGINT), CAST(n4 AS BIGINT), CAST(n3 - n4 AS BIGINT) FROM agg
)
"""


@register("corpus_curation_funnel", _FUNNEL_ORACLE)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel with per-stage drop accounting — the report every
    corpus pipeline publishes (language filter -> min length -> quality
    threshold -> near-dup keeper, cumulative). One scan computes all stage
    flags; the only shuffle is the fingerprint keeper window (partitioned by
    the 16-token-prefix fingerprint — per-block sorts); the counts collapse
    in a single aggregate and unpivot via stack(), so the funnel costs one
    pass regardless of stage count."""
    from sri_spark.text.analysis import doc_fingerprint, quality_score

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(doc_fingerprint(F.coalesce(F.col("text"), F.lit("")), prefix=16)).orderBy(
        "doc_id"
    )
    flags = docs.select(
        (F.col("lang") == "en").alias("f1"),
        ((F.col("lang") == "en") & (F.length("text") >= FUNNEL_MIN_CHARS)).alias("f2"),
        (
            (F.col("lang") == "en")
            & (F.length("text") >= FUNNEL_MIN_CHARS)
            & (quality_score(F.col("text")) >= FUNNEL_MIN_QUALITY)
        ).alias("f3"),
        (F.row_number().over(w) == 1).alias("keeper"),
    )
    agg = flags.agg(
        F.count("*").alias("n0"),
        F.sum(F.when(F.col("f1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("f2"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("f3"), 1).otherwise(0)).alias("n3"),
        F.sum(F.when(F.col("f3") & F.col("keeper"), 1).otherwise(0)).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(4, "
            "1, 'language',   n0, n1, "
            "2, 'min_length', n1, n2, "
            "3, 'quality',    n2, n3, "
            "4, 'near_dedup', n3, n4"
            ") AS (stage_idx, stage, n_in, n_out)"
        )
    ).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_out").cast("long").alias("n_out"),
        (F.col("n_in") - F.col("n_out")).cast("long").alias("n_dropped"),
    )


TOKEN_BUDGET_PER_LANG = 4000  # tokens per language in the assembled mix

_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != ''))::BIGINT AS n_tokens,
         round(0.5 * least(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                           x -> x != '')) / 100.0, 1.0)
             + 0.3 * (1 - round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                                / greatest(length(text), 1), 6))
             + 0.2 * (1 - round(len(regexp_extract_all(text, '[0-9]'))
                                / greatest(length(text), 1), 6)), 6) AS quality
  FROM documents
),
ranked AS (
  SELECT doc_id, lang, n_tokens, quality,
         sum(n_tokens) OVER (PARTITION BY lang
                             ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM scored
)
SELECT doc_id, lang, n_tokens, quality,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
"""


@register("corpus_token_budget_select", _BUDGET_ORACLE)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus assembly: per language, take documents in
    descending quality order until the token budget fills (greedy knapsack
    by density — the standard mix-assembly heuristic). The cumulative-sum
    window partitions BY LANGUAGE, so each sort is per-stratum — the
    global-budget variant would need one total order and is exactly the
    kind of single-partition window this catalog avoids (run this shape
    per stratum, then reconcile budgets driver-side)."""
    from sri_spark.text.analysis import quality_score, tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", tokens_col(F.col("text")).alias("__toks")
    )
    scored = docs.select(
        "doc_id",
        "lang",
        F.size("__toks").cast("long").alias("n_tokens"),
        quality_score(F.col("text"), toks=F.col("__toks")).alias("quality"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET_PER_LANG)
    )
