"""Statistical language-model style corpus analytics (mandate items — the
reference has no text surface): Zipf-law fit over the token frequency
distribution and a bigram-LM log-probability quality score per document.

Both are the public CCNet/Gopher-style corpus-quality patterns: a corpus
whose token frequencies deviate hard from Zipf is suspect (OCR noise,
boilerplate), and per-document LM log-prob is the standard "does this read
like natural language" filter (here a corpus-fit bigram MLE instead of an
external KenLM binary, so the operator is self-contained and
oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table
from sri_spark.text.analysis import tokens_col

_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)

_ZIPF_MIN_CNT = 2
_ZIPF_MAX_TYPES = 100_000

_ZIPF_ORACLE = f"""
WITH counts AS (
  SELECT tok AS token, count(*) AS cnt
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  GROUP BY 1
),
head AS (
  SELECT token, cnt FROM counts WHERE cnt >= {_ZIPF_MIN_CNT}
  ORDER BY cnt DESC, token LIMIT {_ZIPF_MAX_TYPES}
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
  FROM head
)
SELECT count(*) AS n_types,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       round(regr_slope(ln(cnt), ln(rnk)), 6) AS zipf_slope,
       round(regr_intercept(ln(cnt), ln(rnk)), 6) AS zipf_intercept,
       round(regr_r2(ln(cnt), ln(rnk)), 6) AS zipf_r2
FROM ranked
"""


@register("text_zipf_stats", _ZIPF_ORACLE)
def text_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit: log-log linear regression of token frequency on rank
    over the FITTED HEAD of the distribution — types with
    cnt >= _ZIPF_MIN_CNT (2), capped at the top _ZIPF_MAX_TYPES (100,000)
    by frequency. The floor drops hapaxes (noise for the fit and, on a
    web corpus, ~half the 10^8-10^9-type vocabulary); the cap turns the
    global sort into a TakeOrderedAndProject (per-partition top-100k +
    driver merge), so the rank window runs on a CONSTANT-bounded frame
    regardless of corpus size — the same bounded-by-construction argument
    as stats_ks_two_sample's 100 bins, instead of a single-partition sort
    of an unbounded vocabulary. Corpus-sized work is one explode + hash
    aggregate; ties in cnt permute ranks only among equal frequencies, so
    the fitted line is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    head = (
        counts.filter(F.col("cnt") >= _ZIPF_MIN_CNT)
        .orderBy(F.col("cnt").desc(), "token")
        .limit(_ZIPF_MAX_TYPES)
    )
    ranked = head.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "token"))
        .alias("rnk"),
    )
    ln_cnt = F.log(F.col("cnt").cast("double"))
    ln_rnk = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count("*").alias("n_types"),
        F.sum("cnt").alias("n_tokens"),
        F.round(F.regr_slope(ln_cnt, ln_rnk), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_cnt, ln_rnk), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_cnt, ln_rnk), 6).alias("zipf_r2"),
    )


_BIGRAM_LM_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i])) AS w1,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i + 1])) AS w2
  FROM t
),
big_cnt AS (SELECT w1, w2, count(*) AS c2 FROM grams GROUP BY 1, 2),
uni_cnt AS (SELECT w1, sum(c2) AS c1 FROM big_cnt GROUP BY 1),
scored AS (
  SELECT g.doc_id, ln(b.c2 / u.c1) AS lp
  FROM grams g
  JOIN big_cnt b ON g.w1 = b.w1 AND g.w2 = b.w2
  JOIN uni_cnt u ON g.w1 = u.w1
)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(lp), 6) AS avg_logprob,
       round(exp(-avg(lp)), 6) AS perplexity
FROM scored GROUP BY doc_id
"""


@register("text_bigram_lm_score", _BIGRAM_LM_ORACLE)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM quality score: fit a maximum-likelihood bigram
    model on the corpus itself, then score each document by its mean bigram
    log-probability ln P(w2|w1) (and the equivalent perplexity). Documents
    full of rare/ungrammatical transitions score low — the KenLM-filter
    pattern with the model table computed in-engine.

    Shape at scale: bigrams are generated per-row with transform (no
    self-join), counted in one hash aggregate; the unigram table derives
    from the bigram table (sum over w2 — no second corpus pass); scoring is
    two hash joins keyed on the n-gram columns, so every shuffle moves
    (token-pair, count) rows bounded by the n-gram vocabulary, and the
    per-doc rollup is one final aggregate. Zero probabilities cannot occur:
    the model is fit on the same corpus it scores (MLE, unsmoothed by
    design — add-k smoothing only shifts scores when train != score
    corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token array as a COLUMN before the lambda references
    # it: Catalyst does not common-subexpression-eliminate inside lambda
    # functions, so element_at(tokens_col(text), i) re-tokenizes the whole
    # document per element — O(tokens²) regex splits per doc (measured 2x+
    # on this query)
    with_toks = docs.select("doc_id", tokens_col(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), (n - 1).cast("int")),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    from sri_spark.operators.caching import scoped_persist

    # grams feeds three consumers (bigram counts, unigram derivation via
    # those counts, and the scoring join) — persist so the tokenize +
    # explode pass over the corpus runs once, not once per consumer
    grams = scoped_persist(
        with_toks.select("doc_id", F.explode(pairs).alias("g")).select(
            "doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
        )
    )
    big_cnt = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uni_cnt = big_cnt.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        grams.join(big_cnt, ["w1", "w2"])
        .join(uni_cnt, "w1")
        .select("doc_id", F.log(F.col("c2") / F.col("c1")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.round(F.exp(-F.avg("lp")), 6).alias("perplexity"),
    )


_JSD_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({_TOKS}) AS token FROM documents
),
src_cnt AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
src_tot AS (SELECT source, sum(n) AS nt FROM src_cnt GROUP BY 1),
corp_cnt AS (SELECT token, sum(n) AS n FROM src_cnt GROUP BY 1),
corp_tot AS (SELECT sum(n) AS nt FROM corp_cnt),
-- P = source distribution, Q = corpus distribution, M = (P+Q)/2; token
-- universe = corpus vocabulary, so Q covers every term (q > 0 always)
terms AS (
  SELECT s.source,
         coalesce(sc.n, 0) / st.nt AS p,
         cc.n / ct.nt AS q
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN corp_cnt cc
  CROSS JOIN corp_tot ct
  JOIN src_tot st ON st.source = s.source
  LEFT JOIN src_cnt sc ON sc.source = s.source AND sc.token = cc.token
),
contrib AS (
  SELECT source,
         CASE WHEN p > 0 THEN 0.5 * p * ln(2 * p / (p + q)) ELSE 0 END
         + 0.5 * q * ln(2 * q / (p + q)) AS c
  FROM terms
)
SELECT source, round(sum(c), 6) AS jsd_nats
FROM contrib GROUP BY source
"""


@register("text_source_jsd", _JSD_ORACLE)
def text_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's unigram distribution from
    the corpus distribution — the distribution-shift score behind mixture
    rebalancing (a source with high JSD is the one dragging the mixture;
    0 = indistinguishable, ln 2 = disjoint). All hash aggregates and one
    (source × vocabulary) join — the cross join is |sources| × |vocab|,
    the size of the probability table itself."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens_col(F.col("text"))).alias("token"))
    src_cnt = tok.groupBy("source", "token").agg(F.count("*").alias("n"))
    src_tot = src_cnt.groupBy("source").agg(F.sum("n").alias("nt"))
    corp_cnt = src_cnt.groupBy("token").agg(F.sum("n").alias("cn"))
    corp_tot = corp_cnt.agg(F.sum("cn").alias("ct"))
    sources = docs.select("source").distinct()
    terms = (
        sources.join(corp_cnt)
        .join(corp_tot)
        .join(src_tot, "source")
        .join(src_cnt, ["source", "token"], "left")
        .select(
            "source",
            (F.coalesce(F.col("n"), F.lit(0)) / F.col("nt")).alias("p"),
            (F.col("cn") / F.col("ct")).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    c = (
        F.when(p > 0, 0.5 * p * F.log(2 * p / (p + q))).otherwise(F.lit(0.0))
        + 0.5 * q * F.log(2 * q / (p + q))
    )
    return terms.select("source", c.alias("c")).groupBy("source").agg(
        F.round(F.sum("c"), 6).alias("jsd_nats")
    )


_LEN_QUALITY_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         len({_TOKS})::DOUBLE AS n_tokens,
         round(0.5 * least(len({_TOKS}) / 100.0, 1.0)
             + 0.3 * (1 - round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                                / greatest(length(text), 1), 6))
             + 0.2 * (1 - round(len(regexp_extract_all(text, '[0-9]'))
                                / greatest(length(text), 1), 6)), 6) AS quality
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       round(corr(n_tokens, quality), 6) AS len_quality_corr
FROM scored GROUP BY 1
"""


@register("text_length_quality_corr", _LEN_QUALITY_ORACLE)
def text_length_quality_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation of document length with the quality score per language —
    the bias audit for any length-dependent quality heuristic (a corr near
    1 means the 'quality' filter is secretly a length filter). corr() is
    co-moment partial-aggregatable: one pass."""
    from sri_spark.text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "text", tokens_col(F.col("text")).alias("__toks")
    )
    scored = docs.select(
        "lang",
        F.size("__toks").cast("double").alias("n_tokens"),
        quality_score(F.col("text"), toks=F.col("__toks")).alias("quality"),
    )
    # corr() itself divides by the two stddevs inside codegen, so under
    # ANSI a zero-variance group (all-identical lengths or scores) aborts
    # the job; covar_samp/stddev_samp are ANSI-safe (NULL at n=1) and
    # try_divide yields NULL on zero variance — exactly DuckDB's corr()
    corr_safe = F.try_divide(
        F.covar_samp("n_tokens", "quality"),
        F.stddev_samp("n_tokens") * F.stddev_samp("quality"),
    )
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(corr_safe, 6).alias("len_quality_corr"),
    )


_PPL_FILTER_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i])) AS w1,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i + 1])) AS w2
  FROM t
),
big_cnt AS (SELECT w1, w2, count(*) AS c2 FROM grams GROUP BY 1, 2),
uni_cnt AS (SELECT w1, sum(c2) AS c1 FROM big_cnt GROUP BY 1),
scored AS (
  SELECT g.doc_id, ln(b.c2 / u.c1) AS lp
  FROM grams g
  JOIN big_cnt b ON g.w1 = b.w1 AND g.w2 = b.w2
  JOIN uni_cnt u ON g.w1 = u.w1
),
ppl AS (SELECT doc_id, round(exp(-avg(lp)), 6) AS ppl FROM scored GROUP BY doc_id),
src AS (
  SELECT p.doc_id, d.source, p.ppl
  FROM ppl p JOIN documents d USING (doc_id)
),
deciled AS (
  SELECT source, ppl,
         ntile(10) OVER (PARTITION BY source ORDER BY ppl, doc_id) AS dec
  FROM src
)
SELECT source,
       CASE WHEN dec <= 3 THEN 'head'
            WHEN dec <= 7 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ppl), 6) AS avg_ppl,
       round(min(ppl), 6) AS min_ppl,
       round(max(ppl), 6) AS max_ppl
FROM deciled GROUP BY 1, 2
"""


@register("text_perplexity_filter", _PPL_FILTER_ORACLE)
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    corpus-fit bigram LM (text_bigram_lm_score), then split each source
    into head (best 30% by perplexity), middle (40%) and tail (worst 30%)
    — the partition CCNet uses to keep head+middle and drop or down-weight
    the tail. Per-source ntile windows run on the doc-count-sized score
    table (not the corpus), with (ppl, doc_id) ordering so ties are
    deterministic. Documents shorter than two tokens have no bigrams and
    fall out before bucketing (inner join), matching the oracle."""
    scores = text_bigram_lm_score(spark, sf_dir).select(
        "doc_id", F.col("perplexity").alias("ppl")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src = scores.join(docs, "doc_id")
    deciled = src.select(
        "source",
        "ppl",
        F.ntile(10)
        .over(Window.partitionBy("source").orderBy("ppl", "doc_id"))
        .alias("dec"),
    )
    bucket = (
        F.when(F.col("dec") <= 3, "head")
        .when(F.col("dec") <= 7, "middle")
        .otherwise("tail")
    )
    return deciled.groupBy("source", bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("ppl"), 6).alias("avg_ppl"),
        F.round(F.min("ppl"), 6).alias("min_ppl"),
        F.round(F.max("ppl"), 6).alias("max_ppl"),
    )
