"""Additional text/embedding analytics: TF-IDF, element-wise embedding
centroids, fingerprint dup groups. Each is a classic training-data-pipeline
rollup expressed as pure relational algebra (explode/group/window) so it
scales as ordinary shuffles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table
from sri_spark.text.analysis import tokens_col

TOP_TERMS = 3

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY 1, 2
),
df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
),
ranked AS (
  SELECT doc_id, tok, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rk
  FROM scored
)
SELECT doc_id, tok AS term, tfidf, rk
FROM ranked WHERE rk <= {TOP_TERMS}
"""


@register("text_tfidf_top_terms", _TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Shape: explode -> two hash
    aggregates (term-freq, doc-freq) -> broadcast df + scalar N -> per-doc
    window top-k (partitioned by doc, no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size rides the plan as a 1-row aggregate crossJoin (AQE turns
    # it into a broadcast), not a driver-side docs.count(): one action,
    # one scan of documents (exchange reuse covers the repeated subtree)
    nd = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    # no broadcast hint on df: the vocabulary grows with the corpus (a
    # forced BroadcastExchange on it is the 100 TB OOM pattern); AQE
    # broadcasts it at runtime when it is genuinely small
    scored = (
        tf.join(df, "tok")
        .crossJoin(nd)
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_TERMS)
        .select("doc_id", F.col("tok").alias("term"), "tfidf", "rk")
    )


@register(
    "embeddings_label_centroids",
    """
    SELECT label, dim - 1 AS dim,
           round(avg(v::DOUBLE), 6) AS centroid_v,
           count(DISTINCT vec_id) AS n_vectors
    FROM (
      SELECT vec_id, label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    GROUP BY label, dim - 1
    """,
)
def embeddings_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise centroid per label: posexplode -> (label, dim) hash
    aggregate. The vector dimension becomes an ordinary group key, so
    centroid computation is one shuffle regardless of dimensionality."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    )
    return exploded.groupBy("label", F.col("dim").cast("long").alias("dim")).agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"),
        F.countDistinct("vec_id").alias("n_vectors"),
    )


@register(
    "dedup_fingerprint_groups",
    """
    WITH fp AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(
                   list_slice(
                     list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'),
                                 x -> x != ''),
                     1, 16),
                   t -> (('0x' || substr(md5(t), 1, 15))::BIGINT) % 1000003)),
               (a, b) -> (a * 131 + b) % 1000000007
             ) AS fingerprint
      FROM documents
    )
    SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_docs
    FROM fp GROUP BY fingerprint HAVING count(*) > 1
    """,
)
def dedup_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-candidate groups blocked on the 16-token-prefix rolling-hash
    fingerprint — the cheap blocking pre-filter for dedup at scale (full-body
    fingerprints find only byte-exact dups, which the fixtures barely have;
    prefix blocks catch the near-dup families the downstream verifier then
    resolves)."""
    from sri_spark.text.analysis import doc_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        doc_fingerprint(
            F.coalesce(F.col("text"), F.lit("")), prefix=16
        ).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


VOCAB_MIN_COUNT = 20
TOP_BIGRAMS = 100

_TOKS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)

_VOCAB_ORACLE = f"""
WITH counts AS (
  SELECT tok AS token, count(*) AS cnt
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  GROUP BY 1 HAVING count(*) >= {VOCAB_MIN_COUNT}
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS vocab_id,
       token, cnt
FROM counts
"""


@register("text_vocabulary_build", _VOCAB_ORACLE)
def text_vocabulary_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: token frequencies with a min-count cutoff, ids
    assigned by (count desc, token) rank. The global row_number sort runs
    on the POST-cutoff aggregate — vocabulary-sized (≤ a few million rows
    at 100 TB), not corpus-sized — so the single-partition window is safe;
    the corpus-sized work is one explode + hash aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= VOCAB_MIN_COUNT)
    )
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return counts.select(
        F.row_number().over(w).cast("long").alias("vocab_id"), "token", "cnt"
    )


_BIGRAM_ORACLE = f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
grams AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
),
counts AS (SELECT bigram, count(*) AS cnt FROM grams GROUP BY 1),
ranked AS (
  SELECT bigram, cnt,
         row_number() OVER (ORDER BY cnt DESC, bigram) AS rk
  FROM counts
)
SELECT CAST(rk AS BIGINT) AS rk, bigram, cnt FROM ranked WHERE rk <= {TOP_BIGRAMS}
"""


@register("text_top_bigrams", _BIGRAM_ORACLE)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-100 word bigrams (boilerplate detector / language-
    model n-gram table). Bigrams are generated per-row with transform over
    the token array (no self-join), counted with one hash aggregate; the
    top-k lands in TakeOrderedAndProject via the tie-broken window +
    filter."""
    docs = load_table(spark, sf_dir, "documents")
    # token array materialized as a column BEFORE the lambda: Catalyst does
    # no CSE inside lambda functions, so element_at(tokens_col(text), i)
    # would re-tokenize the document per element — O(tokens²) splits
    with_toks = docs.select(tokens_col(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), (n - 1).cast("int")),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        with_toks.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "bigram")
    return (
        counts.select(
            F.row_number().over(w).cast("long").alias("rk"), "bigram", "cnt"
        )
        .filter(F.col("rk") <= TOP_BIGRAMS)
    )


SPARSE_COS_MAX_DF = 32  # prune tokens in more docs (stopwords/boilerplate)
SPARSE_COS_THRESHOLD = 0.3

_SPARSE_COS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY 1, 2
),
dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
  HAVING count(*) <= {SPARSE_COS_MAX_DF}
),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.tok, tf.tf * ln(n.n_docs / dfreq.df) AS w
  FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n
),
norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON dots.doc_a = na.doc_id
JOIN norms nb ON dots.doc_b = nb.doc_id
WHERE dot / (na.nrm * nb.nrm) >= {SPARSE_COS_THRESHOLD}
"""


@register("text_sparse_cosine_pairs", _SPARSE_COS_ORACLE)
def text_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join — the bag-of-words analogue of
    the embedding near-pair search, over the pruned vocabulary (tokens in
    more than {SPARSE_COS_MAX_DF} docs dropped: stopwords and boilerplate
    both poison the metric and cause the quadratic hot-token blowup; the
    same df-cap guard as the capped Jaccard baseline).

    Shape at scale: explode -> two hash aggregates -> weights persisted
    once for its three consumers -> shared-token self-join (bounded by
    C(max_df, 2) pairs per token) -> pair-sum -> norm joins. Every shuffle
    moves (token, 8-byte weight) or (pair ids), never documents."""
    from sri_spark.operators.caching import scoped_persist

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= SPARSE_COS_MAX_DF)
    )
    # corpus size as a 1-row aggregate crossJoin instead of a driver-side
    # docs.count() — the scalar stays in the lazy plan, so the persist
    # below is still the first (and only) action trigger
    nd = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    w = scoped_persist(
        tf.join(dfreq, "tok")
        .crossJoin(nd)
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("__n_docs") / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = w.select(F.col("doc_id").alias("doc_a"), "tok", F.col("w").alias("wa"))
    b = w.select(F.col("doc_id").alias("doc_b"), "tok", F.col("w").alias("wb"))
    dots = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(cos >= SPARSE_COS_THRESHOLD)
        .select("doc_a", "doc_b", F.round(cos, 6).alias("cosine"))
    )


_DATASHEET_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, source,
         len({_TOKS}) AS n_tokens, length(text) AS n_chars, md5(text) AS h
  FROM documents
)
SELECT count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS mean_tokens,
       round(median(n_tokens), 4) AS median_tokens,
       round(avg(n_chars), 4) AS mean_chars,
       CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_exact_dups
FROM t
"""


@register("corpus_datasheet", _DATASHEET_ORACLE)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus datasheet (dataset-card numbers): doc/lang/source
    counts, token totals and length distribution, exact-dup count — the
    summary every released dataset publishes. Single aggregate pass; the
    distinct counts are the only memory carriers and each is bounded
    (langs/sources) or swappable for HLL (content hashes) at extreme
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens_col(F.col("text")))
    t = docs.select(
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.md5("text").alias("h"),
    )
    return t.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
        F.round(F.median(F.col("n_tokens").cast("double")), 4).alias("median_tokens"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
        (F.count("*") - F.countDistinct("h")).cast("long").alias("n_exact_dups"),
    )


VOCAB_CURVE_TOP = 30


@register(
    "text_vocab_coverage_curve",
    f"""
    WITH counts AS (
      SELECT tok AS token, count(*) AS cnt
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
      GROUP BY 1
    ),
    ranked AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rk,
             sum(cnt) OVER () AS total
      FROM counts
    )
    SELECT CAST(rk AS BIGINT) AS rk, token, cnt,
           round(sum(cnt) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
                 / total, 6) AS coverage
    FROM ranked
    WHERE rk <= {VOCAB_CURVE_TOP}
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: cumulative corpus-token share of the
    top-k types — the OOV-budget planner (how big a vocab buys how much
    coverage). Corpus-sized work is one explode + hash aggregate; both
    windows run on the vocabulary-sized ranking."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), "token")
    w_all = Window.partitionBy()
    ranked = counts.select(
        "token",
        "cnt",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    w_cum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.filter(F.col("rk") <= VOCAB_CURVE_TOP)
        .select(
            "rk",
            "token",
            "cnt",
            F.round(F.sum("cnt").over(w_cum) / F.col("total"), 6).alias("coverage"),
        )
    )


@register(
    "text_oov_rate",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ),
    vocab AS (
      SELECT token FROM tok GROUP BY token HAVING count(*) >= {VOCAB_MIN_COUNT}
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                 / count(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v USING (token)
    GROUP BY t.doc_id
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the min-count vocabulary
    (text_vocabulary_build's cutoff) — the tokenizer-budget signal: docs
    with high OOV under the planned vocab either need a bigger vocab or
    are noise. One explode feeds both the vocabulary aggregate and the
    scoring join (shuffles keyed on the token)."""
    docs = load_table(spark, sf_dir, "documents")
    from sri_spark.operators.caching import scoped_persist

    tok = scoped_persist(
        docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= VOCAB_MIN_COUNT)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return (
        tok.join(vocab, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.round(F.sum(oov) / F.count("*"), 6).alias("oov_rate"),
        )
    )


BURSTY_TOP = 20


@register(
    "text_token_burstiness",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ),
    per_doc AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    stats AS (
      SELECT token,
             sum(c) AS total,
             sum(c * c) AS total_sq,
             count(*) AS n_docs_with
      FROM per_doc GROUP BY token
    ),
    scored AS (
      SELECT s.token, s.total, s.n_docs_with,
             (s.total_sq / nd.n_docs - pow(s.total / nd.n_docs, 2))
               / (s.total / nd.n_docs) AS vmr,
             row_number() OVER (ORDER BY s.total DESC, s.token) AS rk
      FROM stats s CROSS JOIN nd
    )
    SELECT CAST(rk AS BIGINT) AS rk, token,
           CAST(total AS BIGINT) AS total,
           n_docs_with,
           round(vmr, 6) AS burstiness_vmr
    FROM scored WHERE rk <= {BURSTY_TOP}
    """,
)
def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness (variance-to-mean ratio of per-document counts,
    zeros included — Church & Gale's term clumping statistic): VMR ≈ 1 is
    Poisson background vocabulary, VMR >> 1 marks topical/bursty terms
    that TF-IDF should reward and boilerplate detectors should watch. The
    absent-doc zeros enter through the moments (E[x], E[x²] computed from
    totals over ALL docs), so no dense doc × token expansion exists
    anywhere — two hash aggregates and a vocabulary-sized ranking."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("token"))
    per_doc = tok.groupBy("token", "doc_id").agg(F.count("*").alias("c"))
    # corpus size as a 1-row aggregate crossJoin (the SQL oracle's
    # CROSS JOIN nd, literally) — no driver-side docs.count() action
    nd = docs.agg(F.count("*").cast("double").alias("__n_docs"))
    stats = per_doc.groupBy("token").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("total_sq"),
        F.count("*").alias("n_docs_with"),
    )
    mean = F.col("total") / F.col("__n_docs")
    vmr = (F.col("total_sq") / F.col("__n_docs") - mean * mean) / mean
    w = Window.orderBy(F.col("total").desc(), "token")
    return (
        stats.crossJoin(nd).select(
            F.row_number().over(w).cast("long").alias("rk"),
            "token",
            F.col("total").cast("long").alias("total"),
            "n_docs_with",
            F.round(vmr, 6).alias("burstiness_vmr"),
        )
        .filter(F.col("rk") <= BURSTY_TOP)
    )


_SEARCH_A = "spark"
_SEARCH_B = "window"


@register(
    "text_boolean_search",
    f"""
    WITH postings AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  x -> x != '')) AS tok
        FROM documents
      ) WHERE tok IN ('{_SEARCH_A}', '{_SEARCH_B}')
    )
    SELECT CAST(sum(CASE WHEN tok = '{_SEARCH_A}' THEN 1 ELSE 0 END) AS BIGINT)
               AS df_a,
           CAST(sum(CASE WHEN tok = '{_SEARCH_B}' THEN 1 ELSE 0 END) AS BIGINT)
               AS df_b,
           CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) / 2 AS BIGINT) AS df_and
    FROM (
      SELECT doc_id, tok,
             count(*) OVER (PARTITION BY doc_id) = 2 AS in_both
      FROM postings
    )
    """,
)
def text_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index boolean retrieval: per-term posting lists (distinct
    (doc, term) — the explode prunes to the query terms BEFORE the
    distinct, so only matching postings shuffle), AND answered by
    intersecting the two lists on doc_id. Document frequencies df_a/df_b
    and the conjunction size df_and are the numbers a query planner uses
    to order AND-chains (intersect the rarest list first). The oracle
    re-derives all three from a window count over the same postings."""
    docs = load_table(spark, sf_dir, "documents")
    from sri_spark.text.analysis import tokens_col

    postings = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("tok")
        )
        .filter(F.col("tok").isin(_SEARCH_A, _SEARCH_B))
    )
    a = postings.filter(F.col("tok") == _SEARCH_A).select("doc_id")
    b = postings.filter(F.col("tok") == _SEARCH_B).select("doc_id")
    both = a.join(b, "doc_id")
    return (
        a.agg(F.count("*").alias("df_a"))
        .join(b.agg(F.count("*").alias("df_b")))
        .join(both.agg(F.count("*").alias("df_and")))
    )
