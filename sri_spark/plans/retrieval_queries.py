"""Ranked retrieval and tokenizer-training statistics over ``documents``.

Extends the text family (SURVEY §2.9 additive mandate — the LLM-data-
pipeline surface) with the three relational workhorses behind corpus
search and tokenizer construction:

- BM25 ranked retrieval (``text_bm25_topk``): the Robertson/Lucene
  scoring function computed entirely as Column arithmetic over posting
  counts — no UDF, no per-query loop.
- BPE merge-pair statistics (``text_bpe_merge_pairs``): the first
  iteration of byte-pair-encoding training — adjacent-symbol pair counts
  within words — as explode + zip + count.
- DSIR-style importance weights (``corpus_importance_weights``): hashed
  unigram buckets, target-vs-raw log-likelihood ratio summed per doc
  (Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling" — public arXiv 2302.03169).

Cross-engine determinism: scores are built from exact integer counts
(tf, df, dl, N) with a single fixed-shape double expression per row and
rounded before output; sums that cross a shuffle are sums of integers,
never of doubles (the round-3/4 flake class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.functions.hashing import md5_int, md5_int_sql
from sri_spark.sources.testdata import load_table
from sri_spark.text.analysis import tokens_col

_QUERY_TERMS = ("spark", "window", "join")
_K1 = 1.2
_B = 0.75


@register(
    "text_bm25_topk",
    f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
      WHERE tok IN {_QUERY_TERMS}
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT t.doc_id,
             sum(round(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * ({_K1} + 1.0))
                 / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl)),
               6)) AS score
      FROM tf t
      JOIN df USING (tok)
      JOIN dl USING (doc_id), stats
      GROUP BY t.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a 3-term query, fully relational: tokenize once,
    doc lengths + global (N, avgdl) from one aggregate, per-(doc, term)
    tf restricted to the query terms BEFORE the shuffle (the explode's
    filter prunes postings at the map side), df per term (3 rows,
    broadcast), then the Robertson score as pure Column arithmetic and a
    TakeOrderedAndProject top-10. At 100 TB the only data-sized shuffle
    is the (doc, query-term) tf aggregate — everything else is
    metadata-sized. Per-term scores are rounded to 6 before the per-doc
    sum (<=3 addends) so engine-side libm ulp differences can't flip the
    rounded output or the ranking."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    term_score = F.round(
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (_K1 + 1.0))
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    return (
        scored.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round("score", 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


@register(
    "text_bpe_merge_pairs",
    """
    WITH words AS (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x != '')) AS word
      FROM documents
    ),
    pairs AS (
      SELECT substr(word, i, 2) AS pair
      FROM words, unnest(range(1, len(word))) AS t(i)
      WHERE len(word) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 20
    """,
)
def text_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE-training iteration (Sennrich et al. 2016, public):
    adjacent-symbol pair frequencies within words — the statistic whose
    argmax becomes the first merge rule. Relational shape: explode words,
    generate the (len-1) adjacent character pairs per word via a sequence
    expression (narrow — no shuffle until the count), hash-aggregate pair
    counts, top-20 via TakeOrderedAndProject. Subsequent BPE iterations
    are this same query over a re-segmented symbol column — the fixpoint
    loop lives in the driver, the heavy counting stays distributed."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens_col(F.col("text"))).alias("word")).filter(
        F.length("word") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(20)
    )


_N_BUCKETS = 64
_ALPHA = 1.0  # add-one smoothing per bucket


@register(
    "corpus_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, source, {md5_int_sql('tok', 8)} % {_N_BUCKETS} AS bucket
      FROM toks
    ),
    target AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS t_cnt
      FROM bucketed WHERE source = 'src0' GROUP BY bucket
    ),
    raw AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS r_cnt
      FROM bucketed GROUP BY bucket
    ),
    totals AS (
      SELECT (SELECT sum(t_cnt) FROM target) AS t_tot,
             (SELECT sum(r_cnt) FROM raw) AS r_tot
    ),
    ratios AS (
      SELECT r.bucket,
             round(ln(((coalesce(t_cnt, 0) + {_ALPHA}) / (t_tot + {_N_BUCKETS} * {_ALPHA}))
                      / ((r_cnt + {_ALPHA}) / (r_tot + {_N_BUCKETS} * {_ALPHA}))), 6)
               AS log_ratio
      FROM raw r LEFT JOIN target USING (bucket), totals
    ),
    doc_buckets AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM bucketed GROUP BY doc_id, bucket
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           round(sum(round(cnt * log_ratio, 6)), 6) AS log_importance
    FROM doc_buckets JOIN ratios USING (bucket)
    GROUP BY doc_id
    ORDER BY log_importance DESC, doc_id
    LIMIT 50
    """,
)
def corpus_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (hashed n-gram variant, module
    docstring): token buckets by hash, target distribution = the 'src0'
    slice, importance of a doc = sum over its tokens of
    ln(p_target(bucket)/p_raw(bucket)) with add-one smoothing. All counts
    aggregate as integers; the per-bucket log-ratio table is
    _N_BUCKETS rows (broadcast), so the per-doc score is one integer
    aggregate per (doc, bucket) plus a tiny broadcast join — at 100 TB
    the cost is two passes over the token stream, both map-combinable.
    The hash must agree with the oracle: Spark's xxhash64 differs from
    DuckDB's hash, so both sides bucket by the same md5-derived value."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    # engine-portable bucket: DuckDB `hash()` and Spark `xxhash64` disagree,
    # so both sides would need md5-substring arithmetic; cheaper and equally
    # uniform here: bucket on the md5 hex prefix, identical in both engines.
    bucketed = toks.select(
        "doc_id",
        "source",
        (md5_int(F.col("tok"), 8) % _N_BUCKETS).alias("bucket"),
    )
    target = (
        bucketed.filter(F.col("source") == "src0")
        .groupBy("bucket")
        .agg(F.count("*").alias("t_cnt"))
    )
    raw = bucketed.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    # one global aggregate over the 64-row joined bucket table (target is a
    # filtered subset of raw, so the left join loses no t_cnt mass) — a
    # single keys=[] agg keeps the broadcast build provably 1-row under the
    # strict nested-loop classifier, vs the old agg.crossJoin(agg) shape
    # whose broadcast exchange hid a join above the aggregates.
    joined_buckets = raw.join(target, "bucket", "left")
    totals = joined_buckets.agg(
        F.sum("r_cnt").alias("r_tot"),
        F.sum(F.coalesce(F.col("t_cnt"), F.lit(0))).alias("t_tot"),
    )
    ratios = (
        joined_buckets
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("t_cnt"), F.lit(0)) + _ALPHA)
                        / (F.col("t_tot") + _N_BUCKETS * _ALPHA)
                    )
                    / ((F.col("r_cnt") + _ALPHA) / (F.col("r_tot") + _N_BUCKETS * _ALPHA))
                ),
                6,
            ).alias("log_ratio"),
        )
    )
    doc_buckets = bucketed.groupBy("doc_id", "bucket").agg(
        F.count("*").alias("cnt")
    )
    return (
        doc_buckets.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.round(F.col("cnt") * F.col("log_ratio"), 6)), 6
            ).alias("log_importance")
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"), "log_importance"
        )
        .orderBy(F.desc("log_importance"), "doc_id")
        .limit(50)
    )


_RRF_K = 60
_FUSE_N = 50

# shared with the BM25 oracle above: per-doc BM25 score for the query terms
_BM25_SCORED_CTES = f"""
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != '') AS toks
      FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
      WHERE tok IN {_QUERY_TERMS}
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    scored AS (
      SELECT t.doc_id,
             sum(round(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * ({_K1} + 1.0))
                 / (tf + {_K1} * (1 - {_B} + {_B} * dl / avgdl)),
               6)) AS score
      FROM tf t
      JOIN df USING (tok)
      JOIN dl USING (doc_id), stats
      GROUP BY t.doc_id
    )
"""


def _rrf_oracle() -> str:
    from sri_spark.plans.similarity_queries import _cos_sql

    return f"""
    WITH {_BM25_SCORED_CTES},
    lex AS (
      SELECT doc_id, lex_rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY round(score, 6) DESC, doc_id)
                 AS lex_rank
        FROM scored WHERE doc_id <> 0
      ) WHERE lex_rank <= {_FUSE_N}
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    semscored AS (
      SELECT e.vec_id AS doc_id, {_cos_sql('e.embedding', 'q.qe')} AS cosine
      FROM embeddings e, q WHERE e.vec_id <> 0
    ),
    sem AS (
      SELECT doc_id, sem_rank FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY cosine DESC, doc_id) AS sem_rank
        FROM semscored
      ) WHERE sem_rank <= {_FUSE_N}
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           round(coalesce(1.0 / ({_RRF_K} + lex_rank), 0)
                 + coalesce(1.0 / ({_RRF_K} + sem_rank), 0), 6) AS rrf
    FROM lex FULL OUTER JOIN sem USING (doc_id)
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """


@register("retrieval_hybrid_rrf", _rrf_oracle())
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009,
    public): the BM25 lexical ranking over ``documents`` fused with the
    embedding-cosine semantic ranking over ``embeddings`` (vec_id is the
    doc id; vec 0 is the query and is excluded) by
    score = sum 1/(60 + rank). Ranks — not raw scores — cross systems, so
    no score calibration is needed; the fusion itself is a 50-row x 50-row
    full outer join on doc_id (driver-trivial at any corpus size: each
    rank list is top-N metadata). At 100 TB the cost lives in the two
    upstream rankings, each already sub-linear or scan-bound; the window
    rank over the top-N candidate set is a single-partition sort of N
    rows, not of the corpus."""
    from pyspark.sql import Window

    from sri_spark.similarity.cosine import cosine_topk

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*_QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    term_score = F.round(
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (F.col("tf") * (_K1 + 1.0))
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))),
        6,
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
        .filter(F.col("doc_id") != 0)
    )
    # the rank window runs over the top-N candidates only (limit first),
    # so the single-partition sort is N rows, never the corpus
    lex_top = scored.orderBy(
        F.round("score", 6).desc(), F.col("doc_id")
    ).limit(_FUSE_N)
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.round("score", 6).desc(), F.col("doc_id")))
        .alias("lex_rank"),
    )
    sem_top = cosine_topk(
        load_table(spark, sf_dir, "embeddings"), query_id=0, k=_FUSE_N
    ).withColumnRenamed("vec_id", "doc_id")
    sem = sem_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("cosine").desc(), F.col("doc_id")))
        .alias("sem_rank"),
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(F.col("doc_id").cast("long").alias("doc_id"), rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(10)
    )
