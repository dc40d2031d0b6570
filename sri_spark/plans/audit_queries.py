"""Data-audit / statistics catalog queries: privacy risk (k-anonymity),
statistical dependence (chi-square, two-sample KS), functional-dependency
discovery, sentence-grain dedup, embedding outlier detection, and seeded
k-hop graph reach.

These extend the governance layer of a training-data build (reference has
no analogue — additive mandate, SURVEY.md §0 scope note): before shipping
a corpus or a warehouse extract you audit re-identification risk, verify
distributional assumptions, and discover undocumented column dependencies.

Every query is expression-only (no Python UDFs); the heavy ones are one or
two hash aggregates on a bounded key space, so each scales as a single
shuffle. The KS window runs over exactly 100 bin rows (bounded by
construction, not by data size) — the binned-ECDF trick is precisely what
makes a KS test feasible at 100 TB where a global value sort would not be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

# --------------------------------------------------------------------------
# k-anonymity audit
# --------------------------------------------------------------------------

_K_ANON_ORACLE = """
WITH cells AS (
  SELECT c_mktsegment AS segmento, c_nationkey,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
         count(*) AS k
  FROM customer GROUP BY 1, 2, 3
)
SELECT segmento,
       count(*)::BIGINT AS n_cells,
       sum(k)::BIGINT AS n_rows,
       min(k)::BIGINT AS min_k,
       sum(CASE WHEN k < 5 THEN k ELSE 0 END)::BIGINT AS rows_at_risk,
       round(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1.0 / sum(k), 6)
         AS risk_rate
FROM cells GROUP BY segmento
"""


@register("governance_k_anonymity", _K_ANON_ORACLE)
def governance_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (market segment,
    nation, coarse account-balance bucket): for each segment, how many
    equivalence cells exist, the smallest cell (min k), and the share of
    rows sitting in cells smaller than k=5 — the rows an attacker could
    re-identify by joining public attributes.

    Shape: two hash aggregates (QI tuple, then segment); the QI key space
    is bounded (segments x nations x ~20 balance buckets) so the first
    shuffle's map-side combine collapses 100 TB to a dimension-sized
    frame before the exchange."""
    cust = load_table(spark, sf_dir, "customer")
    cells = (
        cust.select(
            F.col("c_mktsegment").alias("segmento"),
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
        )
        .groupBy("segmento", "c_nationkey", "bal_bucket")
        .agg(F.count("*").alias("k"))
    )
    at_risk = F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(F.lit(0)))
    return cells.groupBy("segmento").agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("min_k"),
        at_risk.cast("long").alias("rows_at_risk"),
        F.round(at_risk * 1.0 / F.sum("k"), 6).alias("risk_rate"),
    )


# --------------------------------------------------------------------------
# chi-square test of independence
# --------------------------------------------------------------------------

# Full-grid correction without materializing the grid: over all cells,
#   sum (O-E)^2/E  =  sum_observed[(O-E)^2/E - E] + sum_all E
# and sum_all E for a priority row equals its row total rt, since
# sum_statuses ct = n. Missing (O=0) cells therefore need no rows at all.
_CHI2_ORACLE = """
WITH obs AS (
  SELECT o_orderpriority AS prioridad, o_orderstatus AS st, count(*) AS o
  FROM orders GROUP BY 1, 2
),
rowt AS (SELECT prioridad, sum(o) AS rt FROM obs GROUP BY 1),
colt AS (SELECT st, sum(o) AS ct FROM obs GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM obs),
contrib AS (
  SELECT obs.prioridad,
         (obs.o - rowt.rt * colt.ct / tot.n)
           * (obs.o - rowt.rt * colt.ct / tot.n)
           / (rowt.rt * colt.ct / tot.n)
         - rowt.rt * colt.ct / tot.n AS c
  FROM obs
  JOIN rowt USING (prioridad)
  JOIN colt USING (st)
  CROSS JOIN tot
)
SELECT contrib.prioridad,
       rowt.rt::BIGINT AS n_rows,
       round(sum(contrib.c) + rowt.rt, 6) AS chi2_contrib
FROM contrib JOIN rowt USING (prioridad)
GROUP BY contrib.prioridad, rowt.rt
"""


@register("stats_chi_square_independence", _CHI2_ORACLE)
def stats_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square contributions per order priority for the
    (priority x status) contingency table — the independence test a
    curation pipeline runs before trusting a stratification column.

    Zero-observed cells are handled algebraically (sum_all E per priority
    = its row total), so the plan never materializes the full grid: one
    hash aggregate over the contingency key, two dimension-sized marginal
    aggregates broadcast back onto it, one scalar total. At 100 TB the
    only full-data pass is the first groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("prioridad"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").alias("o"))
    rowt = obs.groupBy("prioridad").agg(F.sum("o").alias("rt"))
    colt = obs.groupBy("st").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    contrib = (
        obs.join(F.broadcast(rowt), "prioridad")
        .join(F.broadcast(colt), "st")
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "prioridad",
            "rt",
            ((F.col("o") - e) * (F.col("o") - e) / e - e).alias("c"),
        )
    )
    return contrib.groupBy("prioridad", "rt").agg(
        F.col("rt").cast("long").alias("n_rows"),
        F.round(F.sum("c") + F.col("rt"), 6).alias("chi2_contrib"),
    ).select("prioridad", "n_rows", "chi2_contrib")


# --------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov (binned ECDF)
# --------------------------------------------------------------------------

_KS_BINS = 100
_KS_A, _KS_B = "view", "purchase"

_KS_ORACLE = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{_KS_A}', '{_KS_B}')
),
stats AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
binned AS (
  SELECT least(CAST(floor((value - lo)
                          / greatest((hi - lo) / {_KS_BINS}, 1e-12))
               AS BIGINT),
               {_KS_BINS - 1}) AS bin,
         sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS nb
  FROM ev CROSS JOIN stats GROUP BY 1
)
SELECT bin,
       round(sum(na) OVER w * 1.0 / sum(na) OVER (), 6) AS ecdf_a,
       round(sum(nb) OVER w * 1.0 / sum(nb) OVER (), 6) AS ecdf_b,
       round(abs(sum(na) OVER w * 1.0 / sum(na) OVER ()
                 - sum(nb) OVER w * 1.0 / sum(nb) OVER ()), 6) AS ks_diff
FROM binned
WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("stats_ks_two_sample", _KS_ORACLE)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov curve between the 'view' and
    'purchase' event-value distributions: per-bin ECDFs and their
    absolute gap (the KS statistic is the max of ks_diff). Drift
    detection between two cohorts without a global sort: values fold into
    _KS_BINS (100) fixed-width bins with one hash aggregate, and the
    cumulative window runs over at most 100 rows — a driver-sized frame
    regardless of input size, which is what makes the test runnable at
    100 TB."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select("event_type", "value")
    )
    stats = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    # epsilon-floored width: when all values are equal (hi == lo) the
    # data-derived denominator would be 0 and ANSI mode would abort the
    # job with DIVIDE_BY_ZERO (a when() guard does NOT protect — codegen
    # still evaluates the division); flooring the width keeps the divisor
    # nonzero and maps the degenerate input to bin 0 on both engines
    width = F.greatest((F.col("hi") - F.col("lo")) / _KS_BINS, F.lit(1e-12))
    binned = (
        ev.join(F.broadcast(stats), F.lit(True))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
                F.lit(_KS_BINS - 1),
            ).alias("bin"),
            F.when(F.col("event_type") == _KS_A, 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == _KS_B, 1).otherwise(0).alias("ib"),
        )
        .groupBy("bin")
        .agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    )
    # <=100 rows from here on: the single-partition window is bounded by
    # construction (bin count), not by data size
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ecdf_a = F.sum("na").over(w) * 1.0 / F.sum("na").over(wall)
    ecdf_b = F.sum("nb").over(w) * 1.0 / F.sum("nb").over(wall)
    return binned.select(
        "bin",
        F.round(ecdf_a, 6).alias("ecdf_a"),
        F.round(ecdf_b, 6).alias("ecdf_b"),
        F.round(F.abs(ecdf_a - ecdf_b), 6).alias("ks_diff"),
    )


# --------------------------------------------------------------------------
# functional-dependency audit
# --------------------------------------------------------------------------

# (name, table, lhs, rhs) — a mix of FDs that hold (keys) and that don't
_FD_CANDIDATES = [
    ("nation_key_region", "nation", "n_nationkey", "n_regionkey"),
    ("part_brand_type", "part", "p_brand", "p_type"),
    ("orders_cust_priority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem_part_supp", "lineitem", "l_partkey", "l_suppkey"),
    ("customer_key_segment", "customer", "c_custkey", "c_mktsegment"),
]

_FD_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{name}' AS fd,
       count(*)::BIGINT AS n_lhs,
       sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
       round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS violation_rate,
       max(nd)::BIGINT AS worst_fanout
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd FROM {table} GROUP BY 1)
"""
    for name, table, lhs, rhs in _FD_CANDIDATES
)


@register("governance_fd_audit", _FD_ORACLE)
def governance_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate FD X -> Y, the
    number of X values mapping to more than one Y (violations) and the
    worst fan-out. Dependency discovery is how a pipeline detects that a
    'lookup' join key is secretly m:m before it fans out a 100 TB join —
    exactly the reference's Q4 hazard (SURVEY.md §1.3), generalized into
    a reusable profiling operator.

    Shape per candidate: one hash aggregate on the LHS (count distinct
    RHS is a two-phase partial aggregate), one scalar rollup; candidates
    union into a single dimension-sized report."""
    parts = []
    for name, table, lhs, rhs in _FD_CANDIDATES:
        per_lhs = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
        )
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        parts.append(
            per_lhs.agg(
                F.lit(name).alias("fd"),
                F.count("*").cast("long").alias("n_lhs"),
                viol.cast("long").alias("n_violating"),
                F.round(viol * 1.0 / F.count("*"), 6).alias("violation_rate"),
                F.max("nd").cast("long").alias("worst_fanout"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# sentence-grain exact dedup (C4-style)
# --------------------------------------------------------------------------

_SENT_ORACLE = r"""
WITH sent AS (
  SELECT source, lower(trim(s)) AS s
  FROM (SELECT source, unnest(string_split_regex(text, '[.!?]+\s+')) AS s
        FROM documents)
  WHERE length(lower(trim(s))) >= 20
),
per AS (SELECT source, s, count(*) AS n FROM sent GROUP BY 1, 2)
SELECT source,
       sum(n)::BIGINT AS n_sentences,
       count(*)::BIGINT AS n_unique,
       (sum(n) - count(*))::BIGINT AS n_dup,
       round((sum(n) - count(*)) * 1.0 / sum(n), 6) AS dup_rate,
       max(n)::BIGINT AS max_copies
FROM per GROUP BY source
"""


@register("dedup_sentence_exact", _SENT_ORACLE)
def dedup_sentence_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-grain exact dedup report per source (the C4 recipe dedups
    at three-sentence grain; this is the one-sentence building block):
    split on sentence punctuation, normalize (lower/trim), drop fragments
    under 20 chars, count exact duplicates within each source.

    Complements the catalog's other dedup grains — document
    (dedup_exact), fixed-width span (dedup_span_exact), shingle
    (dedup_ngram_jaccard): sentence is the linguistic grain web-corpus
    boilerplate actually repeats at. Shape: explode + one hash aggregate
    keyed (source, sentence) — the combine step collapses repeats
    map-side, so the shuffle carries unique sentences, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    sent = docs.select(
        "source",
        F.explode(F.split(F.col("text"), r"[.!?]+\s+")).alias("raw"),
    ).select("source", F.lower(F.trim(F.col("raw"))).alias("s"))
    per = (
        sent.filter(F.length("s") >= 20)
        .groupBy("source", "s")
        .agg(F.count("*").alias("n"))
    )
    return per.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_sentences"),
        F.count("*").cast("long").alias("n_unique"),
        (F.sum("n") - F.count("*")).cast("long").alias("n_dup"),
        F.round((F.sum("n") - F.count("*")) * 1.0 / F.sum("n"), 6).alias(
            "dup_rate"
        ),
        F.max("n").cast("long").alias("max_copies"),
    )


# --------------------------------------------------------------------------
# embedding outlier detection (distance-to-centroid z-score)
# --------------------------------------------------------------------------

_OUTLIER_ORACLE = """
WITH exploded AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
centroids AS (
  SELECT label, dim, avg(v) AS c FROM exploded GROUP BY 1, 2
),
dists AS (
  SELECT e.vec_id, e.label, sqrt(sum((e.v - c.c) * (e.v - c.c))) AS d
  FROM exploded e JOIN centroids c USING (label, dim)
  GROUP BY 1, 2
),
lstats AS (
  SELECT label, avg(d) AS mu, stddev_pop(d) AS sigma FROM dists GROUP BY 1
)
SELECT d.label,
       count(*)::BIGINT AS n_vecs,
       sum(CASE WHEN s.sigma > 0 AND (d.d - s.mu) / s.sigma > 2
                THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       round(max(CASE WHEN s.sigma > 0 THEN (d.d - s.mu) / s.sigma END), 4)
         AS max_z,
       round(s.mu, 6) AS mean_dist
FROM dists d JOIN lstats s USING (label)
GROUP BY d.label, s.mu
"""


@register("embeddings_outlier_zscore", _OUTLIER_ORACLE)
def embeddings_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outlier report: each vector's Euclidean
    distance to its label centroid, z-scored against the label's distance
    distribution; vectors with z > 2 are flagged. This is the standard
    mislabeled-example / corrupt-embedding sweep a training pipeline runs
    before contrastive fine-tuning.

    Shape: posexplode to (label, dim) for the centroid aggregate
    (dimension-count-bounded key space), re-join on (label, dim) to score
    distances in one more aggregate, then two label-sized rollups. Every
    shuffle key is bounded by labels x dims — at 100 TB the vectors
    stream through; nothing data-sized is ever collected."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "v0"),
    ).select("vec_id", "label", "dim", F.col("v0").cast("double").alias("v"))
    centroids = ex.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    dists = (
        ex.join(centroids, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sqrt(
                F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c")))
            ).alias("d")
        )
    )
    lstats = dists.groupBy("label").agg(
        F.avg("d").alias("mu"), F.stddev_pop("d").alias("sigma")
    )
    # try_divide: a label with a single vector (or identical distances)
    # has stddev_pop == 0.0, and under ANSI a plain division would abort
    # the whole query; NULL z degrades to 0 outliers and NULL max_z, and
    # the oracle's CASE WHEN sigma > 0 guard mirrors exactly that
    z = F.try_divide(F.col("d") - F.col("mu"), F.col("sigma"))
    return (
        dists.join(F.broadcast(lstats), "label")
        .groupBy("label", "mu")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum(F.when(z > 2, 1).otherwise(0)).cast("long").alias(
                "n_outliers"
            ),
            F.round(F.max(z), 4).alias("max_z"),
            F.round(F.col("mu"), 6).alias("mean_dist"),
        )
        .select("label", "n_vecs", "n_outliers", "max_z", "mean_dist")
    )


# --------------------------------------------------------------------------
# seeded 2-hop reach over the trade graph
# --------------------------------------------------------------------------

_KHOP_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
seeds AS (SELECT c_custkey AS seed FROM customer WHERE c_custkey % 150 = 1),
h1 AS (
  SELECT DISTINCT seeds.seed, pairs.s
  FROM seeds JOIN pairs ON pairs.c = seeds.seed
),
h2 AS (
  SELECT DISTINCT h1.seed, pairs.c
  FROM h1 JOIN pairs ON pairs.s = h1.s
  WHERE pairs.c <> h1.seed
)
SELECT seeds.seed,
       coalesce(n1.n, 0)::BIGINT AS n_suppliers_1hop,
       coalesce(n2.n, 0)::BIGINT AS n_customers_2hop
FROM seeds
LEFT JOIN (SELECT seed, count(*) AS n FROM h1 GROUP BY 1) n1 USING (seed)
LEFT JOIN (SELECT seed, count(*) AS n FROM h2 GROUP BY 1) n2 USING (seed)
"""


@register("graph_khop_reach", _KHOP_ORACLE)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop BFS reach from a deterministic seed set over the bipartite
    customer-supplier trade graph: per seed customer, the distinct
    suppliers one hop out and the distinct other customers two hops out
    (customers sharing a supplier). The seeded-frontier shape is how
    neighborhood expansion actually runs at scale — expand from the
    entities under investigation, never all-pairs: the hop-2 join's cost
    is bounded by (seed count x supplier degree), not degree^2 over the
    whole graph.

    Shape: distinct edge list (one shuffle, reused), two equi-joins with
    per-hop distinct, two seed-keyed aggregates; left joins keep seeds
    with zero trades."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    seeds = customer.filter(F.col("c_custkey") % 150 == 1).select(
        F.col("c_custkey").alias("seed")
    )
    h1 = (
        seeds.join(pairs, pairs.c == seeds.seed)
        .select("seed", "s")
        .distinct()
    )
    h2 = (
        h1.join(pairs, "s")
        .filter(F.col("c") != F.col("seed"))
        .select("seed", "c")
        .distinct()
    )
    n1 = h1.groupBy("seed").agg(F.count("*").alias("n1"))
    n2 = h2.groupBy("seed").agg(F.count("*").alias("n2"))
    return (
        seeds.join(n1, "seed", "left")
        .join(n2, "seed", "left")
        .select(
            "seed",
            F.coalesce(F.col("n1"), F.lit(0))
            .cast("long")
            .alias("n_suppliers_1hop"),
            F.coalesce(F.col("n2"), F.lit(0))
            .cast("long")
            .alias("n_customers_2hop"),
        )
    )


# --------------------------------------------------------------------------
# Kaplan-Meier customer survival
# --------------------------------------------------------------------------

_KM_ORACLE = """
WITH span AS (
  SELECT o_custkey,
         min(o_orderdate) AS first_d,
         max(o_orderdate) AS last_d
  FROM orders GROUP BY o_custkey
),
horizon AS (SELECT max(o_orderdate) AS maxd FROM orders),
labeled AS (
  SELECT CAST(floor(date_diff('day', first_d, last_d) / 30.0) AS BIGINT)
           AS lifetime_m,
         (date_diff('day', last_d, horizon.maxd) <= 90) AS censored
  FROM span CROSS JOIN horizon
),
buckets AS (
  SELECT lifetime_m,
         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS d,
         sum(CASE WHEN censored THEN 1 ELSE 0 END) AS c
  FROM labeled GROUP BY lifetime_m
),
risk AS (
  SELECT lifetime_m, d, c,
         sum(d + c) OVER (ORDER BY lifetime_m
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (d + c) AS gone_before,
         sum(d + c) OVER () AS total
  FROM buckets
)
SELECT lifetime_m,
       CAST(total - gone_before AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_churned,
       CAST(c AS BIGINT) AS n_censored,
       round(exp(sum(CASE WHEN d < total - gone_before
                          THEN ln(1.0 - d * 1.0 / (total - gone_before))
                          ELSE '-infinity'::DOUBLE END)
                 OVER (ORDER BY lifetime_m
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) AS survival
FROM risk
"""


@register("customers_survival_km", _KM_ORACLE)
def customers_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier customer survival by 30-day lifetime bucket, with
    right-censoring: customers whose last order falls within 90 days of
    the dataset horizon are CENSORED (still alive), not churned — the
    statistical correction naive churn rates skip. The cumulative product
    Π(1 - d_j/n_j) is computed relationally as exp(Σ ln(...)) over an
    ordered window, so survival analysis runs as pure DataFrame algebra.

    Shape: one per-customer aggregate, one lifetime-bucket aggregate
    (bounded key space: lifetimes in months), then windows over the
    bucket frame only — the single-partition window runs on ~100 rows by
    construction, the same bounded-window argument as
    stats_ks_two_sample."""
    orders = load_table(spark, sf_dir, "orders")
    span = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_d"),
        F.max("o_orderdate").alias("last_d"),
    )
    horizon = orders.agg(F.max("o_orderdate").alias("maxd"))
    labeled = span.join(F.broadcast(horizon), F.lit(True)).select(
        F.floor(F.datediff("last_d", "first_d") / 30.0)
        .cast("long")
        .alias("lifetime_m"),
        (F.datediff(F.col("maxd"), F.col("last_d")) <= 90).alias("censored"),
    )
    buckets = labeled.groupBy("lifetime_m").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c"),
    )
    cum = Window.orderBy("lifetime_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.orderBy("lifetime_m").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gone_before = F.sum(F.col("d") + F.col("c")).over(cum) - (
        F.col("d") + F.col("c")
    )
    total = F.sum(F.col("d") + F.col("c")).over(wall)
    risk = buckets.select(
        "lifetime_m",
        "d",
        "c",
        (total - gone_before).alias("n_risk0"),
    )
    # terminal bucket (d == n_risk, zero censored): Spark's log(0) yields
    # NULL (which sum() would silently skip, freezing survival at the
    # prior bucket) and DuckDB's ln(0) RAISES OutOfRange — so BOTH sides
    # special-case it: emit -inf explicitly (the oracle's CASE mirrors
    # this with '-infinity'::DOUBLE) so exp() drives survival to exactly
    # 0.0 once any bucket fully churns
    log_term = F.when(
        F.col("d") < F.col("n_risk0"),
        F.log(1.0 - F.col("d") * 1.0 / F.col("n_risk0")),
    ).otherwise(F.lit(float("-inf")))
    surv = F.exp(F.sum(log_term).over(cum))
    return risk.select(
        "lifetime_m",
        F.col("n_risk0").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.col("c").cast("long").alias("n_censored"),
        F.round(surv, 6).alias("survival"),
    )


# --------------------------------------------------------------------------
# binned Gini coefficient of customer revenue
# --------------------------------------------------------------------------

_GINI_BINS = 200

_GINI_ORACLE = f"""
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS r FROM orders GROUP BY 1
),
stats AS (SELECT min(r) AS lo, max(r) AS hi FROM rev),
binned AS (
  SELECT least(CAST(floor((r - lo)
                          / greatest((hi - lo) / {_GINI_BINS}, 1e-12))
               AS BIGINT),
               {_GINI_BINS - 1}) AS bin,
         count(*) AS n,
         sum(r) AS s
  FROM rev CROSS JOIN stats GROUP BY 1
),
cum AS (
  SELECT bin, n, s,
         sum(n) OVER w AS cn, sum(s) OVER w AS cs,
         sum(n) OVER () AS tn, sum(s) OVER () AS ts
  FROM binned
  WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(max(tn) AS BIGINT) AS n_customers,
       round(1.0 - sum(
           n * 1.0 / tn * ((cs - s) + cs) * 1.0 / ts
       ), 6) AS gini
FROM cum
"""


@register("orders_revenue_gini_binned", _GINI_ORACLE)
def orders_revenue_gini_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue via the binned Lorenz curve
    (trapezoid rule over _GINI_BINS (200) fixed-width revenue bins): the
    standard single-number inequality metric next to
    orders_pareto_deciles' curve. The exact Gini needs a global rank over
    ALL customers — a single-partition sort of an SF-growing table;
    binning bounds the sorted frame at 200 rows regardless of scale, the
    same trick as stats_ks_two_sample. One customer-revenue aggregate,
    one bin aggregate, windows over the bin frame only."""
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("r"))
    stats = rev.agg(F.min("r").alias("lo"), F.max("r").alias("hi"))
    # epsilon-floored width — see stats_ks_two_sample: zero-variance
    # revenue must not ANSI-crash; all rows fold into bin 0 instead
    width = F.greatest(
        (F.col("hi") - F.col("lo")) / _GINI_BINS, F.lit(1e-12)
    )
    binned = (
        rev.join(F.broadcast(stats), F.lit(True))
        .select(
            F.least(
                F.floor((F.col("r") - F.col("lo")) / width).cast("long"),
                F.lit(_GINI_BINS - 1),
            ).alias("bin"),
            F.col("r"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("r").alias("s"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = binned.select(
        "n",
        "s",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("n").over(wall).alias("tn"),
        F.sum("s").over(wall).alias("ts"),
    )
    # trapezoid: ΔF_pop * (L(prev) + L(cur)); prev cumulative = cum - own
    term = (
        F.col("n")
        * 1.0
        / F.col("tn")
        * ((F.col("cs") - F.col("s")) + F.col("cs"))
        * 1.0
        / F.col("ts")
    )
    return cum.agg(
        F.count("*").cast("long").alias("n_bins"),
        F.max("tn").cast("long").alias("n_customers"),
        F.round(1.0 - F.sum(term), 6).alias("gini"),
    )


# --------------------------------------------------------------------------
# Welch's unequal-variance t-test (view vs purchase event values)
# --------------------------------------------------------------------------

_WELCH_A, _WELCH_B = "view", "purchase"

_WELCH_ORACLE = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{_WELCH_A}', '{_WELCH_B}')
),
s AS (
  SELECT
    count(CASE WHEN event_type = '{_WELCH_A}' THEN 1 END)::BIGINT AS n_a,
    count(CASE WHEN event_type = '{_WELCH_B}' THEN 1 END)::BIGINT AS n_b,
    avg(CASE WHEN event_type = '{_WELCH_A}' THEN value END) AS ma,
    avg(CASE WHEN event_type = '{_WELCH_B}' THEN value END) AS mb,
    var_samp(CASE WHEN event_type = '{_WELCH_A}' THEN value END) AS va,
    var_samp(CASE WHEN event_type = '{_WELCH_B}' THEN value END) AS vb
  FROM ev
)
SELECT n_a, n_b,
       round(ma, 6) AS mean_a,
       round(mb, 6) AS mean_b,
       round((ma - mb) / sqrt(va / n_a + vb / n_b), 6) AS t_stat,
       round((va / n_a + vb / n_b) * (va / n_a + vb / n_b)
             / ((va / n_a) * (va / n_a) / (n_a - 1)
                + (vb / n_b) * (vb / n_b) / (n_b - 1)), 6) AS df_welch
FROM s
"""


@register("stats_welch_ttest", _WELCH_ORACLE)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the 'view' and 'purchase'
    event-value cohorts: means, sample variances, the t statistic and the
    Welch-Satterthwaite degrees of freedom — the drift/AB-test companion
    to the binned KS curve (stats_ks_two_sample), answering "did the mean
    move" where KS answers "did the shape move".

    Shape: ONE conditional hash aggregate over the filtered scan (count/
    avg/var_samp per cohort via when()); everything after is scalar
    arithmetic on a 1-row frame. No joins, no windows, one shuffle of
    partial aggregates — the cheapest possible 100 TB pass."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_WELCH_A, _WELCH_B))
        .select("event_type", "value")
    )
    a = F.when(F.col("event_type") == _WELCH_A, F.col("value"))
    b = F.when(F.col("event_type") == _WELCH_B, F.col("value"))
    s = ev.agg(
        F.count(a).cast("long").alias("n_a"),
        F.count(b).cast("long").alias("n_b"),
        F.avg(a).alias("ma"),
        F.avg(b).alias("mb"),
        F.var_samp(a).alias("va"),
        F.var_samp(b).alias("vb"),
    )
    sea = F.col("va") / F.col("n_a")
    seb = F.col("vb") / F.col("n_b")
    return s.select(
        "n_a",
        "n_b",
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(sea + seb), 6).alias(
            "t_stat"
        ),
        F.round(
            (sea + seb) * (sea + seb)
            / (sea * sea / (F.col("n_a") - 1) + seb * seb / (F.col("n_b") - 1)),
            6,
        ).alias("df_welch"),
    )


# --------------------------------------------------------------------------
# binned Spearman rank correlation (quantity vs price per return flag)
# --------------------------------------------------------------------------

_SPEARMAN_BINS = 100

_SPEARMAN_ORACLE = f"""
WITH li AS (
  SELECT l_returnflag AS flag, l_quantity AS q, l_extendedprice AS p
  FROM lineitem
),
b AS (
  SELECT min(q) AS loq, max(q) AS hiq, min(p) AS lop, max(p) AS hip FROM li
),
binned AS (
  SELECT flag,
         least(CAST(floor((q - loq)
                          / greatest((hiq - loq) / {_SPEARMAN_BINS}, 1e-12))
               AS BIGINT), {_SPEARMAN_BINS - 1}) AS bq,
         least(CAST(floor((p - lop)
                          / greatest((hip - lop) / {_SPEARMAN_BINS}, 1e-12))
               AS BIGINT), {_SPEARMAN_BINS - 1}) AS bp
  FROM li CROSS JOIN b
),
joint AS (
  SELECT flag, bq, bp, count(*) * 1.0 AS n FROM binned GROUP BY 1, 2, 3
),
tot AS (SELECT flag, sum(n) AS nf FROM joint GROUP BY 1),
ma AS (
  SELECT flag, bq,
         coalesce(sum(cnt) OVER (PARTITION BY flag ORDER BY bq
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (cnt + 1) / 2.0 AS ra
  FROM (SELECT flag, bq, sum(n) AS cnt FROM joint GROUP BY 1, 2)
),
mb AS (
  SELECT flag, bp,
         coalesce(sum(cnt) OVER (PARTITION BY flag ORDER BY bp
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (cnt + 1) / 2.0 AS rb
  FROM (SELECT flag, bp, sum(n) AS cnt FROM joint GROUP BY 1, 2)
),
scored AS (
  SELECT j.flag, j.n, ma.ra / t.nf AS ra, mb.rb / t.nf AS rb
  FROM joint j
  JOIN ma USING (flag, bq)
  JOIN mb USING (flag, bp)
  JOIN tot t USING (flag)
)
SELECT flag,
       CAST(sum(n) AS BIGINT) AS n_rows,
       round((sum(n) * sum(n * ra * rb) - sum(n * ra) * sum(n * rb))
             / greatest(sqrt(greatest(sum(n) * sum(n * ra * ra)
                                      - sum(n * ra) * sum(n * ra), 0.0)
                             * greatest(sum(n) * sum(n * rb * rb)
                                        - sum(n * rb) * sum(n * rb), 0.0)),
                        1e-12), 6) AS spearman_binned
FROM scored GROUP BY flag
"""


@register("stats_spearman_binned", _SPEARMAN_ORACLE)
def stats_spearman_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Spearman rank correlation between l_quantity and
    l_extendedprice per return flag — monotone dependence without a
    global sort. Exact Spearman needs a total ranking of each variable
    (a 100 TB sort per column); the binned estimator folds each variable
    into {_SPEARMAN_BINS} fixed-width bins (one hash aggregate over the
    joint (flag, bq, bp) cell grid — at most flags x bins^2 cells,
    bounded by construction), assigns every cell the average rank of its
    bin (the standard midrank treatment of ties), normalizes ranks to
    [0, 1] so the closing sums stay O(1)-scaled (no catastrophic
    cancellation in the corr identity), and evaluates weighted Pearson
    corr of the midranks with plain SUM aggregates.

    The cumulative midrank windows run over at most {_SPEARMAN_BINS} rows
    per flag — driver-sized regardless of input, the same trick as the
    binned KS ECDF. Oracle: identical arithmetic in DuckDB."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
    )
    b = li.agg(
        F.min("q").alias("loq"),
        F.max("q").alias("hiq"),
        F.min("p").alias("lop"),
        F.max("p").alias("hip"),
    )
    nb = _SPEARMAN_BINS

    def _bin(v: str, lo: str, hi: str):
        width = F.greatest((F.col(hi) - F.col(lo)) / nb, F.lit(1e-12))
        return F.least(
            F.floor((F.col(v) - F.col(lo)) / width).cast("long"),
            F.lit(nb - 1),
        )

    binned = li.join(F.broadcast(b), F.lit(True)).select(
        "flag",
        _bin("q", "loq", "hiq").alias("bq"),
        _bin("p", "lop", "hip").alias("bp"),
    )
    joint = binned.groupBy("flag", "bq", "bp").agg(
        (F.count("*") * 1.0).alias("n")
    )
    tot = joint.groupBy("flag").agg(F.sum("n").alias("nf"))

    def _midranks(key: str, rank_col: str) -> DataFrame:
        marg = joint.groupBy("flag", key).agg(F.sum("n").alias("cnt"))
        w = (
            Window.partitionBy("flag")
            .orderBy(key)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        before = F.coalesce(F.sum("cnt").over(w), F.lit(0.0))
        return marg.select(
            "flag", key, (before + (F.col("cnt") + 1) / 2.0).alias(rank_col)
        )

    scored = (
        joint.join(F.broadcast(_midranks("bq", "ra")), ["flag", "bq"])
        .join(F.broadcast(_midranks("bp", "rb")), ["flag", "bp"])
        .join(F.broadcast(tot), "flag")
        .select(
            "flag",
            "n",
            (F.col("ra") / F.col("nf")).alias("ra"),
            (F.col("rb") / F.col("nf")).alias("rb"),
        )
    )
    sn = F.sum("n")
    sa = F.sum(F.col("n") * F.col("ra"))
    sb = F.sum(F.col("n") * F.col("rb"))
    saa = F.sum(F.col("n") * F.col("ra") * F.col("ra"))
    sbb = F.sum(F.col("n") * F.col("rb") * F.col("rb"))
    sab = F.sum(F.col("n") * F.col("ra") * F.col("rb"))
    denom = F.greatest(
        F.sqrt(
            F.greatest(sn * saa - sa * sa, F.lit(0.0))
            * F.greatest(sn * sbb - sb * sb, F.lit(0.0))
        ),
        F.lit(1e-12),
    )
    return scored.groupBy("flag").agg(
        sn.cast("long").alias("n_rows"),
        F.round((sn * sab - sa * sb) / denom, 6).alias("spearman_binned"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit (order totals)
# --------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(floor(o_totalprice
               / power(10, length(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR)) - 1)) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, count(*)::BIGINT AS n_obs FROM d GROUP BY 1),
t AS (SELECT sum(n_obs) AS n FROM c)
SELECT digit, n_obs,
       round(n_obs * 1.0 / n, 6) AS obs_share,
       round(log10(1 + 1.0 / digit), 6) AS exp_share,
       round((n_obs * 1.0 / n - log10(1 + 1.0 / digit))
             * (n_obs * 1.0 / n - log10(1 + 1.0 / digit))
             / log10(1 + 1.0 / digit), 6) AS chi2_term
FROM c CROSS JOIN t
"""


@register("stats_benford_first_digit", _BENFORD_ORACLE)
def stats_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals: the
    observed share of each leading digit 1-9 vs the Benford expectation
    log10(1 + 1/d), with the per-digit chi-square term — the classic
    fabricated-data / unit-mixing forensic check a warehouse runs on any
    monetary column.

    The first digit is extracted arithmetically but boundary-safely:
    floor(x) is exact, its decimal digit count comes from a string length
    (never floor(log10(x)), which puts exact powers of ten in the wrong
    bucket when log10 returns 2.9999...), and one division by 10^(digits-1)
    yields the digit. One hash aggregate to 9 rows, one scalar total
    joined back — the full-data pass is a single scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    n_digits = F.length(F.floor(F.col("o_totalprice")).cast("string"))
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), n_digits - 1)
    ).cast("long")
    c = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    t = c.agg(F.sum("n_obs").alias("n"))
    obs_share = F.col("n_obs") * 1.0 / F.col("n")
    exp_share = F.log10(1 + 1.0 / F.col("digit"))
    return c.join(F.broadcast(t), F.lit(True)).select(
        "digit",
        "n_obs",
        F.round(obs_share, 6).alias("obs_share"),
        F.round(exp_share, 6).alias("exp_share"),
        F.round(
            (obs_share - exp_share) * (obs_share - exp_share) / exp_share, 6
        ).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# binned Mann-Whitney U (view vs purchase event values)
# --------------------------------------------------------------------------

_MW_BINS = 100

_MW_ORACLE = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE event_type IN ('{_WELCH_A}', '{_WELCH_B}')
),
s AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
binned AS (
  SELECT least(CAST(floor((value - lo)
                          / greatest((hi - lo) / {_MW_BINS}, 1e-12))
               AS BIGINT), {_MW_BINS - 1}) AS bin,
         sum(CASE WHEN event_type = '{_WELCH_A}' THEN 1 ELSE 0 END) * 1.0
           AS na,
         sum(CASE WHEN event_type = '{_WELCH_B}' THEN 1 ELSE 0 END) * 1.0
           AS nb
  FROM ev CROSS JOIN s GROUP BY 1
),
ranked AS (
  SELECT na, nb, na + nb AS t,
         coalesce(sum(na + nb) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (na + nb + 1) / 2.0 AS midrank
  FROM binned
),
agg AS (
  SELECT sum(na) AS n_a, sum(nb) AS n_b, sum(na + nb) AS n,
         sum(na * midrank) AS r_a,
         sum(t * t * t - t) AS ties
  FROM ranked
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(r_a - n_a * (n_a + 1) / 2.0, 6) AS u_stat,
       round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
             / greatest(sqrt(n_a * n_b / 12.0
                             * ((n + 1) - ties / (n * (n - 1)))), 1e-12), 6)
         AS z_score
FROM agg
"""


@register("stats_mann_whitney_binned", _MW_ORACLE)
def stats_mann_whitney_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned Mann-Whitney U between the 'view' and 'purchase' event-value
    cohorts: rank-sum U and the tie-corrected normal z-score — the
    median-shift companion to Welch (means) and KS (shape), robust to the
    heavy-tailed values where the t-test loses power.

    Exact MW needs a global rank (a 100 TB sort); the binned estimator
    folds values into {_MW_BINS} fixed-width bins with ONE hash aggregate
    and treats each bin as one tie group with its textbook midrank and
    tie-corrected variance term (t^3 - t). The cumulative midrank window
    runs over at most {_MW_BINS} rows — driver-sized regardless of input,
    the same trick as the binned KS ECDF and Spearman. Oracle: identical
    arithmetic in DuckDB."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_WELCH_A, _WELCH_B))
        .select("event_type", "value")
    )
    s = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = F.greatest((F.col("hi") - F.col("lo")) / _MW_BINS, F.lit(1e-12))
    binned = (
        ev.join(F.broadcast(s), F.lit(True))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
                F.lit(_MW_BINS - 1),
            ).alias("bin"),
            F.when(F.col("event_type") == _WELCH_A, 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == _WELCH_B, 1).otherwise(0).alias("ib"),
        )
        .groupBy("bin")
        .agg(
            (F.sum("ia") * 1.0).alias("na"),
            (F.sum("ib") * 1.0).alias("nb"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("na") + F.col("nb")
    ranked = binned.select(
        "na",
        "nb",
        t.alias("t"),
        (
            F.coalesce(F.sum(t).over(w), F.lit(0.0)) + (t + 1) / 2.0
        ).alias("midrank"),
    )
    agg = ranked.agg(
        F.sum("na").alias("n_a"),
        F.sum("nb").alias("n_b"),
        F.sum(F.col("na") + F.col("nb")).alias("n"),
        F.sum(F.col("na") * F.col("midrank")).alias("r_a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    var = (
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * (
            (F.col("n") + 1)
            - F.col("ties") / (F.col("n") * (F.col("n") - 1))
        )
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(u, 6).alias("u_stat"),
        F.round(
            (u - F.col("n_a") * F.col("n_b") / 2.0)
            / F.greatest(F.sqrt(var), F.lit(1e-12)),
            6,
        ).alias("z_score"),
    )


# --------------------------------------------------------------------------
# one-pass bootstrap confidence interval (double-or-nothing multiplier)
# --------------------------------------------------------------------------

_BOOT_B = 100  # replicates
_BOOT_M = 2147483647  # hash modulus (2^31 - 1)

_BOOT_ORACLE = f"""
WITH reps AS (
  SELECT b, sum(w * x) / greatest(sum(w), 1e-12) AS mean_b
  FROM (
    SELECT o_totalprice AS x, r.b AS b,
           2.0 * (CAST(floor((((o_orderkey % {_BOOT_M}) * 1103515245
                               + r.b * 2654435761) % {_BOOT_M})
                        / 65536) AS BIGINT) % 2) AS w
    FROM orders CROSS JOIN range(1, {_BOOT_B + 1}) r(b)
  ) GROUP BY b
),
pt AS (
  SELECT count(*)::BIGINT AS n_rows, avg(o_totalprice) AS mean_est
  FROM orders
)
SELECT pt.n_rows,
       round(pt.mean_est, 6) AS mean_est,
       round(stddev_samp(mean_b), 6) AS boot_se,
       round(quantile_cont(mean_b, 0.05), 6) AS ci_lo,
       round(quantile_cont(mean_b, 0.95), 6) AS ci_hi
FROM reps CROSS JOIN pt
GROUP BY pt.n_rows, pt.mean_est
"""


@register("stats_bootstrap_ci_mean", _BOOT_ORACLE)
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap standard error and 90% CI for the mean order total in ONE
    pass — the double-or-nothing multiplier bootstrap (each row enters
    each replicate with weight 0 or 2, mean 1 / variance 1, matching the
    Efron bootstrap's first-order variance) with fully DETERMINISTIC
    weights from an arithmetic hash of (o_orderkey, replicate), so the
    result is reproducible and cross-engine checkable with no RNG.

    Scale shape: no resampling shuffle exists — the row x replicate
    expansion is map-local (explode of a {_BOOT_B}-element sequence) and
    partial aggregation collapses it to {_BOOT_B} rows per partition
    before the exchange; the exchange then carries partitions x
    {_BOOT_B} partial sums, never data. The replicate-mean frame is
    {_BOOT_B} rows — driver-sized — so the closing percentile/stddev is
    free. This is how a CI is computed at 100 TB, where materializing
    even one resample is impossible."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("x")
    )
    expanded = orders.select(
        "o_orderkey",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
    )
    h = (
        (F.col("o_orderkey") % _BOOT_M) * 1103515245
        + F.col("b") * 2654435761
    ) % _BOOT_M
    w = 2.0 * (F.floor(h / 65536) % 2)
    reps = (
        expanded.select("b", "x", w.alias("w"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("x"))
                / F.greatest(F.sum("w"), F.lit(1e-12))
            ).alias("mean_b")
        )
    )
    pt = orders.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.avg("x").alias("mean_est"),
    )
    return reps.join(F.broadcast(pt), F.lit(True)).groupBy(
        "n_rows", "mean_est"
    ).agg(
        F.round(F.stddev_samp("mean_b"), 6).alias("boot_se"),
        F.round(F.percentile("mean_b", F.lit(0.05)), 6).alias("ci_lo"),
        F.round(F.percentile("mean_b", F.lit(0.95)), 6).alias("ci_hi"),
    ).select(
        "n_rows",
        F.round("mean_est", 6).alias("mean_est"),
        "boot_se",
        "ci_lo",
        "ci_hi",
    )
