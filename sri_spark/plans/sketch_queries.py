"""Sketch and data-layout queries: relational count-min, bitmap exact
distinct, and Z-order file-pruning measurement.

Three scale techniques a 100 TB warehouse leans on, each expressed so the
DuckDB oracle can reproduce it bit-for-bit:

- A count-min sketch built RELATIONALLY (seeded md5 buckets + groupBy
  counts) rather than with Spark's binary `count_min_sketch` aggregate —
  the binary sketch has no SQL-side estimator, while the relational one
  is queryable, mergeable with a plain SUM, and oracle-reproducible.
- Exact distinct counts via the Spark 3.5 bitmap family
  (`bitmap_bucket_number` / `bitmap_construct_agg` / `bitmap_count`):
  constant-size per-bucket state instead of a distinct shuffle of every
  key occurrence.
- A Z-order (Morton-interleave) layout audit: how many files a
  rectangle predicate touches under time-ordered vs Z-ordered layout —
  the measurement that justifies `repartitionByRange` on a Z-value before
  a large write.

All additive-mandate families (no reference citation; the reference has no
sketches or layout control — BigQuery clustering at
config/variables.yaml:31-36 is its nearest analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.functions.hashing import md5_int, md5_int_sql
from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

CMS_DEPTH = 4
CMS_WIDTH = 512
_HH_K = 15


def _cms_bucket(j, key):
    """Row j of the sketch hashes `key` with seed j: md5("j-key") % width.
    md5-based so the oracle computes the identical bucket (see
    functions/hashing.py)."""
    return (
        md5_int(F.concat_ws("-", j.cast("string"), key.cast("string"))) % CMS_WIDTH
    )


@register(
    "agg_cms_heavy_hitters",
    f"""
    WITH exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM events GROUP BY user_id
    ),
    probes AS (
      SELECT user_id, exact_cnt FROM exact
      ORDER BY exact_cnt DESC, user_id LIMIT {_HH_K}
    ),
    rows_j AS (
      SELECT user_id, unnest(generate_series(0, {CMS_DEPTH - 1})) AS j FROM events
    ),
    sketch AS (
      SELECT j,
             {md5_int_sql("concat(j::VARCHAR, '-', user_id::VARCHAR)")}
                 % {CMS_WIDTH} AS bucket,
             CAST(count(*) AS BIGINT) AS c
      FROM rows_j GROUP BY 1, 2
    ),
    pb AS (
      SELECT user_id, exact_cnt, unnest(generate_series(0, {CMS_DEPTH - 1})) AS j
      FROM probes
    ),
    pbb AS (
      SELECT user_id, exact_cnt, j,
             {md5_int_sql("concat(j::VARCHAR, '-', user_id::VARCHAR)")}
                 % {CMS_WIDTH} AS bucket
      FROM pb
    )
    SELECT p.user_id, p.exact_cnt,
           CAST(min(s.c) AS BIGINT) AS cms_est,
           min(s.c) >= p.exact_cnt AS never_underestimates
    FROM pbb p JOIN sketch s USING (j, bucket)
    GROUP BY p.user_id, p.exact_cnt
    ORDER BY p.exact_cnt DESC, p.user_id
    """,
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with a relational count-min sketch: depth=4 x
    width=512 counters built in ONE shuffle (explode the depth seeds,
    groupBy (seed, bucket)), then each top-key probe takes the min across
    its depth buckets. The sketch table is depth*width rows regardless of
    input size — it broadcasts into the probe join and merges across
    corpus shards with a plain SUM. `never_underestimates` states the CMS
    guarantee the oracle re-derives exactly."""
    ev = load_table(spark, sf_dir, "events")
    seeds = F.array(*[F.lit(j) for j in range(CMS_DEPTH)])
    exact = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("exact_cnt"))
    sketch = (
        ev.select("user_id", F.explode(seeds).alias("j"))
        .select("j", _cms_bucket(F.col("j"), F.col("user_id")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    probes = (
        exact.orderBy(F.desc("exact_cnt"), "user_id")
        .limit(_HH_K)
        .select("user_id", "exact_cnt", F.explode(seeds).alias("j"))
        .withColumn("bucket", _cms_bucket(F.col("j"), F.col("user_id")))
    )
    return (
        probes.join(sketch, ["j", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").cast("long").alias("cms_est"))
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
        )
        .orderBy(F.desc("exact_cnt"), "user_id")
    )


@register(
    "events_bitmap_exact_distinct",
    """
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def events_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type via the bitmap family: bucket
    ids into 32k-bit bitmaps (`bitmap_bucket_number`), OR the positions
    per (type, bucket) with `bitmap_construct_agg`, sum the popcounts.
    Per-group shuffle state is a fixed 4 KB bitmap per bucket instead of
    one row per distinct occurrence — the exact-answer middle ground
    between `count(distinct)` (full shuffle of keys) and HLL (approx).
    Oracle is the plain COUNT(DISTINCT)."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))").alias(
            "c"
        )
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("c").cast("long").alias("n_users"))
        .orderBy("event_type")
    )


_Z_BITS = 5
_Z_SIDE = 1 << _Z_BITS  # 32
_N_FILES = 64
_X_LO, _X_HI = 8, 11  # user-bucket rectangle
_Y_LO, _Y_HI = 10, 17  # day rectangle


def _interleave(x, y):
    """Morton/Z-value: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_pruning",
    f"""
    WITH base AS (
      SELECT event_id, ts,
             user_id % {_Z_SIDE} AS x,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % {_Z_SIDE} AS y
      FROM events
    ),
    z AS (
      SELECT event_id, ts, x, y, {_interleave_sql('x', 'y')} AS zval FROM base
    ),
    filed AS (
      SELECT x, y,
             ntile({_N_FILES}) OVER (ORDER BY ts, event_id) AS linear_file,
             ntile({_N_FILES}) OVER (ORDER BY zval, event_id) AS zorder_file
      FROM z
    ),
    hits AS (
      SELECT * FROM filed
      WHERE x BETWEEN {_X_LO} AND {_X_HI} AND y BETWEEN {_Y_LO} AND {_Y_HI}
    ),
    u AS (
      SELECT 'linear' AS layout, linear_file AS file_id FROM hits
      UNION ALL
      SELECT 'zorder' AS layout, zorder_file AS file_id FROM hits
    )
    SELECT layout,
           CAST(count(DISTINCT file_id) AS BIGINT) AS files_touched,
           CAST(count(*) AS BIGINT) AS rows_matched
    FROM u GROUP BY layout ORDER BY layout
    """,
)
def layout_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: for a (user-bucket x day) rectangle
    predicate, count how many of 64 equal-size files contain matching
    rows when the table is laid out by time vs by Morton Z-value. The
    Z-layout concentrates the rectangle into few files — the win
    min/max-based file skipping then collects on every scan. The ntile
    windows here are the MEASUREMENT (global order, fine at audit scale);
    the production write path is
    `df.repartitionByRange(n, zval).sortWithinPartitions(zval)` which
    orders with a range shuffle, not a single-partition window."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "ts",
        F.pmod(F.col("user_id"), F.lit(_Z_SIDE)).alias("x"),
        F.pmod(
            F.datediff(F.to_date(F.col("ts")), F.lit("2024-01-01").cast("date")),
            F.lit(_Z_SIDE),
        ).alias("y"),
    )
    z = base.withColumn("zval", _interleave(F.col("x"), F.col("y")))
    filed = z.select(
        "x",
        "y",
        F.ntile(_N_FILES).over(Window.orderBy("ts", "event_id")).alias("linear_file"),
        F.ntile(_N_FILES).over(Window.orderBy("zval", "event_id")).alias("zorder_file"),
    )
    hits = filed.filter(
        F.col("x").between(_X_LO, _X_HI) & F.col("y").between(_Y_LO, _Y_HI)
    )
    u = hits.select(
        F.lit("linear").alias("layout"), F.col("linear_file").alias("file_id")
    ).unionAll(
        hits.select(F.lit("zorder").alias("layout"), F.col("zorder_file").alias("file_id"))
    )
    return (
        u.groupBy("layout")
        .agg(
            F.countDistinct("file_id").cast("long").alias("files_touched"),
            F.count("*").cast("long").alias("rows_matched"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction

BLOOM_M = 8192  # bits
BLOOM_K = 3  # hash functions
_BLOOM_SEGMENT = "BUILDING"


def _bloom_pos(j, key):
    """Bit position for hash j of `key` — md5-seeded like the CMS so the
    oracle reproduces the filter bit-for-bit."""
    return (
        md5_int(F.concat_ws("-", j.cast("string"), key.cast("string"))) % BLOOM_M
    )


_BLOOM_POS_SQL = (
    md5_int_sql("concat(j::VARCHAR, '-', custkey::VARCHAR)") + f" % {BLOOM_M}"
)


@register(
    "join_bloom_prefilter",
    f"""
    WITH dim AS (
      SELECT c_custkey AS custkey FROM customer
      WHERE c_mktsegment = '{_BLOOM_SEGMENT}'
    ),
    bits AS (
      SELECT DISTINCT {_BLOOM_POS_SQL} AS p
      FROM (SELECT custkey, unnest(generate_series(0, {BLOOM_K - 1})) AS j FROM dim)
    ),
    probe AS (
      SELECT o_orderkey, custkey, {_BLOOM_POS_SQL} AS p
      FROM (SELECT o_orderkey, o_custkey AS custkey,
                   unnest(generate_series(0, {BLOOM_K - 1})) AS j
            FROM orders)
    ),
    passed AS (
      SELECT o_orderkey, custkey
      FROM probe JOIN bits USING (p)
      GROUP BY o_orderkey, custkey
      HAVING count(*) = {BLOOM_K}
    ),
    truth AS (
      SELECT o_orderkey FROM orders JOIN dim ON o_custkey = custkey
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
           (SELECT CAST(count(*) AS BIGINT) FROM dim) AS n_dim_keys,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS bits_set,
           (SELECT CAST(count(*) AS BIGINT) FROM passed) AS n_pass_bloom,
           (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_match,
           (SELECT CAST(count(*) AS BIGINT) FROM passed)
             - (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_false_pos,
           round(((SELECT count(*) FROM passed) - (SELECT count(*) FROM truth))
             * 100.0 / (SELECT count(*) FROM orders), 4) AS fp_pct_of_scan
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, made explicit and measurable: build
    an m=8192/k=3 Bloom filter over the BUILDING-segment customer keys,
    prefilter orders against it BEFORE the join, and report how many rows
    pass vs truly match (false positives = wasted join input the filter
    could not reject).

    This is the mechanism behind Spark's runtime bloom-filter join pruning
    (spark.sql.optimizer.runtime.bloomFilter.enabled — injected under a
    shuffle join when one side is selective); building it relationally
    documents the cost model: the bits table is <= k*|dim| rows regardless
    of fact size, broadcasts to every probe task, and each fact row pays k
    hashes to skip the shuffle. The md5-seeded positions make the DuckDB
    oracle reproduce the exact same filter, so the false-positive count is
    value-checked, not just bounded."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == _BLOOM_SEGMENT)
        .select(F.col("c_custkey").alias("custkey"))
    )
    orders = load_table(spark, sf_dir, "orders")
    seeds = F.array(*[F.lit(j) for j in range(BLOOM_K)])
    bits = (
        cust.select("custkey", F.explode(seeds).alias("j"))
        .select(_bloom_pos(F.col("j"), F.col("custkey")).alias("p"))
        .distinct()
    )
    probe = orders.select(
        "o_orderkey", F.col("o_custkey").alias("custkey"), F.explode(seeds).alias("j")
    ).select("o_orderkey", "custkey", _bloom_pos(F.col("j"), F.col("custkey")).alias("p"))
    passed = (
        probe.join(bits, "p")
        .groupBy("o_orderkey", "custkey")
        .agg(F.count("*").alias("k_hit"))
        .filter(F.col("k_hit") == BLOOM_K)
    )
    # one pass over the survivors answers pass AND truth: left-join the
    # (broadcast-sized) dim and count matches — the Bloom no-false-negative
    # property makes "passed ∩ dim" identical to "orders ∩ dim", so the
    # full orders⋈dim truth join never has to run
    verdict = passed.join(cust.withColumn("__m", F.lit(1)), "custkey", "left").agg(
        F.count("*").cast("long").alias("n_pass_bloom"),
        # coalesce OUTSIDE the sum too: sum() over an empty survivor
        # frame is NULL — the false-positive subtraction below needs 0
        F.coalesce(F.sum(F.coalesce(F.col("__m"), F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_true_match"),
    )
    # every scalar — verdict counts AND the metadata counts (fact rows,
    # dim rows, bits set) — rides the plan as a 1-row aggregate crossJoin:
    # zero driver-side actions (.first()/.count() are gone), one job.
    # try_divide, not a when() guard, for the empty-orders case: ANSI
    # codegen evaluates guarded branches, and the oracle's x/0 is NULL.
    counts = (
        orders.agg(F.count("*").cast("long").alias("n_orders"))
        .crossJoin(cust.agg(F.count("*").cast("long").alias("n_dim_keys")))
        .crossJoin(bits.agg(F.count("*").cast("long").alias("bits_set")))
    )
    fp = F.col("n_pass_bloom") - F.col("n_true_match")
    return verdict.crossJoin(counts).select(
        "n_orders",
        "n_dim_keys",
        "bits_set",
        "n_pass_bloom",
        "n_true_match",
        fp.cast("long").alias("n_false_pos"),
        F.round(F.try_divide(fp * 100.0, F.col("n_orders")), 4).alias(
            "fp_pct_of_scan"
        ),
    )


@register(
    "part_pareto_skyline",
    """
    WITH per_size AS (
      SELECT p_size,
             round(min(p_retailprice), 2) AS best_price,
             CAST(count(*) FILTER (WHERE p_retailprice = sz_min) AS BIGINT)
                 AS n_parts_at_point
      FROM (SELECT p_size, p_retailprice,
                   min(p_retailprice) OVER (PARTITION BY p_size) AS sz_min
            FROM part)
      GROUP BY p_size
    ),
    run AS (
      SELECT p_size, best_price, n_parts_at_point,
             min(best_price) OVER (ORDER BY p_size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS bigger_best
      FROM per_size
    )
    SELECT p_size, best_price, n_parts_at_point
    FROM run
    WHERE bigger_best IS NULL OR best_price < bigger_best
    ORDER BY p_size DESC
    """,
)
def part_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (maximize size, minimize price) via the SORT-BASED
    2D algorithm, not the quadratic NOT-EXISTS dominance join: aggregate
    to the best price per size (one hash aggregate over the fact-sized
    input), then a running-min over descending size keeps exactly the
    sizes whose best price undercuts every larger size. The window runs on
    the DISTINCT-SIZE table (50 rows here; bounded by the attribute
    domain, not the data), so the whole operator is one shuffle + one
    metadata-sized window — the shape that survives a 100 TB parts
    catalog, where a dominance self-join would be O(n^2)."""
    part = load_table(spark, sf_dir, "part")
    sz_min = F.min("p_retailprice").over(Window.partitionBy("p_size"))
    per_size = (
        part.select("p_size", "p_retailprice", sz_min.alias("sz_min"))
        .groupBy("p_size")
        .agg(
            F.round(F.min("p_retailprice"), 2).alias("best_price"),
            F.sum(F.when(F.col("p_retailprice") == F.col("sz_min"), 1).otherwise(0))
            .cast("long")
            .alias("n_parts_at_point"),
        )
    )
    bigger_best = F.min("best_price").over(
        Window.orderBy(F.desc("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_size.withColumn("bigger_best", bigger_best)
        .filter(F.col("bigger_best").isNull() | (F.col("best_price") < F.col("bigger_best")))
        .select("p_size", "best_price", "n_parts_at_point")
        .orderBy(F.desc("p_size"))
    )
