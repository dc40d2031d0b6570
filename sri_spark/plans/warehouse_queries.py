"""Warehouse-lifecycle operators the reference's truncate-and-replace star
schema needs at scale: SCD2 history build, MERGE-style incremental upsert,
and one-pass column profiling (the data-quality probe run before loads;
reference analog: the notebook's exploratory df.info()/describe pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table


@register(
    "scd2_user_event_type",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR event_type IS DISTINCT FROM lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    versioned AS (
      SELECT user_id, ts, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM flagged
    ),
    intervals AS (
      SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
             min(ts) AS vf
      FROM versioned GROUP BY user_id, version, event_type
    )
    SELECT user_id, event_type, version,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(vf) OVER v, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(vf) OVER v IS NULL) AS is_current
    FROM intervals
    WINDOW v AS (PARTITION BY user_id ORDER BY version)
    """,
)
def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 build (operators/scd.py): the events stream as a change
    log of each user's event_type — consecutive identical values collapse
    into one versioned validity interval, open-ended on the current row.
    Windows follow the events ordering contract (Spark sorts the
    µs-truncated ts, the oracle sorts epoch_us(ts), tie-broken by
    event_id)."""
    from sri_spark.operators.scd import scd2_from_changelog

    ev = load_table(spark, sf_dir, "events")
    scd = scd2_from_changelog(
        ev.select("user_id", "ts", "event_type", "event_id"),
        key="user_id",
        attrs=["event_type"],
        ts_col="ts",
        tie_breaker="event_id",
    )
    return scd.select(
        "user_id",
        "event_type",
        "version",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


MERGE_NEW_KEY_OFFSET = 10_000_000
MERGE_NEW_KEY_MOD = 97


@register(
    "merge_upsert_customers",
    f"""
    WITH src AS (
      SELECT o_custkey AS c_custkey,
             round(sum(o_totalprice), 2) AS c_acctbal,
             'ACTUALIZADO' AS c_mktsegment
      FROM orders GROUP BY 1
      UNION ALL
      SELECT c_custkey + {MERGE_NEW_KEY_OFFSET}, 0.0, 'NUEVO'
      FROM customer WHERE c_custkey % {MERGE_NEW_KEY_MOD} = 0
    )
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           t.c_name AS c_name,
           CAST(t.c_nationkey AS DOUBLE) AS c_nationkey,
           round(CASE WHEN s.c_custkey IS NOT NULL
                      THEN s.c_acctbal ELSE t.c_acctbal END, 2) AS c_acctbal,
           CASE WHEN s.c_custkey IS NOT NULL
                THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment
    FROM customer t FULL JOIN src s ON t.c_custkey = s.c_custkey
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MERGE (operators/merge.py): a daily batch — per-customer
    order totals plus a slice of brand-new keys — upserts into the customer
    dimension. Matched rows take the batch's balance/segment, unmatched
    batch rows insert (missing attributes NULL), untouched customers pass
    through. One shuffle on the key; the oracle is the equivalent FULL
    JOIN resolution."""
    from sri_spark.operators.merge import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    updates = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("c_acctbal"),
        F.lit("ACTUALIZADO").alias("c_mktsegment"),
    )
    inserts = cust.filter(F.col("c_custkey") % MERGE_NEW_KEY_MOD == 0).select(
        (F.col("c_custkey") + MERGE_NEW_KEY_OFFSET).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NUEVO").alias("c_mktsegment"),
    )
    merged = merge_upsert(
        cust,
        updates.unionByName(inserts),
        key="c_custkey",
        update_cols=["c_acctbal", "c_mktsegment"],
    )
    # c_nationkey is NULL for inserted keys; pandas widens a nullable int
    # to float64 on the oracle side, so pin BOTH sides to double (values
    # are exact small integers — lossless) to keep schema/dtype parity
    # even on a fixture where the column goes all-NULL.
    return merged.withColumn("c_acctbal", F.round("c_acctbal", 2)).withColumn(
        "c_nationkey", F.col("c_nationkey").cast("double")
    )


_PROFILE_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
_PROFILE_STR = ["o_orderstatus", "o_orderpriority"]
_PROFILE_TS = ["o_orderdate"]


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM:
        parts.append(
            f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
            count(*) - count({c}) AS n_nulls,
            count(DISTINCT {c}) AS n_distinct,
            round(min({c})::DOUBLE, 6) AS min_num,
            round(max({c})::DOUBLE, 6) AS max_num,
            NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
            FROM orders"""
        )
    for c in _PROFILE_STR:
        parts.append(
            f"""SELECT '{c}', count(*), count(*) - count({c}),
            count(DISTINCT {c}), NULL::DOUBLE, NULL::DOUBLE,
            min({c}), max({c}) FROM orders"""
        )
    for c in _PROFILE_TS:
        parts.append(
            f"""SELECT '{c}', count(*), count(*) - count({c}),
            count(DISTINCT {c}), NULL::DOUBLE, NULL::DOUBLE,
            strftime(min({c}), '%Y-%m-%d'), strftime(max({c}), '%Y-%m-%d')
            FROM orders"""
        )
    return " UNION ALL ".join(parts)


@register("profile_orders_columns", _profile_oracle())
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler: per-column null count, exact distinct
    count, and typed min/max, computed in a SINGLE aggregate over one scan
    (Catalyst plans the multi-distinct via expand), then unpivoted to one
    row per column driver-side-free with explode of a literal struct array.
    The profile every load job runs before writing; at 100 TB swap exact
    distincts for approx_count_distinct."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in _PROFILE_NUM + _PROFILE_STR + _PROFILE_TS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)

    def entry(c: str, kind: str):
        base = {
            "col_name": F.lit(c),
            "n_rows": F.col("__n"),
            "n_nulls": (F.col("__n") - F.col(f"{c}__nn")).cast("long"),
            "n_distinct": F.col(f"{c}__nd").cast("long"),
        }
        if kind == "num":
            base["min_num"] = F.round(F.col(f"{c}__min").cast("double"), 6)
            base["max_num"] = F.round(F.col(f"{c}__max").cast("double"), 6)
            base["min_str"] = F.lit(None).cast("string")
            base["max_str"] = F.lit(None).cast("string")
        else:
            base["min_num"] = F.lit(None).cast("double")
            base["max_num"] = F.lit(None).cast("double")
            fmt = (
                (lambda x: F.date_format(x, "yyyy-MM-dd"))
                if kind == "ts"
                else (lambda x: x.cast("string"))
            )
            base["min_str"] = fmt(F.col(f"{c}__min"))
            base["max_str"] = fmt(F.col(f"{c}__max"))
        return F.struct(*[v.alias(k) for k, v in base.items()])

    entries = (
        [entry(c, "num") for c in _PROFILE_NUM]
        + [entry(c, "str") for c in _PROFILE_STR]
        + [entry(c, "ts") for c in _PROFILE_TS]
    )
    return one.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


_PIT_ORACLE = """
WITH hist AS (
  SELECT user_id, ts, event_id, event_type FROM events
  WHERE event_type <> 'purchase'
),
flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM hist
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
versioned AS (
  SELECT user_id, ts, event_type,
         sum(chg) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                        ROWS UNBOUNDED PRECEDING) AS version
  FROM flagged
),
intervals AS (
  SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
         min(ts) AS valid_from
  FROM versioned GROUP BY user_id, version, event_type
),
iv AS (
  SELECT user_id, version, event_type, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to
  FROM intervals
),
probes AS (
  SELECT user_id, event_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts, p.value,
       s.version, s.event_type AS attr_type
FROM probes p LEFT JOIN iv s
  ON p.user_id = s.user_id
 AND epoch_us(s.valid_from) <= epoch_us(p.ts)
 AND (s.valid_to IS NULL OR epoch_us(p.ts) < epoch_us(s.valid_to))
"""


@register("join_point_in_time", _PIT_ORACLE)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against SCD2 history: each purchase event
    resolves the attribute version valid AT its timestamp — the
    training-feature / regulatory-reporting join that must never leak
    future values.

    Spark-first shape: SCD2 validity intervals partition each key's
    timeline, so "valid_from <= ts < valid_to" is equivalent to an AS-OF
    join on valid_from — which operators/asof.py runs as one union + one
    keyed window (single shuffle, no non-equi join, no interval
    materialization). The oracle states the interval condition directly;
    both sides resolve empty intervals (duplicate-timestamp version runs)
    to the later version."""
    from sri_spark.operators.asof import asof_join
    from sri_spark.operators.scd import scd2_from_changelog

    ev = load_table(spark, sf_dir, "events")
    hist = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_type", "event_id"
    )
    scd = scd2_from_changelog(
        hist, key="user_id", attrs=["event_type"], ts_col="ts",
        tie_breaker="event_id",
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    right = scd.select(
        "user_id",
        "valid_from",
        "version",
        F.col("event_type").alias("attr_type"),
    )
    out = asof_join(
        probes,
        right,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        right_cols=["version", "attr_type"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
        "version",
        "attr_type",
    )


_RFM_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY 1
),
scored AS (
  SELECT custkey,
         strftime(last_order, '%Y-%m-%d') AS last_order,
         frequency, monetary,
         ntile(4) OVER (ORDER BY last_order, custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency, custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary, custkey) AS m_score
  FROM per_cust
)
SELECT custkey, last_order, frequency, monetary,
       CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
FROM scored
"""


@register("customers_rfm_segments", _RFM_ORACLE)
def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary quartiles
    (ntile(4), tie-broken by custkey so the quartile assignment is a total
    order — engine-independent) composed into the classic 3-digit RFM code.
    One hash aggregate over orders, then three same-source window ranks on
    the customers-sized rollup; a 100 TB deployment would swap the global
    ntile for percentile-bucket joins, same output contract."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    r = F.ntile(4).over(Window.orderBy("last_order", "custkey"))
    f = F.ntile(4).over(Window.orderBy("frequency", "custkey"))
    m = F.ntile(4).over(Window.orderBy("monetary", "custkey"))
    scored = per_cust.select(
        "custkey",
        F.date_format("last_order", "yyyy-MM-dd").alias("last_order"),
        "frequency",
        "monetary",
        r.cast("long").alias("r_score"),
        f.cast("long").alias("f_score"),
        m.cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast(
            "long"
        ),
    )


_Q18_MIN_QTY = 250


@register(
    "orders_large_volume_customers",
    f"""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_MIN_QTY}
    )
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY total_qty DESC, o.o_orderkey LIMIT 100
    """,
)
def orders_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate lineitems to
    per-order quantity, HAVING-filter the heavy tail, then join the
    surviving handful back to orders and customers. The aggregate runs
    BEFORE any join, so the two joins move only qualifying orders (~1% of
    the fact) — the aggregate-then-semijoin discipline that keeps Q18
    scan-bound; top-100 with a tie-broken total order compiles to
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


_Q17_BRAND = "Brand#4"
_Q17_FRACTION = 0.2


@register(
    "lineitem_small_order_revenue",
    f"""
    WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'),
    thresholds AS (
      SELECT l.l_partkey, {_Q17_FRACTION} * avg(l.l_quantity) AS qty_cut
      FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey
      GROUP BY l.l_partkey
    )
    SELECT round(coalesce(sum(l.l_extendedprice), 0) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small_lineitems
    FROM lineitem l
    JOIN thresholds t ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_cut
    """,
)
def lineitem_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    scalar subquery "quantity < 0.2 * avg(quantity) for this part"
    decorrelated into an aggregate-then-join — per-part thresholds build in
    one hash aggregate over just the brand's lineitems, then join back as
    an equi-join. The relative (per-part average) threshold is scale-free,
    so the query means the same thing at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bp = part.filter(F.col("p_brand") == _Q17_BRAND).select("p_partkey")
    brand_li = li.join(bp, li["l_partkey"] == bp["p_partkey"])
    thresholds = brand_li.groupBy("l_partkey").agg(
        (F.lit(_Q17_FRACTION) * F.avg("l_quantity")).alias("qty_cut")
    )
    small = li.join(thresholds, "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_cut")
    )
    return small.agg(
        F.round(F.coalesce(F.sum("l_extendedprice"), F.lit(0.0)) / 7.0, 2).alias(
            "avg_yearly"
        ),
        F.count("*").alias("n_small_lineitems"),
    )


@register(
    "orders_delayed_exists",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_delayed_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def orders_delayed_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (priority check via EXISTS): orders with at least one
    lineitem shipping more than 60 days after the order date, counted by
    priority. The EXISTS compiles to a LEFT SEMI join on the order key with
    the cross-table date predicate evaluated inside the join — one shuffle
    on the key, each order emitted at most once regardless of how many
    lines qualify (the semantics a plain inner join + distinct would pay a
    dedup shuffle to recover)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delayed = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        delayed.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_delayed_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "customer_idle_wealthy",
    """
    WITH cutoff AS (
      SELECT avg(c_acctbal) AS cut FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_balance
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.cut
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01'
      )
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def customer_idle_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity): customers whose balance
    beats the positive-balance average but who placed no RECENT order
    (none since 2001-01-01 — the fixture's final seven months; the
    unscoped "never ordered" version is empty on this data, where every
    customer orders ~10 times). Two classic decorrelations in one plan:
    the scalar aggregate subquery becomes a single-row broadcast (crossed
    into the filter — safe at any scale, the subquery is always 1 row),
    and NOT EXISTS becomes a LEFT ANTI join on the customer key against
    the date-filtered orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    cut = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    wealthy = cust.join(F.broadcast(cut)).filter(F.col("c_acctbal") > F.col("cut"))
    idle = wealthy.join(
        orders, wealthy["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return (
        idle.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )
