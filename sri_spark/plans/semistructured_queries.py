"""Semi-structured (JSON) surface: build, parse, and extract — relationally.

The reference pipeline is flat CSV -> star, but any engine claiming its
query surface needs the JSON path functions users reach for the moment a
feed arrives as JSONL (SURVEY §2.9 additive mandate). Both queries BUILD
the JSON from relational columns first (to_json over a struct), then
treat it as an opaque string and extract through the engine's JSON path
functions — so the oracle checks the parse/extract semantics, not the
engines' incidental whitespace/key-order serialization choices (extracted
VALUES are engine-independent because both sides build from identical
relational data; only scalar outputs are compared).

At 100 TB: get_json_object / from_json are per-row narrow expressions
inside whole-stage codegen — the JSON column never shuffles unparsed; the
aggregates below group on extracted scalars, so the shuffle carries
scalars, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table


@register(
    "semi_json_roundtrip",
    """
    WITH payloads AS (
      SELECT to_json(struct_pack(
               k := o_orderkey, st := o_orderstatus, pr := o_orderpriority
             ))::VARCHAR AS payload
      FROM orders
    )
    SELECT json_extract_string(payload, '$.pr') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(json_extract(payload, '$.k')::BIGINT) AS BIGINT) AS min_key
    FROM payloads
    WHERE json_extract_string(payload, '$.st') = 'F'
    GROUP BY priority
    ORDER BY priority
    """,
)
def semi_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON build -> filter -> extract -> aggregate: orders serialized to a
    JSON payload column, then consumed ONLY through path extraction
    (get_json_object), the way a raw JSONL feed lands. The status filter
    runs on an extracted field — Catalyst keeps the whole chain in one
    codegen stage, and only the two extracted scalars reach the
    aggregate's shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    payloads = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("st"),
                F.col("o_orderpriority").alias("pr"),
            )
        ).alias("payload")
    )
    return (
        payloads.filter(F.get_json_object("payload", "$.st") == "F")
        .groupBy(F.get_json_object("payload", "$.pr").alias("priority"))
        .agg(
            F.count("*").alias("n"),
            F.min(F.get_json_object("payload", "$.k").cast("long")).alias("min_key"),
        )
        .orderBy("priority")
    )


@register(
    "semi_json_nested_array",
    """
    WITH qty AS (
      SELECT l_orderkey,
             list_sort(list(CAST(round(l_quantity) AS INTEGER))) AS qtys
      FROM lineitem
      GROUP BY l_orderkey
    ),
    payloads AS (
      SELECT to_json(struct_pack(k := l_orderkey, q := qtys))::VARCHAR AS payload
      FROM qty
    )
    SELECT CAST(json_array_length(payload, '$.q') AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(json_extract(payload, '$.q[0]')::BIGINT) AS BIGINT)
             AS sum_first_qty
    FROM payloads
    GROUP BY n_lines
    ORDER BY n_lines
    """,
)
def semi_json_nested_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array JSON: per-order quantity lists serialized into the
    payload, then read back via array path extraction ($.q[0]) and
    json_array_length — the access pattern for event feeds carrying
    variable-length detail arrays. The list is sorted before serialization
    (collect_list has no distributed order guarantee), so both engines
    serialize the identical array; outputs are scalars only."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.round("l_quantity", 0).cast("int"))
        ).alias("qtys")
    )
    payloads = qty.select(
        F.to_json(
            F.struct(F.col("l_orderkey").alias("k"), F.col("qtys").alias("q"))
        ).alias("payload")
    )
    return (
        payloads.groupBy(
            F.json_array_length(F.get_json_object("payload", "$.q"))
            .cast("long")
            .alias("n_lines")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.get_json_object("payload", "$.q[0]").cast("long")).alias(
                "sum_first_qty"
            ),
        )
        .orderBy("n_lines")
    )


@register(
    "events_ordered_transcript",
    """
    WITH ev AS (
      SELECT user_id, event_type, value,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS tss,
             epoch_us(ts) AS us, event_id
      FROM events
    )
    SELECT user_id,
           count(*)::BIGINT AS n_turns,
           md5(string_agg(tss || ':' || event_type, '|'
                          ORDER BY us, event_id)) AS transcript_hash,
           string_agg(event_type, '>' ORDER BY us, event_id
                      ) FILTER (WHERE event_type IN ('signup','purchase'))
             AS milestone_path
    FROM ev GROUP BY user_id
    """,
)
def events_ordered_transcript(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user event transcript — the conversation-assembly
    primitive behind instruction-data builds: turns must concatenate in
    EXACT event order on every engine and every partitioning, or
    downstream training examples silently reshuffle. Spark's collect_list
    is order-nondeterministic, so the order is imposed structurally:
    collect (sortable-key, payload) structs, array_sort (structs compare
    field-by-field left-to-right), then transform+array_join. The oracle
    uses DuckDB's ORDER BY-inside-aggregate — two different mechanisms,
    value-identical output (hashed, so the driver compares fixed-width
    scalars, not megabyte strings).

    Shape: one hash aggregate keyed user_id; per-user arrays are bounded
    by user activity — the same per-group-bounded collect contract as
    agg_ordered_list, plus a milestone subsequence built by filtering the
    SAME sorted array (no second shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    item = F.struct(
        F.unix_micros("ts").alias("us"),
        F.col("event_id").alias("eid"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("tss"),
        F.col("event_type").alias("et"),
    )
    agg = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_sort(F.collect_list(item)).alias("__turns"),
    )
    transcript = F.array_join(
        F.transform(
            F.col("__turns"), lambda t: F.concat(t["tss"], F.lit(":"), t["et"])
        ),
        "|",
    )
    milestones = F.array_join(
        F.transform(
            F.filter(
                F.col("__turns"),
                lambda t: t["et"].isin("signup", "purchase"),
            ),
            lambda t: t["et"],
        ),
        ">",
    )
    return agg.select(
        "user_id",
        "n_turns",
        F.md5(transcript).alias("transcript_hash"),
        # empty-path users: DuckDB's FILTERed string_agg yields NULL,
        # array_join yields '' — align on NULL
        F.when(milestones == "", F.lit(None)).otherwise(milestones).alias(
            "milestone_path"
        ),
    )


@register(
    "semi_nested_order_document",
    """
    WITH lines AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
    ),
    docs AS (
      SELECT l_orderkey AS o_key,
             count(*) AS n_lines,
             sum(l_quantity) AS total_qty,
             max(l_extendedprice) AS max_price
      FROM lines GROUP BY l_orderkey
    )
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           count(*)::BIGINT AS n_orders,
           round(avg(total_qty), 6) AS avg_qty,
           round(max(max_price), 2) AS max_price
    FROM docs GROUP BY n_lines
    """,
)
def semi_nested_order_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-model roundtrip: denormalize each order's lines into an
    array<struct> (the JSONL-export shape for nested training data), then
    compute the per-order stats FROM the nested representation with
    higher-order functions (size / aggregate / transform+array_max) — no
    re-explode, no second shuffle. The flat-SQL oracle computing the same
    numbers proves the nested construction is lossless.

    Shape: one groupBy(l_orderkey) collect (bounded per order — max 7
    lines in TPC-H), then array math in codegen, then a lines-count
    rollup. This is the plan shape that writes 100 TB of nested documents:
    the wide shuffle happens once, everything after is narrow."""
    li = load_table(spark, sf_dir, "lineitem")
    line = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )
    docs = li.groupBy("l_orderkey").agg(
        F.collect_list(line).alias("lines")
    )
    n_lines = F.size("lines").cast("long")
    total_qty = F.aggregate(
        F.col("lines"), F.lit(0.0), lambda acc, x: acc + x["qty"]
    )
    max_price = F.array_max(
        F.transform(F.col("lines"), lambda x: x["price"])
    )
    per_order = docs.select(
        n_lines.alias("n_lines"),
        total_qty.alias("total_qty"),
        max_price.alias("max_price"),
    )
    return per_order.groupBy("n_lines").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.avg("total_qty"), 6).alias("avg_qty"),
        F.round(F.max("max_price"), 2).alias("max_price"),
    )
