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
