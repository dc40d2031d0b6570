"""Driver-checked catalog entries for the two quirk-bearing parity joins
(round-4 verdict "What's missing" #1): until now J2 (the m:m dimension
fan-out) and J4 (the float-string canton key) were verified only by the
pytest pandas-oracle suite (tests/test_sri_etl.py); these queries give the
same semantics oracle-checked rows over the standard test warehouse.

Both derive an SRI-shaped frame deterministically from TPC-H tables so the
DuckDB oracle can rebuild the identical fixture — the QUIRK is what's under
test, not the Ecuadorian data:

- J2 (reference dags/sri_vehiculos_etl_dag.py:232-242 build vs :494-508
  lookup): dim_transaccion is DISTINCT over four columns but the fact
  lookup left-merges on only two of them, so every fact row multiplies by
  all dim rows sharing its two-column pair (the 8,848-row dim over ~4
  join pairs that exploded the production run ~2,000x).
- J4 (reference :350 `str(codigo)` / :520 `.astype(str)`): CANTÓN holds
  NaN so pandas reads it float64; stringification yields '10701.0', which
  never matches the 17-entry canton map keyed '10701' (:303-321) — every
  dim row degrades to the generic CANTON_<code>.0 / NO_IDENTIFICADA entry
  (:362-370) — yet the fact↔dim join still matches because BOTH sides
  stringify the same way, while NaN rows stringify to 'nan' on the fact
  side only (the dim used dropna(), :345) and join to nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

# --------------------------------------------------------------------------
# J2: many-to-many dimension fan-out
# --------------------------------------------------------------------------

_FANOUT_ORACLE = """
WITH dim AS (
  SELECT DISTINCT p_brand, p_size, p_type, p_name FROM part
),
joined AS (
  SELECT f.p_partkey, d.p_type, d.p_name
  FROM part f LEFT JOIN dim d
    ON f.p_brand = d.p_brand AND f.p_size = d.p_size
),
per_key AS (
  SELECT p_partkey, count(*) AS fanout FROM joined GROUP BY 1
)
SELECT (SELECT count(*) FROM part)::BIGINT AS n_source,
       (SELECT count(*) FROM dim)::BIGINT AS dim_rows,
       CAST(sum(fanout) AS BIGINT) AS n_after_join,
       max(fanout)::BIGINT AS max_fanout,
       round(avg(fanout), 6) AS avg_fanout,
       sum(CASE WHEN fanout > 1 THEN 1 ELSE 0 END)::BIGINT AS n_fanned_keys
FROM per_key
"""


@register("parity_fanout_join", _FANOUT_ORACLE)
def parity_fanout_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 parity: DISTINCT-over-4-columns dimension left-joined back on
    only 2 of them — the reference's dim_transaccion hazard (reference
    dags/sri_vehiculos_etl_dag.py:232-242 vs :494-508) replayed over
    `part`: dim = distinct (brand, size, type, name), lookup key =
    (brand, size) only, so each part row fans out by every
    (type, name) variant sharing its pair. Reports the explosion
    footprint: output cardinality, worst and mean per-key fan-out, and
    how many source rows multiplied at all.

    At scale this is the join an FD audit (governance_fd_audit) exists to
    catch BEFORE it runs; the etl/fact.py production path guards it with
    a dedup (tests/test_parity_fanout_guard.py) — this entry pins the
    unguarded semantics the reference actually executes."""
    part = load_table(spark, sf_dir, "part")
    dim = part.select("p_brand", "p_size", "p_type", "p_name").distinct()
    joined = part.select("p_partkey", "p_brand", "p_size").join(
        dim, ["p_brand", "p_size"], "left"
    )
    per_key = joined.groupBy("p_partkey").agg(F.count("*").alias("fanout"))
    # metadata scalars stay IN the plan as 1-row aggregates crossJoined
    # into the final row (the graph/pagerank.py pattern) — no driver-side
    # .count() actions, so the whole query is one job and one source scan
    # per input (exchange reuse covers the repeated subtrees)
    n_src1 = part.agg(F.count("*").cast("long").alias("n_source"))
    n_dim1 = dim.agg(F.count("*").cast("long").alias("dim_rows"))
    # aggregate over the PER-KEY frame (one row per source key), not the
    # fanout-expanded join rows: avg_fanout is the mean per-key fan-out
    # and n_fanned_keys counts keys that multiplied — the expanded frame
    # would weight every key by its own fanout and overstate both
    return (
        per_key.agg(
            F.sum("fanout").cast("long").alias("n_after_join"),
            F.max("fanout").cast("long").alias("max_fanout"),
            F.round(F.avg("fanout"), 6).alias("avg_fanout"),
            F.sum(F.when(F.col("fanout") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_fanned_keys"),
        )
        .crossJoin(n_src1)
        .crossJoin(n_dim1)
        .select(
            "n_source",
            "dim_rows",
            "n_after_join",
            "max_fanout",
            "avg_fanout",
            "n_fanned_keys",
        )
    )


# --------------------------------------------------------------------------
# J4: float-string canton key
# --------------------------------------------------------------------------

# the reference's static canton map keys — plain integer strings that can
# NEVER match a stringified float64 ('10701' vs '10701.0'): the Q3 quirk
_CANTON_MAP_KEYS = ["10101", "10201", "10301", "10401", "10501"]

_FLOATSTR_ORACLE = f"""
WITH src AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 11 = 0 THEN NULL
              ELSE CAST(10001 + (c_custkey % 5) * 100 AS DOUBLE) END
             AS codigo
  FROM customer
),
stringified AS (
  SELECT c_custkey, coalesce(CAST(codigo AS STRING), 'nan') AS codigo_str
  FROM src
),
dim AS (
  SELECT CAST(row_number() OVER (ORDER BY codigo_str) AS BIGINT)
             AS id_ubicacion,
         codigo_str AS codigo_canton
  FROM (SELECT DISTINCT CAST(codigo AS STRING) AS codigo_str
        FROM src WHERE codigo IS NOT NULL)
),
mapa AS (SELECT * FROM (VALUES {", ".join(f"('{k}')" for k in _CANTON_MAP_KEYS)})
         AS t(map_key)),
dim_named AS (
  SELECT d.id_ubicacion, d.codigo_canton,
         CASE WHEN m.map_key IS NULL THEN 'CANTON_' || d.codigo_canton
              ELSE 'MAPPED' END AS nombre_canton,
         CASE WHEN m.map_key IS NULL THEN 'NO_IDENTIFICADA'
              ELSE 'MAPPED' END AS provincia
  FROM dim d LEFT JOIN mapa m ON d.codigo_canton = m.map_key
),
fact AS (
  SELECT s.c_custkey, s.codigo_str, d.id_ubicacion
  FROM stringified s LEFT JOIN dim_named d ON s.codigo_str = d.codigo_canton
)
SELECT (SELECT count(*) FROM src)::BIGINT AS n_source,
       (SELECT count(*) FROM src WHERE codigo IS NULL)::BIGINT AS n_null_code,
       (SELECT count(*) FROM dim)::BIGINT AS dim_rows,
       (SELECT count(*) FROM dim_named WHERE provincia <> 'NO_IDENTIFICADA')::BIGINT
           AS n_map_matched,
       (SELECT count(*) FROM fact WHERE id_ubicacion IS NOT NULL)::BIGINT
           AS n_fact_matched,
       (SELECT count(*) FROM fact WHERE id_ubicacion IS NULL)::BIGINT
           AS n_fact_unmatched
"""


@register("parity_floatstring_join", _FLOATSTR_ORACLE)
def parity_floatstring_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 parity: the float-string canton key (reference
    dags/sri_vehiculos_etl_dag.py:350, :520-526 — SURVEY Q3). A nullable
    numeric code is stringified on BOTH the dim build and the fact lookup,
    so keys read '10001.0' and (a) never match the reference's static
    integer-keyed canton map — n_map_matched MUST be 0, every dim entry
    degrades to CANTON_<code>.0 / NO_IDENTIFICADA — yet (b) the fact→dim
    join still resolves, because both sides stringified identically;
    (c) NULL codes stringify to 'nan' on the fact side only (the dim
    dropna()'d them) and join to nothing.

    Derivation is deterministic from `customer` (custkey modulus), so the
    DuckDB oracle rebuilds the identical fixture; Spark CAST(double AS
    STRING) and DuckDB CAST(double AS VARCHAR) both render '10001.0',
    which IS the semantic under test."""
    cust = load_table(spark, sf_dir, "customer")
    codigo = F.when(F.col("c_custkey") % 11 == 0, F.lit(None)).otherwise(
        (10001 + (F.col("c_custkey") % 5) * 100).cast("double")
    )
    src = cust.select("c_custkey", codigo.alias("codigo"))
    stringified = src.select(
        "c_custkey",
        F.coalesce(F.col("codigo").cast("string"), F.lit("nan")).alias(
            "codigo_str"
        ),
    )
    from pyspark.sql import Window

    dim = (
        src.filter(F.col("codigo").isNotNull())
        .select(F.col("codigo").cast("string").alias("codigo_str"))
        .distinct()
        .select(
            F.row_number()
            .over(Window.orderBy("codigo_str"))
            .cast("long")
            .alias("id_ubicacion"),
            F.col("codigo_str").alias("codigo_canton"),
        )
    )
    mapa = spark.createDataFrame(
        [(k,) for k in _CANTON_MAP_KEYS], "map_key string"
    )
    dim_named = dim.join(
        F.broadcast(mapa), dim["codigo_canton"] == mapa["map_key"], "left"
    ).select(
        "id_ubicacion",
        "codigo_canton",
        F.when(
            F.col("map_key").isNull(),
            F.concat(F.lit("CANTON_"), F.col("codigo_canton")),
        )
        .otherwise(F.lit("MAPPED"))
        .alias("nombre_canton"),
        F.when(F.col("map_key").isNull(), F.lit("NO_IDENTIFICADA"))
        .otherwise(F.lit("MAPPED"))
        .alias("provincia"),
    )
    fact = stringified.join(
        F.broadcast(dim_named),
        stringified["codigo_str"] == dim_named["codigo_canton"],
        "left",
    )
    # every metadata scalar is a 1-row conditional aggregate crossJoined
    # into the final row — zero driver-side actions, one job; the
    # coalesce floors keep the counts 0 (not NULL) on empty inputs so the
    # degenerate-input sweep sees the same values .count() produced
    src_agg = src.agg(
        F.count("*").cast("long").alias("n_source"),
        F.coalesce(
            F.sum(F.when(F.col("codigo").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_null_code"),
    )
    dim_agg = dim.agg(F.count("*").cast("long").alias("dim_rows"))
    map_agg = dim_named.agg(
        F.coalesce(
            F.sum(F.when(F.col("provincia") != "NO_IDENTIFICADA", 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_map_matched")
    )
    return (
        fact.agg(
            F.coalesce(
                F.sum(F.when(F.col("id_ubicacion").isNotNull(), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_fact_matched"),
            F.coalesce(
                F.sum(F.when(F.col("id_ubicacion").isNull(), 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("n_fact_unmatched"),
        )
        .crossJoin(src_agg)
        .crossJoin(dim_agg)
        .crossJoin(map_agg)
        .select(
            "n_source",
            "n_null_code",
            "dim_rows",
            "n_map_matched",
            "n_fact_matched",
            "n_fact_unmatched",
        )
    )
