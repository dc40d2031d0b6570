"""SURVEY §2 relational operator catalog on the TPC-H-ish fixtures.

Each query re-expresses one reference operator family (cited per query) on
the driver's fixture tables, with a DuckDB oracle. Mapping rationale:
FIXTURES.md §3 — lineitem/orders are fact-like, customer/nation/region/part
are dims; the SRI star ETL itself is exercised separately in sri_spark.etl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.functions.cleaning import coerce_date, coerce_double
from sri_spark.functions.dates import DIAS_ES, MESES_ES, date_parts, nombre_dia_es, nombre_mes_es
from sri_spark.operators.keys import add_surrogate_key
from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table


def _case_sql(col_expr: str, mapping: dict[int, str]) -> str:
    whens = " ".join(f"WHEN {k} THEN '{v}'" for k, v in mapping.items())
    return f"CASE {col_expr} {whens} END"


# ---------------------------------------------------------------------------
# S5 + K1 + E1–E3: generated calendar dimension (dim_tiempo analogue)
# reference dags/sri_vehiculos_etl_dag.py:50-121
# ---------------------------------------------------------------------------

_CAL_ORACLE = f"""
WITH d AS (
  SELECT CAST(unnest(generate_series(DATE '2020-01-01', DATE '2025-12-31',
                                     INTERVAL 1 DAY)) AS DATE) AS FechaCompleta
)
SELECT
  row_number() OVER (ORDER BY FechaCompleta) AS ID_Tiempo,
  strftime(FechaCompleta, '%Y-%m-%d') AS Fecha,
  year(FechaCompleta) AS Anio,
  quarter(FechaCompleta) AS Trimestre,
  month(FechaCompleta) AS Mes,
  day(FechaCompleta) AS Dia,
  {_case_sql('month(FechaCompleta)', MESES_ES)} AS NombreMes,
  {_case_sql('isodow(FechaCompleta)', DIAS_ES)} AS NombreDiaSemana
FROM d
"""


@register("calendar_dim", _CAL_ORACLE)
def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-range generator -> calendar dim with surrogate key + Spanish names.

    `sequence()+explode` is a narrow generator (no shuffle); the surrogate key
    is a row_number over the date — fine at calendar cardinality.
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("2020-01-01")),
                F.to_date(F.lit("2025-12-31")),
                F.expr("interval 1 day"),
            )
        ).alias("FechaCompleta")
    )
    parts = date_parts(F.col("FechaCompleta"))
    dim = days.select(
        F.date_format("FechaCompleta", "yyyy-MM-dd").alias("Fecha"),
        F.col("FechaCompleta"),
        *[c.alias(n) for n, c in parts.items()],
        nombre_mes_es(F.col("FechaCompleta")).alias("NombreMes"),
        nombre_dia_es(F.col("FechaCompleta")).alias("NombreDiaSemana"),
    )
    dim = add_surrogate_key(dim, "ID_Tiempo", [F.col("FechaCompleta")])
    return dim.select(
        "ID_Tiempo",
        "Fecha",
        "Anio",
        "Trimestre",
        "Mes",
        "Dia",
        "NombreMes",
        "NombreDiaSemana",
    )


# ---------------------------------------------------------------------------
# P1–P3: projection, rename, reorder (reference :146-194)
# ---------------------------------------------------------------------------


@register(
    "projection_rename",
    """
    SELECT p_partkey AS CodigoParte, p_brand AS Marca, p_type AS Tipo,
           p_retailprice AS Precio
    FROM part
    """,
)
def projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned select + rename + reorder. The projection reaches the
    parquet scan (ReadSchema lists only 4 of 6 columns)."""
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("CodigoParte"),
        F.col("p_brand").alias("Marca"),
        F.col("p_type").alias("Tipo"),
        F.col("p_retailprice").alias("Precio"),
    )


# ---------------------------------------------------------------------------
# P4–P5 + E7: null-parse filter (reference :456, :343)
# ---------------------------------------------------------------------------


@register(
    "filter_valid_dates",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS fecha
    FROM orders
    WHERE o_orderdate IS NOT NULL
      AND year(o_orderdate) >= 1997
    """,
)
def filter_valid_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropna(subset=[date]) + a pushable range predicate (shows up in the
    scan's PushedFilters)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate").isNotNull())
        .filter(F.year("o_orderdate") >= 1997)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("fecha"))
    )


# ---------------------------------------------------------------------------
# E1–E3: date parts + Spanish names on real data (reference :72-95)
# ---------------------------------------------------------------------------

_DATE_PARTS_ORACLE = f"""
SELECT o_orderkey,
       year(o_orderdate) AS Anio,
       quarter(o_orderdate) AS Trimestre,
       month(o_orderdate) AS Mes,
       day(o_orderdate) AS Dia,
       {_case_sql('month(o_orderdate)', MESES_ES)} AS NombreMes,
       {_case_sql('isodow(o_orderdate)', DIAS_ES)} AS NombreDiaSemana
FROM orders
"""


@register("date_parts_spanish", _DATE_PARTS_ORACLE)
def date_parts_spanish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1-E3: date decomposition with locale-free Spanish month/weekday
    names (explicit 12+7-entry maps, reference dag :81-92), never the
    JVM locale — pure codegen expressions over the orders scan."""
    orders = load_table(spark, sf_dir, "orders")
    parts = date_parts(F.col("o_orderdate"))
    return orders.select(
        "o_orderkey",
        *[c.alias(n) for n, c in parts.items()],
        nombre_mes_es(F.col("o_orderdate")).alias("NombreMes"),
        nombre_dia_es(F.col("o_orderdate")).alias("NombreDiaSemana"),
    )


# ---------------------------------------------------------------------------
# E4–E5: upper/trim standardization + null fill (reference :164-170, :567-571)
# ---------------------------------------------------------------------------


@register(
    "clean_standardize",
    """
    SELECT c_custkey,
           upper(trim(c_name)) AS NombreLimpio,
           coalesce(c_mktsegment, 'N/A') AS Segmento,
           round(coalesce(c_acctbal, 0.0), 4) AS Saldo
    FROM customer
    """,
)
def clean_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4-E5: upper+trim text standardization and constant null-fill
    (reference :164-166, :248-250) — one narrow projection, no shuffle."""
    from sri_spark.functions.cleaning import clean_text

    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        clean_text(F.col("c_name")).alias("NombreLimpio"),
        F.coalesce(F.col("c_mktsegment"), F.lit("N/A")).alias("Segmento"),
        F.round(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), 4).alias("Saldo"),
    )


# ---------------------------------------------------------------------------
# E6–E8: error-coercing casts (reference :454, :547, :520)
# ---------------------------------------------------------------------------


@register(
    "cast_coerce",
    """
    SELECT e.event_id,
           coalesce(TRY_CAST(json_extract_string(e.props, '$.k') AS DOUBLE), 0.0) AS PropK,
           TRY_CAST(e.event_type AS DOUBLE) AS TipoComoNumero,
           CAST(e.user_id AS VARCHAR) AS UsuarioTexto
    FROM events e
    """,
)
def cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_numeric(errors='coerce').fillna(0) + stringify (E6/E8): the JSON
    path parses, the event_type cast coerces to null on every row."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        coerce_double(F.get_json_object("props", "$.k"), 0.0).alias("PropK"),
        F.col("event_type").try_cast("double").alias("TipoComoNumero"),
        F.col("user_id").cast("string").alias("UsuarioTexto"),
    )


@register(
    "parse_dates_coerce",
    """
    SELECT o_orderkey,
           strftime(try_strptime(strftime(o_orderdate, '%-m/%-d/%Y'), '%m/%d/%Y'), '%Y-%m-%d')
             AS FechaParseada,
           strftime(try_strptime(o_orderpriority, '%m/%d/%Y'), '%Y-%m-%d') AS FechaInvalida
    FROM orders
    """,
)
def parse_dates_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/d/yyyy string parse with coerce-to-null (Q2 semantics, reference
    :454): round-trips the order date through the reference's US format and
    coerces an unparseable column to null."""
    orders = load_table(spark, sf_dir, "orders")
    as_str = F.date_format("o_orderdate", "M/d/yyyy")
    return orders.select(
        "o_orderkey",
        F.date_format(coerce_date(as_str, "M/d/yyyy"), "yyyy-MM-dd").alias("FechaParseada"),
        F.date_format(coerce_date(F.col("o_orderpriority"), "M/d/yyyy"), "yyyy-MM-dd").alias(
            "FechaInvalida"
        ),
    )


# ---------------------------------------------------------------------------
# D1–D2 + K1: distinct + surrogate keys (dim building, reference :158, :161)
# ---------------------------------------------------------------------------


@register(
    "dim_build_distinct",
    """
    SELECT row_number() OVER (ORDER BY p_brand, p_type) AS ID_Dim,
           p_brand AS Marca, p_type AS Tipo
    FROM (SELECT DISTINCT p_brand, p_type FROM part)
    """,
)
def dim_build_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct + ordered surrogate key — the dim_vehiculo
    pattern (distinct is a partial-agg shuffle; the row_number global sort is
    acceptable only because dims are small — see operators.keys for the
    scalable variant)."""
    part = load_table(spark, sf_dir, "part")
    dim = part.select(
        F.col("p_brand").alias("Marca"), F.col("p_type").alias("Tipo")
    ).dropDuplicates()
    dim = add_surrogate_key(dim, "ID_Dim", [F.col("Marca"), F.col("Tipo")])
    return dim.select("ID_Dim", "Marca", "Tipo")


@register(
    "distinct_single_notnull",
    """
    SELECT DISTINCT c_mktsegment AS Segmento
    FROM customer
    WHERE c_mktsegment IS NOT NULL
    """,
)
def distinct_single_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropna().unique() on one column (reference :343)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_mktsegment").isNotNull())
        .select(F.col("c_mktsegment").alias("Segmento"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# J1/J2: single-key left joins (reference :469-489)
# ---------------------------------------------------------------------------


@register(
    "join_left_single",
    """
    SELECT o.o_orderkey, o.o_totalprice,
           c.c_name AS Cliente, n.n_name AS Nacion
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def join_left_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact->dim left lookup joins.

    Broadcast policy (scale-aware): ``nation`` is a fixed-cardinality dim
    (25 rows at any SF) so it carries an explicit broadcast hint. ``customer``
    grows linearly with SF — forcing a broadcast would become a driver/executor
    OOM hazard at 100x — so its strategy is left to AQE, which picks a
    broadcast join at runtime when the side is genuinely under the threshold
    and a shuffle join otherwise."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("c_name").alias("Cliente"),
            F.col("n_name").alias("Nacion"),
        )
    )


@register(
    "join_left_composite",
    """
    WITH dim AS (
      SELECT row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS ID_Estado,
             l_returnflag, l_linestatus
      FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    )
    SELECT l.l_orderkey, l.l_linenumber, d.ID_Estado
    FROM lineitem l
    LEFT JOIN dim d
      ON l.l_returnflag = d.l_returnflag AND l.l_linestatus = d.l_linestatus
    """,
)
def join_left_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key left join against a derived dim (the dim_transaccion
    pattern, reference :494-508 — here the dim is distinct over its full join
    key, i.e. 'fixed' semantics with no m:m fan-out)."""
    li = load_table(spark, sf_dir, "lineitem")
    dim = li.select("l_returnflag", "l_linestatus").dropDuplicates()
    dim = add_surrogate_key(
        dim, "ID_Estado", [F.col("l_returnflag"), F.col("l_linestatus")]
    )
    return li.join(
        F.broadcast(dim), on=["l_returnflag", "l_linestatus"], how="left"
    ).select("l_orderkey", "l_linenumber", "ID_Estado")


# ---------------------------------------------------------------------------
# J5: star referential-integrity probe (reference :735-748)
# ---------------------------------------------------------------------------


@register(
    "star_integrity_count",
    """
    SELECT count(*) AS registros_integros
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def star_integrity_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way inner star join, count(*) — the data-quality RI probe.

    Fixed-size dims (nation 25 rows, region 5 rows) are hint-broadcast;
    ``customer`` grows with SF so AQE decides its join strategy at runtime —
    a hard-coded BroadcastExchange on an unbounded-cardinality input is the
    100 TB OOM pattern this engine avoids. The only guaranteed wide ops are
    the lineitem⋈orders shuffle and the final count."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.agg(F.count("*").alias("registros_integros"))


# ---------------------------------------------------------------------------
# A1–A6: aggregate family (reference :660-746)
# ---------------------------------------------------------------------------


@register(
    "agg_overview",
    """
    SELECT count(*) AS total_registros,
           count(DISTINCT o_custkey) AS clientes_distintos,
           count(DISTINCT o_orderpriority) AS prioridades_distintas,
           strftime(min(o_orderdate), '%Y-%m-%d') AS fecha_min,
           strftime(max(o_orderdate), '%Y-%m-%d') AS fecha_max,
           round(sum(o_totalprice), 2) AS monto_total,
           round(avg(o_totalprice), 4) AS monto_promedio
    FROM orders
    """,
)
def agg_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar data-quality aggregates: COUNT/COUNT DISTINCT/MIN/MAX/SUM/AVG.
    countDistinct is exact (the reference's is); approx_count_distinct is the
    documented 100 TB alternative."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("total_registros"),
        F.countDistinct("o_custkey").alias("clientes_distintos"),
        F.countDistinct("o_orderpriority").alias("prioridades_distintas"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("fecha_min"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("fecha_max"),
        F.round(F.sum("o_totalprice"), 2).alias("monto_total"),
        F.round(F.avg("o_totalprice"), 4).alias("monto_promedio"),
    )


@register(
    "agg_conditional_nulls",
    """
    SELECT count(CASE WHEN c_acctbal IS NULL THEN 1 END) AS saldos_nulos,
           count(CASE WHEN c_mktsegment IS NULL THEN 1 END) AS segmentos_nulos,
           count(CASE WHEN c_acctbal < 0 THEN 1 END) AS saldos_negativos
    FROM customer
    """,
)
def agg_conditional_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(CASE WHEN …) null/range probes (reference :715-723)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.agg(
        F.count(F.when(F.col("c_acctbal").isNull(), 1)).alias("saldos_nulos"),
        F.count(F.when(F.col("c_mktsegment").isNull(), 1)).alias("segmentos_nulos"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("saldos_negativos"),
    )


# ---------------------------------------------------------------------------
# A7–A8 + J6–J7 + O1–O2: grouped metrics with top-k (reference :772-816)
# ---------------------------------------------------------------------------


@register(
    "metrics_by_year",
    """
    SELECT year(o_orderdate) AS Anio,
           count(*) AS total_registros,
           round(sum(o_totalprice), 2) AS monto_total,
           round(avg(o_totalprice), 4) AS monto_promedio
    FROM orders
    GROUP BY year(o_orderdate)
    ORDER BY total_registros DESC, Anio
    LIMIT 5
    """,
)
def metrics_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4/A4-A7: per-year registration counts + revenue rollup (the
    reference's metricas por anio, :772-783) — partial+final hash
    aggregate on a year-bounded key space."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("long").alias("Anio"))
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.sum("o_totalprice"), 2).alias("monto_total"),
            F.round(F.avg("o_totalprice"), 4).alias("monto_promedio"),
        )
        .orderBy(F.desc("total_registros"), F.asc("Anio"))
        .limit(5)
    )


@register(
    "metrics_by_brand",
    """
    SELECT p.p_brand AS Marca,
           count(*) AS total_registros,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS monto_total
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY total_registros DESC, Marca
    LIMIT 10
    """,
)
def metrics_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ one dim, grouped count + revenue, top-10 (the 'por marca'
    metric). ``part`` grows with SF, so its join strategy is AQE-decided
    (broadcast when small enough, shuffle otherwise) instead of hint-forced;
    TakeOrderedAndProject does the top-k without a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("Marca"))
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "monto_total"
            ),
        )
        .orderBy(F.desc("total_registros"), F.asc("Marca"))
        .limit(10)
    )


@register(
    "metrics_by_region",
    """
    SELECT n.n_name AS Nacion, r.r_name AS Region,
           count(*) AS total_clientes,
           round(sum(c.c_acctbal), 2) AS saldo_total
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY total_clientes DESC, Nacion, Region
    LIMIT 10
    """,
)
def metrics_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key grouped rollup over a geography hierarchy (the 'por
    provincia' metric, reference :803-814). Both broadcast hints here are on
    fixed-cardinality dims (nation 25 rows, region 5 rows at any SF) —
    safe forever, unlike SF-growing customer/part which are AQE-decided."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("Nacion"), F.col("r_name").alias("Region"))
        .agg(
            F.count("*").alias("total_clientes"),
            F.round(F.sum("c_acctbal"), 2).alias("saldo_total"),
        )
        .orderBy(F.desc("total_clientes"), F.asc("Nacion"), F.asc("Region"))
        .limit(10)
    )


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT k compiles to TakeOrderedAndProject (true top-k:
    per-partition heaps, no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Flagship: notebook cell-15 star rollup analogue (J7+A5+A7+O2)
# ---------------------------------------------------------------------------

FLAGSHIP_ORACLE = """
SELECT year(o.o_orderdate) AS Anio,
       n.n_name AS Nacion,
       c.c_mktsegment AS Segmento,
       count(*) AS total_registros,
       round(avg(l.l_extendedprice * (1 - l.l_discount)), 4) AS precio_promedio,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS monto_total
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY year(o.o_orderdate), n.n_name, c.c_mktsegment
ORDER BY total_registros DESC, Anio, Nacion, Segmento
LIMIT 10
"""


@register("flagship_star_rollup", FLAGSHIP_ORACLE)
def flagship_star_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query (SURVEY §7.2): star rollup by (year, nation,
    segment) with count + avg/sum revenue, top-10 by count.

    Physical shape at scale: lineitem⋈orders is the only guaranteed big join
    (both sides shuffle on orderkey, or co-located if the lake buckets both by
    orderkey); fixed-size ``nation`` is hint-broadcast, SF-growing ``customer``
    is AQE-decided (broadcast only when genuinely small); aggregation is
    partial (map-side) then final on the 3 group keys; top-10 via
    TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("Anio"),
            F.col("n_name").alias("Nacion"),
            F.col("c_mktsegment").alias("Segmento"),
        )
        .agg(
            F.count("*").alias("total_registros"),
            F.round(F.avg(revenue), 4).alias("precio_promedio"),
            F.round(F.sum(revenue), 2).alias("monto_total"),
        )
        .orderBy(
            F.desc("total_registros"), F.asc("Anio"), F.asc("Nacion"), F.asc("Segmento")
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (not in the reference — §2.9 notes Spark natively covers
# them; included so the engine's surface is complete)
# ---------------------------------------------------------------------------


@register(
    "set_ops_union_except",
    """
    SELECT n_name AS nombre FROM nation
    UNION
    SELECT r_name AS nombre FROM region
    EXCEPT
    SELECT c_mktsegment AS nombre FROM customer
    """,
)
def set_ops_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator surface (UNION distinct + EXCEPT): absent in the
    reference, required for engine completeness — distinct unions on
    dimension-sized frames."""
    nation = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("nombre"))
    region = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("nombre"))
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("nombre")
    )
    return nation.union(region).distinct().exceptAll(seg.distinct())


@register(
    "metrics_yoy_growth",
    """
    WITH yearly AS (
      SELECT year(o_orderdate) AS Anio,
             count(*) AS total_registros,
             sum(o_totalprice) AS monto
      FROM orders GROUP BY 1
    )
    SELECT Anio, total_registros,
           round(monto, 2) AS monto_total,
           round(100.0 * (monto - lag(monto) OVER (ORDER BY Anio))
                 / lag(monto) OVER (ORDER BY Anio), 4) AS crecimiento_pct,
           (total_registros - lag(total_registros) OVER (ORDER BY Anio))
             AS delta_registros
    FROM yearly
    """,
)
def metrics_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth of the yearly rollup (the period-over-period
    completion of the reference's 'por anio' metric,
    dags/sri_vehiculos_etl_dag.py:772-783). The lag window runs over the
    YEARS-sized aggregate (single partition of ~7 rows — metadata-sized by
    construction, like the vocabulary rank), never over the fact."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("Anio")
    ).agg(
        F.count("*").alias("total_registros"),
        F.sum("o_totalprice").alias("monto"),
    )
    w = Window.orderBy("Anio")
    prev_m, prev_n = F.lag("monto").over(w), F.lag("total_registros").over(w)
    return yearly.select(
        "Anio",
        "total_registros",
        F.round("monto", 2).alias("monto_total"),
        F.round(100.0 * (F.col("monto") - prev_m) / prev_m, 4).alias(
            "crecimiento_pct"
        ),
        (F.col("total_registros") - prev_n).alias("delta_registros"),
    )
