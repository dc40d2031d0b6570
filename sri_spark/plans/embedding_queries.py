"""Embedding-column hygiene queries: normalization stats and int8
quantization fidelity. Per-row array expressions only — these fuse into
the parquet scan (no exchange in the plan), which is exactly what you want
in front of a 100 TB ANN index build."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.similarity.quantize import (
    INT8_MAX,
    dequantize_error_mae,
    l2_norm,
    l2_normalize,
    max_abs,
)
from sri_spark.sources.testdata import load_table

_SUM_SQ = "list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))"
_MAX_ABS = "list_max(list_transform({a}, x -> abs(x::DOUBLE)))"


@register(
    "embeddings_normalize_stats",
    f"""
    SELECT vec_id,
           len(embedding) AS dim,
           round(sqrt({_SUM_SQ.format(a='embedding')}), 6) AS l2_norm,
           round(CASE WHEN {_SUM_SQ.format(a='embedding')} > 0 THEN 1.0 ELSE 0.0 END,
                 6) AS norm_after,
           round({_MAX_ABS.format(a='embedding')}, 6) AS max_abs
    FROM embeddings
    """,
)
def embeddings_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization audit: per-vector norm before, norm after
    re-normalizing (1.0 unless the vector is all-zero), and max |x| —
    the pre-flight stats an embedding pipeline records before indexing."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(vec).alias("dim"),
        F.round(l2_norm(vec), 6).alias("l2_norm"),
        F.round(l2_norm(l2_normalize(vec)), 6).alias("norm_after"),
        F.round(max_abs(vec), 6).alias("max_abs"),
    )


@register(
    "embeddings_quantize_int8",
    f"""
    WITH q AS (
      SELECT vec_id, embedding,
             {_MAX_ABS.format(a='embedding')} / {INT8_MAX} AS scale
      FROM embeddings
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(list_max(list_transform(embedding,
                x -> abs(round(x::DOUBLE / scale)))) AS BIGINT) AS max_code,
           round(list_sum(list_transform(embedding,
                x -> abs(x::DOUBLE - round(x::DOUBLE / scale) * scale)))
                / len(embedding), 6) AS mae,
           (list_sum(list_transform(embedding,
                x -> abs(x::DOUBLE - round(x::DOUBLE / scale) * scale)))
                / len(embedding) <= scale / 2) AS mae_within_bound
    FROM q WHERE scale > 0
    """,
)
def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization fidelity: per-vector scale, the largest
    |code| (must stay within int8), reconstruction MAE, and the
    theoretical-bound check (MAE ≤ scale/2). Quantization halves-to-a-byte
    is the standard embedding-storage reduction before ANN serving; the
    oracle recomputes the codes and error in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    scale = max_abs(vec) / F.lit(float(INT8_MAX))
    from sri_spark.similarity.quantize import quantize_int8

    codes = quantize_int8(vec)
    mae = dequantize_error_mae(vec)
    return (
        emb.filter(scale > 0)
        .select(
            "vec_id",
            F.round(scale, 6).alias("scale"),
            F.array_max(F.transform(codes, lambda q: F.abs(q)))
            .cast("long")
            .alias("max_code"),
            F.round(mae, 6).alias("mae"),
            (mae <= scale / 2).alias("mae_within_bound"),
        )
    )


@register(
    "embeddings_array_ops",
    """
    SELECT vec_id,
           array_to_string(list_transform(list_slice(embedding, 1, 4),
               x -> CAST(CAST(round(x::DOUBLE * 1000000) AS BIGINT) AS VARCHAR)),
               ',') AS head4,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(list_transform(embedding, x -> abs(x::DOUBLE))), 6)
               AS l1_norm,
           round(list_max(list_transform(embedding, x -> x::DOUBLE)), 6)
               AS max_v,
           round(list_min(list_transform(embedding, x -> x::DOUBLE)), 6)
               AS min_v,
           (len(list_filter(embedding, x -> x < -0.5)) > 0) AS has_large_neg
    FROM embeddings
    """,
)
def embeddings_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function family (slice / filter / transform /
    aggregate / exists) exercised end to end over the embedding column.
    Everything is a per-row Column expression that fuses into the parquet
    scan — this is the idiom that keeps vector feature-engineering out of
    Python at 100 TB (the UDF-shaped alternative pays a serialization tax
    per row).

    head4 is serialized to a comma-joined string of micro-scaled integers
    (round(x*1e6) as bigint) rather than emitted as array<double>: the
    driver's pandas-based canonicalizer cannot sort/hash list cells, so
    every catalog query must emit scalar columns only (round-3 verdict
    item 1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    as_d = F.transform(vec, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.concat_ws(
            ",",
            F.transform(
                F.slice(vec, 1, 4),
                lambda x: F.round(x.cast("double") * 1000000).cast("long").cast("string"),
            ),
        ).alias("head4"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(as_d, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 6
        ).alias("l1_norm"),
        F.round(F.array_max(as_d), 6).alias("max_v"),
        F.round(F.array_min(as_d), 6).alias("min_v"),
        F.exists(vec, lambda x: x < -0.5).alias("has_large_neg"),
    )


_CENTROID_CLS_ORACLE = """
WITH exploded AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
centroids AS (
  SELECT label AS c_label, dim, avg(v) AS c FROM exploded GROUP BY 1, 2
),
dists AS (
  SELECT e.vec_id, e.label, c.c_label,
         sum((e.v - c.c) * (e.v - c.c)) AS d2
  FROM exploded e JOIN centroids c USING (dim)
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT vec_id, label, c_label AS pred_label
  FROM (SELECT dists.*, row_number() OVER
          (PARTITION BY vec_id ORDER BY d2, c_label) AS rk FROM dists)
  WHERE rk = 1
)
SELECT label, pred_label, count(*) AS n
FROM pred GROUP BY 1, 2
"""


@register("embeddings_centroid_confusion", _CENTROID_CLS_ORACLE)
def embeddings_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification eval: per-label mean vectors, assign
    every embedding to its closest centroid (squared L2, label tie-break),
    emit the confusion matrix — the cheapest embedding-space quality probe
    (high diagonal mass = labels are linearly separated in the space).

    Shape: one posexplode + (label, dim) aggregate builds the centroids;
    the distance computation joins on `dim` — vectors × |labels| partial
    products flowing through a hash aggregate, never a per-row UDF loop —
    and argmin is one more aggregate with a deterministic tie-break."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    centroids = exploded.groupBy(
        F.col("label").alias("c_label"), "dim"
    ).agg(F.avg("v").alias("c"))
    dists = (
        exploded.join(centroids, "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("d2"))
    )
    pred = dists.groupBy("vec_id", "label").agg(
        F.min_by("c_label", F.struct(F.col("d2"), F.col("c_label"))).alias(
            "pred_label"
        )
    )
    return pred.groupBy("label", "pred_label").agg(F.count("*").alias("n"))


_DRIFT_ORACLE = """
WITH exploded AS (
  SELECT vec_id % 2 AS half, label, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
cent AS (
  SELECT half, label, dim, avg(v) AS c FROM exploded GROUP BY 1, 2, 3
),
paired AS (
  SELECT a.label, a.dim, a.c AS c0, b.c AS c1
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.dim = b.dim AND a.half = 0 AND b.half = 1
)
SELECT label,
       round(sum(c0 * c1) / (sqrt(sum(c0 * c0)) * sqrt(sum(c1 * c1))), 6)
         AS centroid_cosine,
       round(sqrt(sum((c0 - c1) * (c0 - c1))), 6) AS centroid_l2_shift
FROM paired GROUP BY label
"""


@register("embeddings_drift_check", _DRIFT_ORACLE)
def embeddings_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split the corpus into two deterministic
    halves (vec_id parity standing in for 'yesterday vs today'), compare
    per-label centroids by cosine and L2 shift — the check that catches a
    silently retrained/renormalized encoder before it poisons an ANN
    index. One explode + (half, label, dim) aggregate; the comparison runs
    on centroid-sized data."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        "label",
        F.posexplode("embedding").alias("dim", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    cent = exploded.groupBy("half", "label", "dim").agg(F.avg("v").alias("c"))
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c0")
    )
    b = cent.filter(F.col("half") == 1).select(
        F.col("label").alias("lb"), F.col("dim").alias("db"), F.col("c").alias("c1")
    )
    paired = a.join(b, (a["label"] == b["lb"]) & (a["dim"] == b["db"]))
    return paired.groupBy("label").agg(
        F.round(
            F.sum(F.col("c0") * F.col("c1"))
            / (
                F.sqrt(F.sum(F.col("c0") * F.col("c0")))
                * F.sqrt(F.sum(F.col("c1") * F.col("c1")))
            ),
            6,
        ).alias("centroid_cosine"),
        F.round(
            F.sqrt(F.sum((F.col("c0") - F.col("c1")) * (F.col("c0") - F.col("c1")))),
            6,
        ).alias("centroid_l2_shift"),
    )


def _pca_oracle(iters: int = 4, dims: int = 64) -> str:
    rounds = []
    prev = "v0"
    for k in range(1, iters + 1):
        rounds.append(
            f"""p{k} AS (
  SELECT c.label, c.i, sum(c.cov * w.loading) AS raw
  FROM cov c JOIN {prev} w ON w.label = c.label AND w.i = c.j
  GROUP BY 1, 2
),
n{k} AS (SELECT label, sqrt(sum(raw * raw)) AS nrm FROM p{k} GROUP BY 1),
v{k} AS (SELECT p{k}.label, p{k}.i, raw / nrm AS loading
         FROM p{k} JOIN n{k} USING (label))"""
        )
        prev = f"v{k}"
    joined = ",\n".join(rounds)
    return f"""
WITH flat AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
exy AS (
  SELECT a.label, a.i, b.i AS j, avg(a.x * b.x) AS exy
  FROM flat a JOIN flat b USING (vec_id)
  GROUP BY 1, 2, 3
),
means AS (SELECT label, i, avg(x) AS mu FROM flat GROUP BY 1, 2),
cov AS (
  SELECT e.label, e.i, e.j, e.exy - mi.mu * mj.mu AS cov
  FROM exy e
  JOIN means mi ON mi.label = e.label AND mi.i = e.i
  JOIN means mj ON mj.label = e.label AND mj.i = e.j
),
labels AS (SELECT DISTINCT label FROM cov),
grid AS (SELECT generate_series AS i FROM generate_series(0, {dims - 1})),
v0 AS (SELECT label, grid.i, 1.0 / sqrt({dims}) AS loading
       FROM labels CROSS JOIN grid),
{joined}
SELECT label, CAST(i AS BIGINT) AS dim, round(loading, 6) AS loading
FROM {prev}
"""


@register("embeddings_pca_top_component", _pca_oracle())
def embeddings_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label top principal component via FOUR relational power-iteration
    rounds over the label covariance matrices (similarity/pca.py) — the
    PageRank unrolling trick applied to dense linear algebra, so DuckDB
    value-checks the identical fixed recurrence end to end (covariance,
    matrix-vector products, normalizations).

    The deterministic uniform start vector pins both convergence path and
    sign. Every shuffle key is bounded by labels x dims(²); the vectors
    stream through one explode. `similarity/pca.py::top_component_grouped`
    is the production Arrow grouped-map twin (exact eigh per label, no
    dim² row blowup); pytest asserts the two agree."""
    from sri_spark.operators.caching import scoped_persist
    from sri_spark.similarity.pca import (
        covariance_long,
        top_component_relational,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cov = scoped_persist(covariance_long(emb))
    v = top_component_relational(cov, dims=64)
    return v.select(
        "label",
        F.col("i").cast("long").alias("dim"),
        F.round("loading", 6).alias("loading"),
    )
