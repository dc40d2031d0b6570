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
           list_transform(list_slice(embedding, 1, 4),
                          x -> round(x::DOUBLE, 6)) AS head4,
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
    per row)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    as_d = F.transform(vec, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.transform(F.slice(vec, 1, 4), lambda x: F.round(x.cast("double"), 6)).alias(
            "head4"
        ),
        F.size(F.filter(vec, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(as_d, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 6
        ).alias("l1_norm"),
        F.round(F.array_max(as_d), 6).alias("max_v"),
        F.round(F.array_min(as_d), 6).alias("min_v"),
        F.exists(vec, lambda x: x < -0.5).alias("has_large_neg"),
    )
