"""Embedding quantization/normalization edge cases (zero vectors, bounds)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sri_spark.similarity.quantize import (
    dequantize_error_mae,
    l2_norm,
    l2_normalize,
    quantize_int8,
)


def test_quantize_and_normalize_edges(spark):
    rows = [
        (0, [1.0, -2.0, 3.0]),
        (1, [0.0, 0.0, 0.0]),  # zero vector: norm 0, codes 0, mae 0
        (2, [127.0]),  # single element quantizes exactly
        (3, [-0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    out = df.select(
        "vec_id",
        l2_norm(F.col("v")).alias("norm"),
        l2_norm(l2_normalize(F.col("v"))).alias("norm_after"),
        quantize_int8(F.col("v")).alias("q"),
        dequantize_error_mae(F.col("v")).alias("mae"),
    ).collect()
    by_id = {r["vec_id"]: r for r in out}

    assert math.isclose(by_id[0]["norm"], math.sqrt(14.0), rel_tol=1e-9)
    assert math.isclose(by_id[0]["norm_after"], 1.0, rel_tol=1e-9)
    assert max(abs(q) for q in by_id[0]["q"]) == 127  # max element hits full range

    assert by_id[1]["norm"] == 0.0
    assert by_id[1]["norm_after"] == 0.0  # zero vector stays zero
    assert by_id[1]["q"] == [0, 0, 0]
    assert by_id[1]["mae"] == 0.0

    assert by_id[2]["q"] == [127]
    assert by_id[2]["mae"] == 0.0  # exact reconstruction

    for r in out:
        assert all(-127 <= q <= 127 for q in r["q"])
        scale = max(abs(x) for x in rows[r["vec_id"]][1]) / 127 if any(
            rows[r["vec_id"]][1]
        ) else 0.0
        assert r["mae"] <= scale / 2 + 1e-12
