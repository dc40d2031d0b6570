"""operators/median.py::exact_median_1row vs numpy — the distributed
exact median must reproduce quantile_cont(0.5) (linear interpolation =
average of the two central order statistics) on every shape that has
bitten a median implementation somewhere: even/odd counts, heavy ties,
constant columns, single values, NULLs, and empty input."""

from __future__ import annotations

import numpy as np
import pytest

from sri_spark.operators.median import exact_median_1row


def _med(spark, values, buckets=1024):
    df = spark.createDataFrame([(float(v),) if v is not None else (None,)
                                for v in values] or [(None,)], "v double")
    if not values:
        df = df.limit(0)
    return exact_median_1row(df, "v", "med", buckets=buckets).first()["med"]


def test_median_matches_numpy_on_random_data(spark):
    rng = np.random.default_rng(20250816)
    for n in (1, 2, 7, 100, 101, 1000):
        vals = rng.normal(scale=100, size=n).round(3).tolist()
        assert _med(spark, vals) == pytest.approx(float(np.median(vals)), abs=1e-12)


def test_median_even_count_interpolates_central_pair(spark):
    assert _med(spark, [1.0, 2.0, 10.0, 100.0]) == 6.0


def test_median_heavy_ties(spark):
    # 999 copies of 5.0 plus one 0.0 and one 10.0: ties dominate one bucket
    vals = [5.0] * 999 + [0.0, 10.0]
    assert _med(spark, vals) == 5.0
    # even count with the central pair split across a tie run
    vals = [1.0, 2.0, 2.0, 3.0]
    assert _med(spark, vals) == 2.0


def test_median_constant_column_short_circuits(spark):
    assert _med(spark, [7.5] * 500) == 7.5
    assert _med(spark, [7.5]) == 7.5


def test_median_ignores_nulls_and_handles_empty(spark):
    assert _med(spark, [None, 1.0, None, 3.0]) == 2.0
    assert _med(spark, [None, None]) is None
    assert _med(spark, []) is None


def test_median_tiny_bucket_count_still_exact(spark):
    # buckets=2 forces multi-row buckets and the cross-bucket position
    # bookkeeping; the result must not depend on the bucket count
    rng = np.random.default_rng(7)
    vals = rng.uniform(-5, 5, size=200).round(4).tolist()
    assert _med(spark, vals, buckets=2) == pytest.approx(
        float(np.median(vals)), abs=1e-12
    )
    assert _med(spark, vals, buckets=3) == pytest.approx(
        float(np.median(vals)), abs=1e-12
    )
