"""Range (interval) join — match points to [lo, hi) intervals — via bin
bucketing. Not in the reference (SURVEY §2.6); mandated custom-operator
territory.

A naive ``points JOIN intervals ON p >= lo AND p < hi`` has no equi key, so
Catalyst must pick BroadcastNestedLoopJoin — fine when the interval side
broadcasts, quadratic disaster otherwise. The scale path used here is the
standard binning rewrite (cf. Databricks range-join optimization): pick a
bin width, explode each interval into every bin it overlaps, map each point
to its single bin, equi-join on the bin id, then re-apply the exact range
predicate to discard false candidates from partial bin overlap. Cost is
O(|points| + |intervals| * spans) through a hash shuffle — linear, skew-safe
under AQE, and the bin width trades duplication against candidate density.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def _bin_of(col: Column, width: float) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to every ``intervals`` row whose
    ``[lo_col, hi_col)`` contains ``point_col``. Intervals may overlap
    (m:n fan-out is the caller's semantic choice). ``how`` is 'inner' or
    'left' (left keeps unmatched points with null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    binned_intervals = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                _bin_of(F.col(lo_col), bin_width),
                # hi is exclusive: the last covered bin is bin(hi - ulp),
                # conservatively bin(hi) (the residual predicate prunes)
                _bin_of(F.col(hi_col), bin_width),
            )
        ),
    )
    binned_points = points.withColumn(_BIN, _bin_of(F.col(point_col), bin_width))
    cond = (
        (binned_points[_BIN] == binned_intervals[_BIN])
        & (binned_points[point_col] >= binned_intervals[lo_col])
        & (binned_points[point_col] < binned_intervals[hi_col])
    )
    joined = binned_points.join(binned_intervals, cond, how).drop(_BIN)
    return joined
