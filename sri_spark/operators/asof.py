"""As-of (temporal) join — for each left row, the latest right row with
``right_ts <= left_ts`` per key. Not in the reference (SURVEY §2.6 notes its
absence) and not a built-in Spark join type; mandated as a custom operator.

Spark-first formulation: instead of a non-equi theta join (which Catalyst
can only run as a broadcast-nested-loop) or a per-key ``merge_asof`` UDF,
tag both inputs, UNION them, and run ``last(..., ignorenulls=True)`` over a
window partitioned by key and ordered by (ts, side). That is ONE shuffle on
the join key plus a per-key sort — the same physical shape Flink uses for
temporal joins — so it scales linearly with input and never materializes
candidate pairs. Right rows sort before left rows at equal timestamps, so
the match is inclusive (``right_ts <= left_ts``), exactly DuckDB's
``ASOF JOIN ... ON l.ts >= r.ts``.

Determinism contract: the window order ends with the right-payload struct
itself, a total order — duplicate (keys, right_ts) right rows resolve to
the struct-wise greatest payload, identically across runs, retries and
partitionings (right_cols must be orderable types: no maps). DuckDB's
ASOF JOIN picks an arbitrary row among such ties, so cross-engine
hash-equality additionally requires (keys, right_ts) unique on the right
(true for the events fixture).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from the
    latest ``right`` row of the same key with ``right_ts <= left_ts`` (null
    when no such row exists).

    ``right_cols`` must not collide with ``left`` column names (rename on
    the right side first) and must not include the key columns.
    """
    on = list(on)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")

    left_value_cols = [c for c in left.columns if c not in on and c != left_ts]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left_value_cols]).alias("__asof_left"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias(_PAYLOAD),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(
            left.select(F.struct(*left_value_cols).alias("s")).schema["s"].dataType
        ).alias("__asof_left"),
        F.struct(*right_cols).alias(_PAYLOAD),
    )

    # right rows (side=0) sort before left rows (side=1) at equal ts →
    # inclusive as-of; the rows-unbounded-preceding frame makes last() the
    # running "most recent right payload seen". The payload struct is the
    # final sort key: with duplicate (key, right_ts) right rows the winner is
    # the struct-wise greatest payload — a total order, so the result is
    # identical across retries/partitionings (right_cols must therefore be
    # orderable types: no maps).
    w = (
        Window.partitionBy(*on)
        .orderBy("__asof_ts", _SIDE, _PAYLOAD)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
    )
    return matched.select(
        *on,
        F.col("__asof_ts").alias(left_ts),
        *[F.col(f"__asof_left.{c}").alias(c) for c in left_value_cols],
        *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_cols],
    )
