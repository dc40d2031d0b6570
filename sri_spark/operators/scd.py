"""Slowly-changing-dimension type 2 builder from a change log.

The reference's star schema loads dimensions truncate-and-replace
(dags/sri_vehiculos_etl_dag.py WRITE_TRUNCATE) — history is lost on every
run. SCD2 is the warehouse-grade alternative a user scaling that schema
needs: turn an append-only change log (key, tracked attributes, change
timestamp) into validity intervals with an is-current flag.

Plan shape: one window per key (lag to detect change, running sum to number
the version), one rollup per version interval, one lead for valid_to. All
three windows partition by the business key — per-key sorts distributed
across the cluster, never a global sort; at 100 TB this is three exchanges
on the same key, and Catalyst reuses the partitioning between them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    *,
    key: str,
    attrs: list[str],
    ts_col: str = "ts",
    tie_breaker: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 intervals.

    One output row per (key, consecutive run of identical `attrs` values):
    `valid_from` = first change ts of the run, `valid_to` = next run's
    valid_from (NULL while current), `version` = 1-based per-key ordinal,
    `is_current` on the last run. Rows where every tracked attribute equals
    the previous row's are absorbed into the running version (idempotent
    re-deliveries collapse away).

    `tie_breaker` orders rows within an identical timestamp (pass a unique
    column — required for deterministic results when ts is not unique per
    key)."""
    order_cols: list[Column] = [F.col(ts_col)]
    if tie_breaker is not None:
        order_cols.append(F.col(tie_breaker))
    w = Window.partitionBy(key).orderBy(*order_cols)

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    flagged = df.withColumn(
        "__chg", F.when(F.lag(ts_col).over(w).isNull() | changed, 1).otherwise(0)
    )
    versioned = flagged.withColumn(
        "version",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    intervals = versioned.groupBy(key, "version", *attrs).agg(
        F.min(ts_col).alias("valid_from")
    )
    w_ver = Window.partitionBy(key).orderBy("version")
    return intervals.select(
        key,
        *attrs,
        "version",
        "valid_from",
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.lead("valid_from").over(w_ver).isNull().alias("is_current"),
    )
