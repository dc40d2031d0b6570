"""MERGE INTO semantics as a pure DataFrame transform.

The reference replaces whole tables per run (WRITE_TRUNCATE,
dags/sri_vehiculos_etl_dag.py) — at 100 TB you merge a daily batch instead
of rewriting the table. Without a transactional table format this is the
standard rewrite: one full outer join on the key resolves every MERGE
branch (matched-update, not-matched-insert, matched-delete) column by
column.

Scale shape: a single shuffle on the merge key (both sides), no collect,
no window. The source side of a daily merge is typically small relative to
the target — AQE broadcasts it when it is; a forced hint would OOM on
backfills where the "batch" is months of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    *,
    key: str | list[str],
    update_cols: list[str] | None = None,
    insert_not_matched: bool = True,
    delete_condition: Column | None = None,
    update_condition: Column | None = None,
    on_null_source_key: str = "error",
) -> DataFrame:
    """Return target MERGE source ON key.

    - matched rows: `update_cols` (default: every non-key source column)
      take the source value; other target columns are kept. With
      `update_condition` (WHEN MATCHED AND <cond>), matched rows failing
      the condition keep their target values — the latest-wins guard an
      out-of-order incremental load needs;
    - unmatched source rows: inserted when `insert_not_matched` (columns
      missing from source land as NULL);
    - matched rows satisfying `delete_condition` (evaluated over the joined
      row, source columns referenceable via the source DataFrame) are
      dropped.

    Both inputs must carry the key columns; source must not contain
    duplicate keys (a 1:n merge is ill-defined — pre-aggregate the batch).

    A source row with a NULL (or partially-NULL composite) merge key can
    neither match nor insert cleanly; `on_null_source_key` picks the policy:
    'error' (default) fails the job with a clear message the moment such a
    row is scanned, 'filter' silently drops them (for feeds where null keys
    are expected noise)."""
    keys = [key] if isinstance(key, str) else list(key)
    upd = update_cols or [c for c in source.columns if c not in keys]
    missing = [c for c in upd if c not in target.columns]
    if missing:
        raise ValueError(f"update_cols not in target: {missing}")
    if on_null_source_key not in ("error", "filter"):
        raise ValueError(
            f"on_null_source_key must be 'error' or 'filter', got {on_null_source_key!r}"
        )

    if on_null_source_key == "filter":
        for k in keys:
            source = source.filter(F.col(k).isNotNull())
    else:
        # plant a row-level guard on each key column: evaluated on the source
        # scan, zero cost unless a null key actually appears
        for k in keys:
            source = source.withColumn(
                k,
                F.when(
                    F.col(k).isNull(),
                    F.raise_error(
                        F.lit(
                            f"merge_upsert: NULL source merge key {k!r} "
                            "(set on_null_source_key='filter' to drop such rows)"
                        )
                    ),
                ).otherwise(F.col(k)),
            )

    # alias-qualified STRING refs (`t.c` / `s.c`), never expr-id refs
    # (target[c]): when target and source share lineage — e.g. re-merging
    # the same batch after a retry, where target IS the output of the
    # previous merge — expr-id refs are ambiguous and Spark rejects the
    # self-join. String refs resolve by alias, which is always unambiguous.
    t = target.alias("t")
    s = source.alias("s")
    tc = lambda c: F.col(f"t.`{c}`")
    sc = lambda c: F.col(f"s.`{c}`")
    cond = F.lit(True)
    for k in keys:
        cond = cond & tc(k).eqNullSafe(sc(k))
    joined = t.join(s, cond, "full_outer")

    matched_keys = F.lit(True)
    for k in keys:
        matched_keys = matched_keys & tc(k).isNotNull() & sc(k).isNotNull()
    # the update branch may be narrowed (WHEN MATCHED AND cond); the delete
    # branch always sees every key-matched row, mirroring SQL MERGE where
    # each WHEN MATCHED clause carries its own condition
    matched = (
        matched_keys & update_condition
        if update_condition is not None
        else matched_keys
    )
    # mirror matched_keys over EVERY key column: a surviving source row has
    # all keys non-null (guard above), and it is an insert iff no target row
    # matched, i.e. every target-side key is null in the outer join
    src_only = F.lit(True)
    for k in keys:
        src_only = src_only & sc(k).isNotNull() & tc(k).isNull()

    if delete_condition is not None:
        joined = joined.filter(~(matched_keys & delete_condition))

    out_cols: list[Column] = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.coalesce(tc(c), sc(c)).alias(c))
        elif c in upd and c in source.columns:
            # matched -> source value; source-only insert -> source value;
            # target-only -> target value
            out_cols.append(
                F.when(matched | src_only, sc(c)).otherwise(tc(c)).alias(c)
            )
        else:
            out_cols.append(tc(c).alias(c))
    if not insert_not_matched:
        joined = joined.filter(~src_only)
    return joined.select(*out_cols)
