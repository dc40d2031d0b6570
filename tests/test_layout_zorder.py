"""Z-order write layout (operators/layout.py): written files carry tight
per-file min/max ranges on BOTH layout dimensions, so a rectangle
predicate touches few files; the plan uses a range exchange, never a
single-partition sort."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from sri_spark.operators.layout import morton_interleave, zorder_layout
from sri_spark.sources.testdata import load_table

N_FILES = 16
SIDE = 32  # 5-bit buckets per dimension


def _write(spark, sf_dir, tmp_path, layout: str) -> str:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        F.pmod(F.col("user_id"), F.lit(SIDE)).alias("x"),
        F.pmod(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")),
            F.lit(SIDE),
        ).alias("y"),
    )
    out = str(tmp_path / layout)
    if layout == "zorder":
        zorder_layout(ev, "x", "y", n_files=N_FILES, bits=5).write.parquet(out)
    else:
        ev.repartitionByRange(N_FILES, "ts").sortWithinPartitions("ts").write.parquet(
            out
        )
    return out


def _files_touched(spark, path: str) -> int:
    """Files whose per-file (x, y) min/max ranges intersect the rectangle —
    exactly the min/max-stats skipping decision a reader makes."""
    touched = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        stats = (
            spark.read.parquet(f)
            .agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            )
            .first()
        )
        if stats[0] is None:
            continue
        if stats[0] <= 11 and stats[1] >= 8 and stats[2] <= 17 and stats[3] >= 10:
            touched += 1
    return touched


def test_zorder_files_prune_rectangle(spark, sf_dir, tmp_path):
    z = _files_touched(spark, _write(spark, sf_dir, tmp_path, "zorder"))
    lin = _files_touched(spark, _write(spark, sf_dir, tmp_path, "linear"))
    assert 0 < z < lin  # the Z layout must skip files the time layout can't


def test_zorder_layout_plans_range_exchange_not_global_sort(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(SIDE)).alias("x"),
        F.pmod(F.col("event_id"), F.lit(SIDE)).alias("y"),
    )
    plan = (
        zorder_layout(ev, "x", "y", n_files=N_FILES, bits=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan


def test_morton_interleave_matches_reference_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (31, 31)], "x long, y long"
    ).select("x", "y", morton_interleave(F.col("x"), F.col("y"), bits=5).alias("z"))
    got = {(r.x, r.y): r.z for r in df.collect()}

    def ref(x, y):
        return sum(((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1) for i in range(5))

    assert got == {(x, y): ref(x, y) for (x, y) in got}
