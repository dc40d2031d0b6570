"""Third extras batch: lakehouse CDC compaction and Matryoshka
embedding-truncation quality (additive mandate surface).

- CDC latest-wins compaction is the merge-on-read pattern every lakehouse
  table maintenance job runs: collapse a change stream to one row per key,
  honoring delete tombstones. One partitioned window, no global sort.
- Matryoshka truncation quality answers the serving question "how much
  ANN accuracy do I keep if I store only the first d dims" (MRL-style
  prefix truncation) with a corpus-wide fidelity report instead of
  anecdotes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sri_spark.plans.registry import register
from sri_spark.sources.testdata import load_table

# --------------------------------------------------------------------------
# CDC latest-wins compaction with delete tombstones
# --------------------------------------------------------------------------

_CDC_ORACLE = """
WITH chg AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op
  FROM events
),
ranked AS (
  SELECT user_id, event_id, ts, value, op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n_versions,
         sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id) AS n_deletes
  FROM chg
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       round(value, 6) AS last_value,
       CAST(n_versions AS BIGINT) AS n_versions,
       CAST(n_deletes AS BIGINT) AS n_deletes
FROM ranked
WHERE rk = 1 AND op = 'U'
"""


@register("warehouse_cdc_compaction", _CDC_ORACLE)
def warehouse_cdc_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins compaction: collapse a change stream (events as the
    changelog; every 10th event_id is a delete tombstone) to at most one
    LIVE row per key — the newest version wins by (ts, event_id), and a
    key whose newest change is a delete disappears entirely. This is the
    merge-on-read table-maintenance kernel behind every lakehouse upsert
    format.

    Shape: ONE window partitioned by the key (per-key frames, never a
    global sort) carrying rank + version/delete counts in the same pass —
    compaction at 100 TB is exactly one shuffle on the key."""
    ev = load_table(spark, sf_dir, "events")
    chg = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_id") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id")
    wo = w.orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = chg.select(
        "user_id",
        "ts",
        "value",
        "op",
        F.row_number().over(wo).alias("rk"),
        F.count("*").over(w).alias("n_versions"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .over(w)
        .alias("n_deletes"),
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("op") == "U")).select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.round("value", 6).alias("last_value"),
        F.col("n_versions").cast("long").alias("n_versions"),
        F.col("n_deletes").cast("long").alias("n_deletes"),
    )


# --------------------------------------------------------------------------
# Matryoshka (prefix-truncation) embedding fidelity
# --------------------------------------------------------------------------

_TRUNC_DIMS = 16


def _cos_sql(a: str, b: str, d: str) -> str:
    dot = (
        f"list_sum(list_transform(generate_series(1, {d}),"
        f" i -> {a}[i] * {b}[i]))"
    )
    na = f"sqrt(list_sum(list_transform(generate_series(1, {d}), i -> {a}[i] * {a}[i])))"
    nb = f"sqrt(list_sum(list_transform(generate_series(1, {d}), i -> {b}[i] * {b}[i])))"
    return f"({dot}) / (({na}) * ({nb}))"


_MATRYOSHKA_ORACLE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_cos_sql('a.v', 'b.v', 'len(a.v)')} AS cos_full,
         {_cos_sql('a.v', 'b.v', str(_TRUNC_DIMS))} AS cos_trunc
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
)
SELECT count(*)::BIGINT AS n_pairs,
       {_TRUNC_DIMS} AS trunc_dims,
       round(corr(cos_full, cos_trunc), 6) AS cosine_corr,
       round(avg(abs(cos_full - cos_trunc)), 6) AS mean_abs_err,
       round(max(abs(cos_full - cos_trunc)), 6) AS max_abs_err
FROM pairs
"""


@register("embeddings_matryoshka_fidelity", _MATRYOSHKA_ORACLE)
def embeddings_matryoshka_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka truncation fidelity: over a deterministic pair panel
    (each vector with its id-successor), compare full-dimension cosine
    against the first-16-dims cosine — correlation, mean and worst
    absolute error. The go/no-go report for serving prefix-truncated
    embeddings (store d dims, re-rank the shortlist at full width): high
    corr + small error means the cheap index is safe.

    Shape: the pair panel is a shifted-key equi-join (id = id+1), one row
    per vector — NOT an all-pairs surface; both cosines are per-row array
    expressions (zip_with/aggregate, no explode), so the whole audit is
    one narrow pass. corr is computed ANSI-safe via try_divide over
    covar/stddev (zero-variance panels report NULL, as DuckDB does).
    Truncation width: _TRUNC_DIMS (16)."""
    from sri_spark.similarity.cosine import _as_double, _dot, _norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = emb.select((F.col("vec_id") - 1).alias("id_a"), F.col("v").alias("vb"))
    pairs = a.join(b, "id_a")

    def cos(x, y):
        return _dot(x, y) / (_norm(x) * _norm(y))

    ta = F.slice(F.col("va"), 1, _TRUNC_DIMS)
    tb = F.slice(F.col("vb"), 1, _TRUNC_DIMS)
    scored = pairs.select(
        cos(F.col("va"), F.col("vb")).alias("cos_full"),
        cos(ta, tb).alias("cos_trunc"),
    )
    corr_safe = F.try_divide(
        F.covar_samp("cos_full", "cos_trunc"),
        F.stddev_samp("cos_full") * F.stddev_samp("cos_trunc"),
    )
    err = F.abs(F.col("cos_full") - F.col("cos_trunc"))
    return scored.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.lit(_TRUNC_DIMS).cast("int").alias("trunc_dims"),
        F.round(corr_safe, 6).alias("cosine_corr"),
        F.round(F.avg(err), 6).alias("mean_abs_err"),
        F.round(F.max(err), 6).alias("max_abs_err"),
    )
