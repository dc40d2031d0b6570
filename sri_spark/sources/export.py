"""Training-shard export: the handoff from the curation pipeline to a
training job — JSONL (or parquet) shards with a DETERMINISTIC membership
and in-shard order.

Trainers consume shards sequentially, so the export contract matters more
than the format: (a) shard assignment must be a pure function of the row
id — not of partition layout or rand() — so a re-export after a retry
produces byte-identical shards (resumable data jobs); (b) in-shard order
must be a seeded hash order, giving the global shuffle training wants
without a global sort (each shard sorts locally — n_shards independent
sorts, no single-partition bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sri_spark.functions.hashing import md5_int

SHARD_SALT = "export-shard-v1"
ORDER_SALT = "export-order-v1"


def with_shard_assignment(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard",
    sort_col: str = "__sort_key",
) -> DataFrame:
    """Attach (shard, sort_key): salted md5 of the id — rerun-stable and
    independent of input partitioning."""
    sid = F.col(id_col).cast("string")
    return df.withColumn(
        shard_col, (md5_int(F.concat(F.lit(SHARD_SALT), sid)) % n_shards).cast("int")
    ).withColumn(sort_col, md5_int(F.concat(F.lit(ORDER_SALT), sid)))


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    *,
    id_col: str,
    n_shards: int = 8,
    fmt: str = "json",
) -> None:
    """Write `df` as `out_dir/shard=K/` JSONL (or parquet) shards.

    One shuffle keyed on the shard id, then a per-shard local sort — at
    100 TB this is n_shards writer tasks each streaming one sorted run;
    nothing global. partitionBy(shard) makes the shard id a directory key
    (pruned on read-back), and overwrite mode keeps the export idempotent.
    """
    assigned = with_shard_assignment(df, id_col=id_col, n_shards=n_shards)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__sort_key")
        .drop("__sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(out_dir)
    )
