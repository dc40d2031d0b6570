"""Cluster-sizing arithmetic for running this engine at lake scale.

`get_spark` (session.py) carries the semantics-level settings (AQE, UTC,
Arrow); this module computes the SIZE-dependent knobs a deployment must
set per workload — the standard sizing rules, written down as code so they
are testable and reviewable instead of tribal knowledge:

- **shuffle partitions**: target ~`TARGET_PARTITION_BYTES` (128 MiB) of
  post-shuffle data per task — the size that sorts/aggregates in memory
  without spilling at typical 4-8 GiB executor memory per core — bounded
  below by 2-3x total cores (parallelism floor) and above by a sanity cap
  (tiny tasks drown in scheduling overhead). AQE coalesces down from this
  number at runtime, so erring high is safe; erring low is not (AQE never
  splits a too-coarse non-skewed partition).
- **input split size** (`files.maxPartitionBytes`): the default 128 MiB is
  right for columnar scans; raise it only for narrow row-count-bound scans.
- **broadcast threshold**: keep Spark's default 10 MiB unless executors are
  memory-rich; NEVER solve a slow join by raising it past ~256 MiB — that
  is what this repo's bounded-dim hint policy and AQE are for.
"""

from __future__ import annotations

TARGET_PARTITION_BYTES = 128 * 1024 * 1024
MIN_TASKS_PER_CORE = 2
MAX_SHUFFLE_PARTITIONS = 1_000_000  # scheduling-sanity cap; a full 100 TB
# shuffle at 128 MiB/task needs ~820k tasks, well within Spark's range


def shuffle_partitions(shuffle_bytes: int, total_cores: int) -> int:
    """Partition count so each post-shuffle task handles ~128 MiB, floored
    at 2x total cores, capped at a scheduling-sanity maximum.

    >>> shuffle_partitions(10 * 2**40, 1000 * 8)   # 10 TiB shuffle, 8k cores
    81920
    """
    by_size = -(-shuffle_bytes // TARGET_PARTITION_BYTES)  # ceil
    return int(min(max(by_size, MIN_TASKS_PER_CORE * total_cores), MAX_SHUFFLE_PARTITIONS))


def cluster_conf(
    input_bytes: int,
    *,
    executors: int,
    cores_per_executor: int = 4,
    shuffle_fraction: float = 1.0,
) -> dict[str, str]:
    """Size-dependent Spark conf for a scan of `input_bytes` where roughly
    `shuffle_fraction` of the input reaches the widest shuffle (1.0 for a
    full-table groupBy/join; ~0.1 for heavily-filtered rollups — predicate
    pushdown means the shuffle, not the scan, is what you size for)."""
    if input_bytes <= 0 or executors <= 0 or cores_per_executor <= 0:
        raise ValueError("input_bytes, executors, cores_per_executor must be > 0")
    if not 0 < shuffle_fraction <= 1:
        raise ValueError(f"shuffle_fraction in (0, 1], got {shuffle_fraction}")
    cores = executors * cores_per_executor
    parts = shuffle_partitions(int(input_bytes * shuffle_fraction), cores)
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.files.maxPartitionBytes": str(TARGET_PARTITION_BYTES),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # advisory target AQE coalesces toward — keep it in lockstep with
        # the per-task sizing above
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            TARGET_PARTITION_BYTES // 2
        ),
    }
