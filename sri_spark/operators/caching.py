"""Scoped persist registry — cache discipline for multi-consumer plans.

Operators that materialize an intermediate consumed by several downstream
joins (dedup shingle sets, MinHash signatures) persist it so the expensive
shuffle runs once. A bare ``df.persist()`` inside a library function leaks:
the caller has no handle to unpersist, and a long-lived session (the
driver's correctness sweep, bench warm-up + timed passes) accumulates
cached partitions until eviction pressure.

``scoped_persist`` records every persisted DataFrame in a module registry;
``unpersist_all()`` releases them. Harness code (bench.py, tests) calls
``unpersist_all()`` between queries; inside one query the cache is shared
as intended. At 100 TB the same pattern applies per-job, with
``StorageLevel.DISK_ONLY`` or a parquet checkpoint instead of memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PERSISTED: list[DataFrame] = []


def scoped_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK_DESER
) -> DataFrame:
    """persist() + register for later bulk release via unpersist_all()."""
    df.persist(level)
    _PERSISTED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for release by
    unpersist_all() (for callers that manage persist() themselves, e.g.
    iterative algorithms that unpersist per round but return a final
    persisted result)."""
    _PERSISTED.append(df)
    return df


def unpersist_all(blocking: bool = False) -> int:
    """Release every scoped-persisted DataFrame; returns how many."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist(blocking)
        except Exception:
            pass  # session already stopped — nothing to release
    _PERSISTED.clear()
    return n
