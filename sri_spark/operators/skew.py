"""Skew-mitigated joins (100 TB concern; SURVEY §4.2 / mandate).

First line of defense is AQE's skew-join splitting (on in session.py), which
handles sort-merge skew transparently. This module covers the case AQE
can't: a *hash-partitioned* join where a handful of hot keys concentrate on
single tasks and the build side is too large to broadcast.

`salted_join` rewrites `big ⋈ small ON key` as
`big ⋈ small' ON (key, salt)`: each big-side row picks one of S salt values
(deterministically, from a hash of stable columns — never rand(), which
breaks retry/lineage determinism); the small side is replicated S times, one
copy per salt. Hot keys spread over S tasks at the cost of an S× replication
of the small side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Join with the big side's hot keys spread over `n_salts` partitions.

    `salt_source` is any expression varying within a key group (default: a
    hash of all big-side columns); the result equals the unsalted join
    row-for-row. Only join types that never emit unmatched small-side rows
    are allowed — a right/full outer would emit each unmatched small-side
    row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "cross"):
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}; "
            "outer joins would duplicate unmatched small-side rows per salt"
        )
    if salt_source is None:
        salt_source = F.hash(*[F.col(c) for c in big.columns])
    salted_big = big.withColumn(SALT_COL, F.pmod(salt_source, F.lit(n_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    replicated_small = small.select("*", salts)
    return salted_big.join(replicated_small, on=[*on, SALT_COL], how=how).drop(SALT_COL)
