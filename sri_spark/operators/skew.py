"""Skew-mitigated equi-join: salt the skewed side, replicate the small side.

A hash join on a skewed key funnels every row of a hot key through one
task; AQE's skew-join split helps for sort-merge joins but not when the
skew lives in a single key of a shuffled hash join. Salting is the
classic manual fix: append salt = hash(row) % N to the big/skewed side,
explode the other side N ways with every salt value, and join on
(key, salt) — the hot key now spreads across N tasks.

Semantics are EXACTLY those of the unsalted join (proved by the
join_skew_salted catalog query, whose oracle is the plain join): every
fact row keeps one salt value, and the dim side carries each of the N
salts once per row, so each fact row still matches its dim row exactly
once. Cost: the replicated side grows N-fold — use for genuinely small
dims or pre-filtered build sides, and size N to the observed hot-key
factor, not larger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    *,
    n_salt: int = 8,
    salt_by: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `fact` (skewed side) with `dim` (replicated side) on the `on`
    condition, spreading each fact key over `n_salt` tasks.

    `salt_by` picks the deterministic per-row salt source on the fact side
    (a unique column keeps reruns identical); defaults to a hash over the
    whole row. `how` supports the fact-preserving types (inner / left)."""
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_src = (
        F.xxhash64(*[F.col(c) for c in fact.columns])
        if salt_by is None
        else F.xxhash64(salt_by if isinstance(salt_by, Column) else F.col(salt_by))
    )
    salted_fact = fact.withColumn(_SALT, F.pmod(salt_src, F.lit(n_salt)))
    replicated_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return (
        salted_fact.join(
            replicated_dim, on & (salted_fact[_SALT] == replicated_dim[_SALT]), how
        )
        .drop(salted_fact[_SALT])
        .drop(replicated_dim[_SALT])
    )
