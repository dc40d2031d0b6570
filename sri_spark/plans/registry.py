"""Registry mapping query name -> callable and query name -> oracle SQL.

Every callable takes ``(spark, sf_dir)`` and returns a DataFrame. The oracle
is ANSI SQL runnable by DuckDB over the same parquet tables (views are
pre-registered by the driver). Queries without an oracle get a rows-only
check (allowed for non-SQL-expressible operators).

Cross-engine determinism rules followed throughout the catalog:
- every computed column is aliased identically in Spark and SQL;
- doubles that pass through aggregation are ``round()``-ed on both sides so
  floating-point summation order can't flip the value hash;
- every LIMIT/row_number has a total (tie-broken) ORDER BY;
- ints that DuckDB widens to BIGINT are cast to long on the Spark side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
