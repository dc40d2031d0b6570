"""Query catalog: named queries + DuckDB oracle SQL.

`all_queries()` / `all_oracles()` aggregate every registered module; the
driver contract (`__spark_entry__.queries()` / `oracle_sql()`) is a thin
wrapper over these.
"""

from sri_spark.plans.registry import ORACLES, QUERIES, all_oracles, all_queries, register

# importing modules populates the registry
from sri_spark.plans import relational, sql_surface  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register", "all_queries", "all_oracles"]


def _load_extensions() -> None:
    for mod in ("dedup_queries", "text_queries", "text_extra_queries", "similarity_queries", "events_queries"):
        try:
            __import__(f"sri_spark.plans.{mod}")
        except ImportError:
            pass


_load_extensions()
