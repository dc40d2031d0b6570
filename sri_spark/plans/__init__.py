"""Query catalog: named queries + DuckDB oracle SQL.

`all_queries()` / `all_oracles()` aggregate every registered module; the
driver contract (`__spark_entry__.queries()` / `oracle_sql()`) is a thin
wrapper over these.
"""

from sri_spark.plans.registry import ORACLES, QUERIES, all_oracles, all_queries, register

# importing modules populates the registry
from sri_spark.plans import relational, sql_surface  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register", "all_queries", "all_oracles"]


# extension families are mandatory — import errors must surface, not
# silently shrink the registry
from sri_spark.plans import (  # noqa: E402,F401
    audit_queries,
    embedding_queries,
    curation_extra_queries,
    curation_queries,
    decorrelation_queries,
    dedup_queries,
    events_queries,
    governance_queries,
    graph_queries,
    join_advanced,
    lm_queries,
    multimodal_queries,
    ops_extra_queries,
    parity_queries,
    reference_sql,
    retrieval_queries,
    semistructured_queries,
    similarity_queries,
    sketch_queries,
    sql_modern_queries,
    stats_extra_queries,
    stats_regression_queries,
    surface_extra,
    text_extra_queries,
    text_queries,
    timeseries_queries,
    tpch_shapes,
    training_queries,
    warehouse_queries,
)
