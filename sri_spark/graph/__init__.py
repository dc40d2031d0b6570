"""Graph analytics over relational edge sets (mandate extension; the
reference has no graph surface — its only graph-shaped structure is the
star schema's FK edges). Connected components for dedup families lives in
sri_spark.dedup.components; this package holds rank/centrality operators.
"""

from sri_spark.graph.pagerank import pagerank

__all__ = ["pagerank"]
