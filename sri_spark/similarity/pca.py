"""Per-label top principal component of the embedding table — iterative
linear algebra done two ways:

1. **Relational power iteration** (`top_component_relational`): the label
   covariance matrices live as long-format rows (label, i, j, cov) and each
   power round is one join + hash aggregate (matrix-vector product) plus a
   label-sized normalization — the same fixed-iteration unrolling the repo
   uses for PageRank, so a DuckDB oracle can replay the identical
   recurrence and value-check it.
2. **Arrow grouped-map** (`top_component_grouped`): `applyInPandas` per
   label with a numpy eigendecomposition. This is the mandated custom-
   operator shape for per-group numerical kernels Spark can't express —
   each label's vectors arrive as ONE Arrow batch, the kernel is vectorized
   C, and only (label, component) rows come back.

Scale notes: the relational covariance build explodes dim² rows per vector
(fine for feature-grade dims, exact, oracle-checkable); the grouped path
computes each label's Gram matrix inside the Arrow batch, so the shuffle
carries vectors once with no blowup — at 100 TB with many labels the
grouped path is the production one, and the relational path is its
cross-engine correctness witness. Per-label state is O(dims²), constant in
row count; a label too big for one task would shard into partial Grams via
mapInPandas + a (label, i, j) aggregate — same algebra, one more shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

POWER_ITERS = 4


def covariance_long(emb: DataFrame, *, vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label covariance matrices in long form (label, i, j, cov) with
    population normalization. Built from one explode over (i, j) index
    pairs and a single hash aggregate keyed (label, i, j) — a bounded key
    space (labels x dims²), so map-side combine collapses the explosion
    before the exchange."""
    idx = F.explode(F.sequence(F.lit(1), F.size("v"))).alias("i")
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    means = (
        ex.select("label", F.posexplode("v").alias("i0", "x"))
        .groupBy("label", "i0")
        .agg(F.avg("x").alias("mu"))
    )
    pairs = (
        ex.select("label", "v", idx)
        .select(
            "label",
            "v",
            "i",
            F.explode(F.sequence(F.lit(1), F.size("v"))).alias("j"),
        )
        .select(
            "label",
            (F.col("i") - 1).alias("i0"),
            (F.col("j") - 1).alias("j0"),
            (F.element_at("v", F.col("i")) * F.element_at("v", F.col("j"))).alias(
                "xy"
            ),
        )
    )
    exy = pairs.groupBy("label", "i0", "j0").agg(
        F.avg("xy").alias("exy"), F.count("*").alias("n")
    )
    mi = means.select(
        F.col("label"), F.col("i0"), F.col("mu").alias("mu_i")
    )
    mj = means.select(
        F.col("label"), F.col("i0").alias("j0"), F.col("mu").alias("mu_j")
    )
    return (
        exy.join(F.broadcast(mi), ["label", "i0"])
        .join(F.broadcast(mj), ["label", "j0"])
        .select(
            "label",
            F.col("i0").alias("i"),
            F.col("j0").alias("j"),
            (F.col("exy") - F.col("mu_i") * F.col("mu_j")).alias("cov"),
        )
    )


def top_component_relational(
    cov: DataFrame, *, dims: int, iters: int = POWER_ITERS
) -> DataFrame:
    """Top eigenvector per label after `iters` power rounds from the
    uniform start vector 1/sqrt(dims) — one join + aggregate per round
    (the matrix-vector product), one label-sized norm aggregate to
    re-normalize. Deterministic: fixed start, fixed rounds, so a SQL
    oracle replays it exactly; sign is pinned by the start vector.
    Returns (label, i, loading)."""
    labels = cov.select("label").distinct()
    # label x dims start grid: a deliberate crossJoin against a broadcast
    # dims-row frame (64 rows) — label-count x dims is dimension-sized
    v = labels.crossJoin(
        F.broadcast(
            cov.sparkSession.range(dims).select(
                F.col("id").cast("int").alias("i"),
                F.lit(1.0 / dims**0.5).alias("loading"),
            )
        )
    )
    from sri_spark.operators.caching import scoped_persist

    for _ in range(iters):
        prod = (
            cov.alias("c")
            .join(
                v.select(
                    "label", F.col("i").alias("j"), F.col("loading").alias("vj")
                ).alias("w"),
                ["label", "j"],
            )
            .groupBy("label", "i")
            .agg(F.sum(F.col("cov") * F.col("vj")).alias("raw"))
        )
        # prod feeds BOTH the norm aggregate and the re-normalized vector:
        # without materialization the lazy plan doubles per round (2^iters
        # subtree copies). The frame is labels x dims rows — persisting it
        # keeps the plan linear in `iters` at negligible memory cost.
        prod = scoped_persist(prod)
        norms = prod.groupBy("label").agg(
            F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("nrm")
        )
        v = (
            prod.join(F.broadcast(norms), "label")
            # try_divide: a label whose covariance matrix is all zeros
            # (constant vectors) has nrm == 0; ANSI would abort the job,
            # try_divide yields NULL loadings — identical to the DuckDB
            # oracle, whose float division by zero is NULL
            .select(
                "label",
                "i",
                F.try_divide(F.col("raw"), F.col("nrm")).alias("loading"),
            )
        )
    return v


_GROUPED_SCHEMA = StructType(
    [
        StructField("label", StringType()),
        StructField("n_vecs", LongType()),
        StructField("explained_ratio", DoubleType()),
        StructField("component", ArrayType(DoubleType())),
    ]
)


def top_component_grouped(
    emb: DataFrame, *, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """applyInPandas twin: per-label exact top eigenvector + explained
    variance ratio via numpy, one Arrow batch per label. Sign-normalized
    (largest-|x| entry positive) so results are comparable across
    backends regardless of eigensolver sign convention."""
    import numpy as np
    import pandas as pd

    def _top(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["__v"].to_numpy())
        mat = mat - mat.mean(axis=0, keepdims=True)
        cov = (mat.T @ mat) / mat.shape[0]
        vals, vecs = np.linalg.eigh(cov)
        comp = vecs[:, -1]
        pivot = np.argmax(np.abs(comp))
        if comp[pivot] < 0:
            comp = -comp
        ratio = float(vals[-1] / vals.sum()) if vals.sum() > 0 else 0.0
        return pd.DataFrame(
            {
                "label": [pdf["__label"].iloc[0]],
                "n_vecs": [len(pdf)],
                "explained_ratio": [ratio],
                "component": [comp.tolist()],
            }
        )

    prepped = emb.select(
        F.col(label_col).cast("string").alias("__label"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    return prepped.groupBy("__label").applyInPandas(_top, _GROUPED_SCHEMA)
