"""In-flight pipeline metrics via Spark's Observation API.

`quality_report` (etl/quality.py) audits tables AFTER they materialize —
a second pass over each output. `observe()` metrics ride along with the
job itself: named aggregates are accumulated DURING the action that
produces the output, so row counts / null counts / value sums cost zero
extra scans — the observability a 100 TB pipeline needs, where "run a
count(*) afterwards" doubles the bill.

Batch usage:

    obs, df = observed(df, "fact", rows=F.count(F.lit(1)),
                       null_dates=F.sum(F.when(c.isNull(), 1).otherwise(0)))
    df.write.parquet(...)          # the action
    metrics = obs.get              # {'rows': ..., 'null_dates': ...}

Streaming: the same `observe` call surfaces per-micro-batch metrics in
`StreamingQueryProgress.observedMetrics` — one definition, both runtimes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, **metrics: Column
) -> tuple[Observation, DataFrame]:
    """Attach named metric aggregates to `df`; returns (observation, df).

    The metrics accumulate during whatever action later runs on `df`
    (write, collect, count) — read `observation.get` AFTER that action.
    Each metric must be an aggregate Column; names become dict keys.
    """
    if not metrics:
        raise ValueError("observed() needs at least one metric column")
    obs = Observation(name)
    return obs, df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
