"""Property tests for CDC latest-wins compaction: random change streams
(duplicate timestamps, delete-heavy keys, single-version keys) against a
pandas idxmax oracle. The catalog oracle checks Spark==DuckDB on one
fixture; this checks the SEMANTICS hold across adversarial stream shapes
— the Hypothesis discipline that caught round 4's KS crash."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (event_id, user_id, minutes-offset, value): small key/time domains force
# collisions — same user with identical timestamps exercises the
# (ts, event_id) tie-break
_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=0, max_value=30),
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],  # event ids unique, like any changelog
)


def _pandas_compaction(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "m", "value"])
    df["op"] = df["event_id"].map(lambda e: "D" if e % 10 == 0 else "U")
    out = {}
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["m", "event_id"], ascending=False)
        latest = g.iloc[0]
        if latest["op"] == "U":
            out[uid] = (
                round(float(latest["value"]), 6),
                len(g),
                int((g["op"] == "D").sum()),
            )
    return out


def _spark_compaction(spark, tmp_path_factory, rows):
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (int(e), int(u), base + dt.timedelta(minutes=int(m)), float(v))
            for e, u, m, v in rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = tmp_path_factory.mktemp("cdc_prop")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    from sri_spark.plans.ops_extra_queries import warehouse_cdc_compaction

    return {
        r["user_id"]: (r["last_value"], r["n_versions"], r["n_deletes"])
        for r in warehouse_cdc_compaction(spark, str(out)).collect()
    }


@settings(**_SETTINGS)
@given(rows=_rows)
def test_cdc_compaction_matches_pandas_oracle(spark, tmp_path_factory, rows):
    assert _spark_compaction(spark, tmp_path_factory, rows) == _pandas_compaction(
        rows
    )


@settings(**_SETTINGS)
@given(rows=_rows)
def test_cdc_compaction_is_idempotent_under_replay(
    spark, tmp_path_factory, rows
):
    """Feeding the changelog twice (duplicate event_ids, the exactly-once
    failure mode) must not change the survivors' values: the compaction
    keys on (ts, event_id), so replayed rows are ties resolved the same
    way, only version counts double."""
    doubled = rows + rows
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (int(e), int(u), base + dt.timedelta(minutes=int(m)), float(v))
            for e, u, m, v in doubled
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = tmp_path_factory.mktemp("cdc_replay")
    ev.coalesce(1).write.mode("overwrite").parquet(f"{out}/events.parquet")
    from sri_spark.plans.ops_extra_queries import warehouse_cdc_compaction

    got = {
        r["user_id"]: r["last_value"]
        for r in warehouse_cdc_compaction(spark, str(out)).collect()
    }
    want = {u: v for u, (v, _, _) in _pandas_compaction(rows).items()}
    assert got == want
