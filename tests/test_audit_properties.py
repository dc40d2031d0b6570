"""Hypothesis invariants for the audit/statistics family: properties that
must hold on ANY input, not just the fixtures — digest sensitivity,
KS bounds and self-agreement, k-anonymity coarsening monotonicity, and
chi-square's zero-cell algebra against a direct full-grid computation."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- table digest -----------------------------------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.text(alphabet="abcXYZ ", max_size=8),
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False).map(
            lambda x: round(x, 2)
        ),
    ),
    min_size=1,
    max_size=30,
)


def _digest(spark, rows):
    df = spark.createDataFrame(rows, "k long, s string, v double")
    rendered = F.concat_ws(
        "|",
        F.col("k").cast("string"),
        F.col("s"),
        F.format_string("%.2f", F.col("v")),
    )
    h = F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")
    return {
        r["b"]: r["d"]
        for r in df.select((F.col("k") % 4).alias("b"), h.alias("h"))
        .groupBy("b")
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("d"))
        .collect()
    }


@settings(**_SETTINGS)
@given(rows=_rows)
def test_digest_invariant_under_permutation(spark, rows):
    assert _digest(spark, rows) == _digest(spark, rows[::-1])


@settings(**_SETTINGS)
@given(rows=_rows, idx=st.integers(min_value=0, max_value=10**6))
def test_digest_detects_any_single_value_change(spark, rows, idx):
    i = idx % len(rows)
    k, s, v = rows[i]
    tampered = list(rows)
    tampered[i] = (k, s, round(v + 0.01, 2))
    base, changed = _digest(spark, rows), _digest(spark, tampered)
    assert base[k % 4] != changed[k % 4]
    assert all(base[b] == changed[b] for b in base if b != k % 4)


# --- binned two-sample KS ---------------------------------------------------


def _ks_rows(spark, vals_a, vals_b, bins=10):
    data = [("a", float(v)) for v in vals_a] + [("b", float(v)) for v in vals_b]
    ev = spark.createDataFrame(data, "t string, value double")
    stats = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    # epsilon-floored width, mirroring the production query: a when()
    # guard does not protect under ANSI because codegen evaluates the
    # guarded division anyway
    width = F.greatest((F.col("hi") - F.col("lo")) / bins, F.lit(1e-12))
    safe_bin = F.least(
        F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
        F.lit(bins - 1),
    )
    binned = (
        ev.join(F.broadcast(stats), F.lit(True))
        .select(
            safe_bin.alias("bin"),
            F.when(F.col("t") == "a", 1).otherwise(0).alias("ia"),
            F.when(F.col("t") == "b", 1).otherwise(0).alias("ib"),
        )
        .groupBy("bin")
        .agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    wall = W.orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ecdf_a = F.sum("na").over(w) / F.sum("na").over(wall)
    ecdf_b = F.sum("nb").over(w) / F.sum("nb").over(wall)
    return binned.select(
        F.abs(ecdf_a - ecdf_b).alias("gap")
    ).agg(F.max("gap").alias("d")).first()["d"]


_vals = st.lists(
    st.floats(min_value=0, max_value=100, allow_nan=False),
    min_size=2,
    max_size=25,
)


@settings(**_SETTINGS)
@given(vals=_vals)
def test_ks_self_comparison_is_zero(spark, vals):
    d = _ks_rows(spark, vals, vals)
    assert d is not None and d < 1e-12


@settings(**_SETTINGS)
@given(a=_vals, b=_vals)
def test_ks_bounded_and_symmetric(spark, a, b):
    d_ab = _ks_rows(spark, a, b)
    d_ba = _ks_rows(spark, b, a)
    assert 0.0 <= d_ab <= 1.0
    assert math.isclose(d_ab, d_ba, abs_tol=1e-12)


# --- k-anonymity coarsening -------------------------------------------------


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_coarser_quasi_identifier_never_lowers_min_k(spark, rows):
    """Dropping a QI column merges cells — min cell size can only grow:
    the formal reason generalization/suppression is how k-anonymity is
    RAISED. Checked relationally on arbitrary small tables."""
    df = spark.createDataFrame(rows, "q1 int, q2 int")
    fine = df.groupBy("q1", "q2").count().agg(F.min("count")).first()[0]
    coarse = df.groupBy("q1").count().agg(F.min("count")).first()[0]
    assert coarse >= fine


# --- chi-square zero-cell algebra ------------------------------------------


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["p1", "p2", "p3"]),
            st.sampled_from(["x", "y"]),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_chi2_grid_free_equals_full_grid(spark, rows):
    """The catalog's observed-cells-only formula (sum[(O-E)^2/E - E] + rt)
    must equal the textbook full-grid chi-square contribution per row
    category, including categories with empty cells."""
    from collections import Counter

    obs = Counter(rows)
    rt = Counter(p for p, _ in rows)
    ct = Counter(s for _, s in rows)
    n = len(rows)
    statuses = sorted(ct)
    for p in sorted(rt):
        full = sum(
            (obs.get((p, s), 0) - rt[p] * ct[s] / n) ** 2 / (rt[p] * ct[s] / n)
            for s in statuses
        )
        grid_free = (
            sum(
                (obs[(p2, s)] - rt[p] * ct[s] / n) ** 2 / (rt[p] * ct[s] / n)
                - rt[p] * ct[s] / n
                for (p2, s) in obs
                if p2 == p
            )
            + rt[p]
        )
        assert math.isclose(full, grid_free, rel_tol=1e-9, abs_tol=1e-9), p
