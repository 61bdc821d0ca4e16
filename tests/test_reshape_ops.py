"""Semantic tests for the reshape (pivot/unpivot), group-quantile, and
inter-arrival operators (cross-engine value equality is covered by the
oracle harness; these pin meaning on hand-built inputs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_pivot_counts_explicit_values(spark):
    """Counts land in the right cell; absent combinations are 0 (not
    null); values absent from the data still produce a column."""
    from kubernetes_logs_datalake_spark.operators.reshape import pivot_counts

    rows = [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")]
    df = spark.createDataFrame(rows, "r string, p string")
    out = {
        r.r: r for r in pivot_counts(df, "r", "p", ["x", "y", "z"]).collect()
    }
    assert (out["a"].p_x, out["a"].p_y, out["a"].p_z) == (2, 1, 0)
    assert (out["b"].p_x, out["b"].p_y, out["b"].p_z) == (0, 1, 0)


def test_pivot_single_aggregate(spark):
    """The cross-tab must compile to ONE aggregate (one shuffle) —
    neither the distinct-collection prescan of value-less pivot nor
    the stacked two-Aggregate plan of DataFrame.pivot."""
    from kubernetes_logs_datalake_spark.operators.reshape import pivot_counts

    df = spark.createDataFrame([("a", "x")], "r string, p string")
    plan = pivot_counts(df, "r", "p", ["x", "y"])._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") == 1, plan


def test_unpivot_metric_summary(spark):
    """Each wide column becomes one metric row with exact totals."""
    from kubernetes_logs_datalake_spark.operators.reshape import (
        unpivot_metric_summary,
    )

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0)], "a double, b double"
    )
    out = {r.metric: r for r in unpivot_metric_summary(df, ["a", "b"]).collect()}
    assert out["a"].n == 3 and out["a"].total == 6.0 and out["a"].avg == 2.0
    assert out["b"].vmin == 10.0 and out["b"].vmax == 30.0


def test_group_quantiles_disc_semantics(spark):
    """percentile_disc rank formula: value at rank ceil(q*n); q=0.5
    over 1..4 picks 2 (rank 2), q=0.99 picks the max element."""
    from kubernetes_logs_datalake_spark.operators.profile import group_quantiles

    df = spark.createDataFrame(
        [("g", float(v)) for v in [4, 1, 3, 2]], "g string, x double"
    )
    out = {r.q: r.value for r in
           group_quantiles(df, "g", "x", qs=(0.5, 0.99)).collect()}
    assert out[0.5] == 2.0
    assert out[0.99] == 4.0


def test_group_quantiles_is_element(spark):
    """The result is always an actual element of the column (discrete,
    never interpolated)."""
    from kubernetes_logs_datalake_spark.operators.profile import group_quantiles

    vals = [1.0, 2.0, 1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x double")
    for r in group_quantiles(df, "g", "x", qs=(0.5, 0.9)).collect():
        assert r.value in vals


def test_interarrival_stats(spark):
    """Gaps are consecutive-event diffs per user; single-event users
    produce no row; avg is exact sum/count."""
    from kubernetes_logs_datalake_spark.operators.funnel import interarrival_stats

    rows = [(1, 100), (1, 150), (1, 300), (2, 7)]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    out = {r.user_id: r for r in
           interarrival_stats(df, "user_id", "ts").collect()}
    assert set(out) == {1}
    r = out[1]
    assert (r.n_gaps, r.min_gap, r.max_gap) == (2, 50, 150)
    assert math.isclose(r.avg_gap, 100.0)


def test_interarrival_tie_stability(spark):
    """Equal timestamps: the gap multiset is order-independent, so
    stats are stable however ties are shuffled."""
    from kubernetes_logs_datalake_spark.operators.funnel import interarrival_stats

    rows = [(1, 10), (1, 10), (1, 30)]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    r = interarrival_stats(df, "user_id", "ts").collect()[0]
    assert (r.n_gaps, r.min_gap, r.max_gap) == (2, 0, 20)
