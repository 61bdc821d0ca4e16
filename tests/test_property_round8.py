"""Property tests for the round-8 operator family.

Randomized inputs (hypothesis) against the operators' mathematical
contracts — the invariants that hold for EVERY input, not just the
hand-computed fixtures:

  - histogram quantiles are within one bin width of the exact
    percentile, and the state merge is lossless;
  - TVD is symmetric, within [0, 1], and zero iff the distributions
    are proportional;
  - burn-rate alerts fire exactly when the algebra says so;
  - decayed engagement equals the directly-computed dyadic sum.

Spark jobs are slow per-example, so examples are capped low and the
data is pushed through ONE createDataFrame per example.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=99.999, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([0.1, 0.5, 0.9, 1.0]),
)
def test_histogram_quantile_within_one_bin(spark, vals, q):
    from kubernetes_logs_datalake_spark.operators.sketch import (
        histogram_quantiles,
        histogram_state,
    )

    lo, hi, nb = 0.0, 100.0, 20
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    state = histogram_state(df, "v", ["g"], lo, hi, nb)
    est = histogram_quantiles(state, ["g"], lo, hi, nb, [q]).collect()[0].est
    # exact discrete percentile: element at rank ceil(q*n)
    s = sorted(vals)
    exact = s[max(0, math.ceil(q * len(s)) - 1)]
    width = (hi - lo) / nb
    assert exact <= est + 1e-9
    assert est - exact <= width + 1e-9


@settings(**SETTINGS)
@given(
    a=st.lists(st.integers(min_value=0, max_value=19), min_size=1, max_size=40),
    b=st.lists(st.integers(min_value=0, max_value=19), min_size=1, max_size=40),
)
def test_tvd_symmetric_bounded_and_zero_on_self(spark, a, b):
    from kubernetes_logs_datalake_spark.operators.sketch import (
        histogram_drift,
        histogram_state,
    )

    lo, hi, nb = 0.0, 20.0, 20
    da = spark.createDataFrame([("g", float(v)) for v in a], "g string, v double")
    db = spark.createDataFrame([("g", float(v)) for v in b], "g string, v double")
    sa = histogram_state(da, "v", ["g"], lo, hi, nb)
    sb = histogram_state(db, "v", ["g"], lo, hi, nb)

    ab = histogram_drift(sa, sb, ["g"]).collect()[0].tvd
    ba = histogram_drift(sb, sa, ["g"]).collect()[0].tvd
    assert ab == ba
    assert 0.0 <= ab <= 1.0
    # self-drift is exactly zero (integer algebra, not epsilon-zero)
    assert histogram_drift(sa, sa, ["g"]).collect()[0].tvd == 0.0


@settings(**SETTINGS)
@given(
    bads=st.lists(st.integers(min_value=0, max_value=10), min_size=4, max_size=4),
)
def test_burn_rate_alert_iff_algebra(spark, bads):
    """alert ⟺ (n_events ≥ min_events AND rate_short > ratio·rate_long),
    recomputed independently in Python for every window."""
    from kubernetes_logs_datalake_spark.operators.rollup import (
        burn_rate_alerts,
    )

    short, long_, ratio, min_events = 100, 400, 1.2, 5
    rows = []
    for bkt, nbad in enumerate(bads):
        for i in range(10):
            rows.append((bkt * short + i, i < nbad))
    df = spark.createDataFrame(rows, "ts long, bad boolean")
    out = burn_rate_alerts(df, "ts", "bad", short_us=short, long_us=long_,
                           ratio=ratio, min_events=min_events).collect()
    total_bad = sum(bads)
    rate_long = total_bad / 40
    for r in out:
        nbad = bads[r.bucket_us // short]
        expect = (10 >= min_events) and (nbad / 10 > ratio * rate_long)
        assert r.alert == expect, (r, nbad, rate_long)


@settings(**SETTINGS)
@given(
    ages=st.lists(st.integers(min_value=0, max_value=70), min_size=1, max_size=30),
)
def test_decayed_engagement_equals_direct_sum(spark, ages):
    from kubernetes_logs_datalake_spark.operators.funnel import (
        decayed_engagement,
    )

    B = 100
    top = max(ages)
    # place events so that bucket-age(event) == top - ... careful:
    # ref = max ts; an event at ts = ref - a*B has age a exactly
    ref = 1_000_000
    rows = [("u", ref - a * B) for a in ages]
    df = spark.createDataFrame(rows, "user_id string, ts long")
    got = decayed_engagement(df, "user_id", "ts", bucket_us=B).collect()[0]
    expect = sum(2.0 ** -min(a - min(ages), 62) for a in ages)
    # ages are relative to the LATEST event (ref - min(ages)*B).
    # Mirror Spark's F.round (BigDecimal HALF_UP over the double's
    # EXACT decimal expansion), not Python's banker's round(): sums of
    # powers of two land exactly on decimal half-way points (e.g.
    # 2⁰ + 2⁻¹⁰ = 1.0009765625 at scale 9), where the two conventions
    # differ by 1e-9 — hypothesis found the boundary after ~4 rounds.
    from decimal import ROUND_HALF_UP, Decimal

    want = float(
        Decimal(expect).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
    )
    assert got.n_events == len(ages)
    assert got.score == want
