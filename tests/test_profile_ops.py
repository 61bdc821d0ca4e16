"""Semantic tests for the sketch / funnel / profiling operator families
(cross-engine value equality is covered by the oracle harness; these
pin the operators' meaning on hand-built inputs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_kmv_estimate_accuracy(spark):
    """KMV with k=128 over 5000 distinct keys must land within ~12%
    (3/sqrt(k) ≈ 0.27 is the 3-sigma bound; md5 behaves far better),
    and the under-k branch returns the EXACT count."""
    from kubernetes_logs_datalake_spark.operators.sketch import kmv_distinct

    df = spark.range(5000).select(
        F.lit("big").alias("g"), F.col("id").alias("k")
    ).union(
        spark.range(37).select(F.lit("small").alias("g"), F.col("id").alias("k"))
    )
    out = {r.g: r.est_distinct for r in kmv_distinct(df, "k", ["g"], k=128).collect()}
    assert out["small"] == 37.0  # < k distinct → exact
    assert abs(out["big"] - 5000) / 5000 < 0.12, out["big"]


def test_kmv_duplicates_do_not_inflate(spark):
    """The sketch estimates DISTINCT keys: replicating every key 10x
    must not change the estimate."""
    from kubernetes_logs_datalake_spark.operators.sketch import kmv_distinct

    base = spark.range(1000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    dup = base.withColumn("_r", F.explode(F.array(*[F.lit(i) for i in range(10)])))
    a = kmv_distinct(base, "k", ["g"], k=64).collect()[0].est_distinct
    b = kmv_distinct(dup, "k", ["g"], k=64).collect()[0].est_distinct
    assert a == b


def test_funnel_strict_order(spark):
    """Only users whose first-occurrence times strictly increase through
    the stages convert; doing a later stage BEFORE an earlier one does
    not count."""
    from kubernetes_logs_datalake_spark.operators.funnel import funnel_counts

    rows = [
        # u1: full ordered funnel
        (1, "signup", 100), (1, "view", 200), (1, "click", 300),
        # u2: clicked before viewing → converts only through signup
        (2, "signup", 100), (2, "click", 150), (2, "view", 200),
        # u3: never signed up → counts nowhere
        (3, "view", 50), (3, "click", 60),
        # u4: signup only
        (4, "signup", 10),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {r.stage: r.n_users for r in
           funnel_counts(df, "user_id", "event_type", "ts",
                         ["signup", "view", "click"]).collect()}
    assert out == {"signup": 3, "view": 2, "click": 1}


def test_retention_cohorts(spark):
    """Cohort day = first-seen day; each (cohort, offset) counts a user
    once however many events they emit that day."""
    from kubernetes_logs_datalake_spark.operators.funnel import (
        NS_PER_DAY,
        retention_cohorts,
    )

    d = NS_PER_DAY
    rows = [
        (1, 0 * d + 5), (1, 0 * d + 99), (1, 2 * d + 1),   # cohort 0: day 0, 2
        (2, 0 * d + 7), (2, 1 * d + 3),                    # cohort 0: day 0, 1
        (3, 1 * d + 2),                                    # cohort 1: day 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long")
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert out == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}


def test_zscore_outliers(spark):
    """One planted extreme value must be flagged with the right z."""
    from kubernetes_logs_datalake_spark.operators.profile import zscore_outliers

    vals = [10.0] * 50 + [20.0] * 50 + [1000.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, v double"
    )
    out = zscore_outliers(df, "g", "v", "id", z=3.0).collect()
    assert [r.id for r in out] == [100]
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    assert math.isclose(out[0].z_score, round((1000 - mean) / math.sqrt(var), 4))


def test_fixed_width_histogram(spark):
    """Uniform integers bin evenly; max value lands in the last bin;
    degenerate (constant) input takes bin 0."""
    from kubernetes_logs_datalake_spark.operators.profile import fixed_width_histogram

    df = spark.range(100).select(F.col("id").cast("double").alias("x"))
    out = {r.bin: r for r in fixed_width_histogram(df, "x", n_bins=10).collect()}
    assert len(out) == 10
    assert all(out[b].n == 10 for b in range(10))
    assert out[0].lo == 0.0 and out[9].hi == 99.0

    const = spark.createDataFrame([(5.0,)] * 7, "x double")
    rows = fixed_width_histogram(const, "x", n_bins=4).collect()
    assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n == 7


def test_exact_corr_known_values(spark):
    """Perfect positive / negative correlation and a known covariance."""
    from kubernetes_logs_datalake_spark.operators.profile import exact_corr

    rows = [("pos", float(i), 2.0 * i + 1) for i in range(10)]
    rows += [("neg", float(i), -3.0 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in exact_corr(df, "g", "x", "y").collect()}
    assert out["pos"].corr == 1.0 and out["neg"].corr == -1.0
    # population covariance of x with 2x+1 over 0..9 = 2 * var(x) = 2*8.25
    assert math.isclose(out["pos"].covar_pop, 16.5)


def test_tfidf_topk(spark):
    """Terms unique to a doc outrank corpus-wide terms; rank respects
    the (score desc, word) tiebreak; k bounds output per doc."""
    from kubernetes_logs_datalake_spark.functions.text import tfidf_topk

    docs = [
        (1, "common common unique1 unique1 unique1"),
        (2, "common unique2"),
        (3, "common filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_topk(df, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.word, r.tfidf))
    assert by_doc[1][0][1] == "unique1"  # tf=3, df=1 → top
    assert by_doc[2][0][1] == "unique2"
    assert all(len(v) <= 2 for v in by_doc.values())
    # 'common' appears in every doc → idf = ln(1) = 0
    assert all(s == 0.0 for d in by_doc.values() for rk, w, s in d if w == "common")


def test_zscore_degenerate_groups_no_ansi_crash(spark):
    """Constant-value and single-row groups have no definable deviation:
    they must yield zero outliers, not an ANSI DIVIDE_BY_ZERO abort."""
    from kubernetes_logs_datalake_spark.operators.profile import zscore_outliers

    df = spark.createDataFrame(
        [(1, "const", 5.0), (2, "const", 5.0), (3, "solo", 9.0)],
        ["id", "g", "v"],
    )
    assert zscore_outliers(df, "g", "v", "id").count() == 0


def test_exact_corr_degenerate_groups_null_not_crash(spark):
    """Constant x / single-row groups: corr is undefined → null."""
    from kubernetes_logs_datalake_spark.operators.profile import exact_corr

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 1.0), ("b", 3.0, 5.0)],
        ["g", "x", "y"],
    )
    rows = {r.g: r for r in exact_corr(df, "g", "x", "y").collect()}
    assert rows["a"].corr is None      # single row
    assert rows["b"].corr is None      # constant x


# ------------------------------------------------- count-min sketch


def test_cms_never_underestimates(spark):
    """CMS guarantee: est >= exact for every key, always."""
    from kubernetes_logs_datalake_spark.operators.sketch import cms_heavy_hitters

    rows = [(f"k{i % 37}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string")
    out = cms_heavy_hitters(df, "k", k=37, depth=4, width=16)  # heavy collisions
    got = out.collect()
    assert len(got) == 37
    assert all(r.est >= r.exact for r in got)
    assert all(r.overestimate == r.est - r.exact for r in got)


def test_cms_exact_when_width_ample(spark):
    """With width >> distinct keys and depth rows, collisions vanish
    and the estimate IS the exact count."""
    from kubernetes_logs_datalake_spark.operators.sketch import cms_heavy_hitters

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = {r.k: r for r in cms_heavy_hitters(df, "k", k=3, width=4096).collect()}
    assert {k: v.est for k, v in got.items()} == {"a": 5, "b": 3, "c": 1}
    assert all(v.overestimate == 0 for v in got.values())


def test_cms_sketch_state_is_bounded(spark):
    """The sketch table never exceeds depth x width rows regardless of
    input cardinality — the property that makes it the 100 TB path."""
    from kubernetes_logs_datalake_spark.operators.sketch import cms_sketch

    rows = [(str(i),) for i in range(5000)]  # 5000 distinct keys
    df = spark.createDataFrame(rows, "k string")
    sk = cms_sketch(df, "k", depth=3, width=32)
    assert sk.count() <= 3 * 32
    # total mass is conserved: every input row lands in every depth row
    assert sk.groupBy().sum("cnt").first()[0] == 3 * 5000


def test_cms_ranks_true_heavy_hitter_first_under_skew(spark):
    """The regime CMS is built for: one key with 10x the mass of the
    rest is ranked first even with a narrow sketch."""
    from kubernetes_logs_datalake_spark.operators.sketch import cms_heavy_hitters

    rows = [("hot",)] * 500 + [(f"c{i % 50}",) for i in range(500)]
    df = spark.createDataFrame(rows, "k string")
    top = cms_heavy_hitters(df, "k", k=5, depth=4, width=64).collect()
    assert top[0].k == "hot" and top[0].exact == 500


def test_cms_estimate_zero_for_unseen_keys(spark):
    """A key absent from the build corpus must estimate 0 (its empty
    counters cap the min), and must not vanish from the output."""
    from kubernetes_logs_datalake_spark.operators.sketch import (
        cms_estimate,
        cms_sketch,
    )

    built = spark.createDataFrame([("a",)] * 7 + [("b",)] * 2, "k string")
    sk = cms_sketch(built, "k", depth=4, width=4096)
    probes = spark.createDataFrame([("a",), ("never-seen",)], "k string")
    got = {r.k: r.est for r in cms_estimate(probes, sk, "k", 4, 4096).collect()}
    assert got == {"a": 7, "never-seen": 0}


def test_kmv_overlap_exact_below_k_and_accurate_above(spark):
    from kubernetes_logs_datalake_spark.operators.sketch import kmv_overlap

    # |A|=30, |B|=20, |A∩B|=10 -> exact path (all under k)
    a = spark.createDataFrame([(i,) for i in range(30)], "k long")
    b = spark.createDataFrame([(i,) for i in range(20, 40)], "k long")
    r = kmv_overlap(a, b, "k", "k", k=256).first()
    assert (r.est_a, r.est_b, r.est_union) == (30.0, 20.0, 40.0)
    assert r.est_intersection == 10.0
    assert abs(r.est_jaccard - 0.25) < 1e-9
    # estimator path: 2000/1000 keys with 500 shared, k=256
    big_a = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    big_b = spark.createDataFrame([(i,) for i in range(1500, 2500)], "k long")
    r2 = kmv_overlap(big_a, big_b, "k", "k", k=256).first()
    assert abs(r2.est_a - 2000) / 2000 < 0.2
    assert abs(r2.est_union - 2500) / 2500 < 0.2
    true_j = 500 / 2500
    assert abs(r2.est_jaccard - true_j) < 0.15


def test_cusum_matches_textbook_recursion(spark):
    """The prefix-min closed form must equal the literal
    s_i = max(0, s_{i-1} + x_i - target - slack) recursion."""
    from kubernetes_logs_datalake_spark.operators.profile import cusum_alerts

    xs = [5.0, 1.0, 1.0, 9.0, 1.0, 0.0, 0.0, 12.0]
    target, slack, h = 3.0, 0.5, 4.0
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, v double") \
        .withColumn("tgt", F.lit(target))
    got = {r.t: r for r in
           cusum_alerts(df, ["k"], "t", "v", "tgt", slack, h).collect()}
    s, want = 0.0, {}
    for i, x in enumerate(xs):
        s = max(0.0, s + x - target - slack)
        want[i] = s
    for i in want:
        assert abs(got[i].cusum - want[i]) < 1e-9, (i, got[i].cusum, want[i])
        assert got[i].alert == (round(want[i], 6) > h)
    # the detector resets after the drain (values below target)
    assert want[5] == 0.0 and got[5].cusum == 0.0
    assert got[7].alert  # and re-alerts on the fresh spike
