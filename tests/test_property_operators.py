"""Property-based parity: the repo's fold/closed-form operators vs
plain-Python references over randomized inputs — each example carries a
batch (one Spark job per example is the expensive part)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

word = st.text(alphabet="ab", min_size=1, max_size=6)


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


@settings(max_examples=5, deadline=None)
@given(st.lists(word, min_size=5, max_size=30))
def test_bpe_merge_fold_matches_python_greedy(spark, ws):
    """aggregate-fold merge application == the left-to-right greedy
    reference, for every word over a 2-letter alphabet (maximal
    adjacent-merge interactions) and every observed adjacent pair."""
    from kubernetes_logs_datalake_spark.operators.bpe import merge_fold

    syms_rows = [(list(w) + ["</w>"],) for w in ws]
    # pick the pair to merge from the data itself: first word's first
    # adjacent pair (deterministic given the example)
    first = syms_rows[0][0]
    a, b = first[0], first[1]
    df = spark.createDataFrame(syms_rows, "syms array<string>")
    got = [r.m for r in df.select(merge_fold(F.col("syms"), a, b).alias("m")).collect()]
    want = [_py_merge(s[0], a, b) for s in syms_rows]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
                min_size=3, max_size=40))
def test_cusum_closed_form_matches_recursion(spark, xs):
    from kubernetes_logs_datalake_spark.operators.profile import cusum_alerts

    target, slack = 10.0, 0.5
    rows = [(1, i, round(x, 4)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k long, t long, v double") \
        .withColumn("tgt", F.lit(target))
    got = {r.t: r.cusum for r in
           cusum_alerts(df, ["k"], "t", "v", "tgt", slack, 1e9).collect()}
    s = 0.0
    for i, x in enumerate(xs):
        # mirror the operator's per-point rounding of the deviation
        s = max(0.0, s + round(round(x, 4) - target - slack, 6))
        assert abs(got[i] - s) < 1e-6, (i, got[i], s)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=60, unique=True))
def test_weighted_sample_keys_match_python_aes(spark, ids):
    """The Spark A-ES selection == the Python reference computing the
    same md5-uniform and ln(u)/w keys (weight = id%7+1)."""
    import hashlib
    import math

    from kubernetes_logs_datalake_spark.operators.sampling import weighted_sample

    k = 5
    rows = [(i, "s", float(i % 7 + 1)) for i in ids]
    df = spark.createDataFrame(rows, "id long, s string, w double")
    got = sorted(r.id for r in weighted_sample(df, "s", "id", "w", k=k).collect())

    def key(i: int, w: float) -> float:
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) + 0.5) / 16**8
        return round(math.log(u) / w, 12)

    want = sorted(
        i for i, _, w in sorted(rows, key=lambda r: (-key(r[0], r[2]), r[0]))[:k]
    )
    assert got == want


# ------------------------------------------------- round-6 properties


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
             max_size=60, unique=True)
)
def test_hash_split_total_and_reference_parity(spark, ids):
    """Every id is assigned exactly one split, and the assignment
    equals the hashlib reference — for arbitrary id sets."""
    import hashlib

    from kubernetes_logs_datalake_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}

    def expect(i):
        frac = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 16**8
        return "train" if frac < 0.90 else ("val" if frac < 0.95 else "test")

    assert got == {i: expect(i) for i in ids}


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.sampled_from(["en", "de", "sw", "fr"]), min_size=2,
             max_size=80).filter(lambda xs: len(set(xs)) >= 2),
    st.floats(min_value=0.1, max_value=1.0),
)
def test_temperature_rates_are_a_distribution(spark, langs, alpha):
    """For any group mix and any α ∈ (0,1]: rates sum to 1 (±rounding),
    every rate is positive, and rank order of shares is preserved."""
    from kubernetes_logs_datalake_spark.operators.sampling import (
        temperature_mix_rates,
    )

    df = spark.createDataFrame([(x,) for x in langs], "lang string")
    rows = temperature_mix_rates(df, "lang", alpha=float(alpha)).collect()
    total = sum(r.rate for r in rows)
    assert abs(total - 1.0) < 1e-4 * len(rows)
    assert all(r.rate > 0 for r in rows)
    by_share = sorted(rows, key=lambda r: (-r.share, r.lang))
    by_rate = sorted(rows, key=lambda r: (-r.rate, r.lang))
    assert [r.lang for r in by_share] == [r.lang for r in by_rate]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  width=32),
        min_size=3, max_size=40,
    )
)
def test_mad_outliers_matches_python_reference(spark, vals):
    """The exact-element median/MAD verdict equals a plain-Python
    replica of the same rank formula, for arbitrary value sets."""
    import math

    from kubernetes_logs_datalake_spark.operators.profile import mad_outliers

    rows = [(1, i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, id int, v double")
    got = sorted(r.id for r in mad_outliers(df, "g", "id", "v", k=3.0).collect())

    def pick_median(xs):
        s = sorted(xs)
        return s[max(math.ceil(0.5 * len(s)), 1) - 1]

    med = pick_median([float(v) for v in vals])
    devs = [round(abs(float(v) - med), 6) for v in vals]
    mad = pick_median(devs)
    want = sorted(i for i, d in enumerate(devs) if d > 3.0 * mad)
    assert got == want
