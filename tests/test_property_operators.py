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
