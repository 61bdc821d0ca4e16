"""CRI partial-line reassembly, hashed linear classifier, semantic
decontamination, and k-means — unit/behavioral tests (the contract
queries cover engine parity; these cover semantics the oracles can't)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.classify import (
    default_weights,
    hashed_linear_score,
)
from kubernetes_logs_datalake_spark.sources.cri import join_partial_lines


def _lines(spark, rows):
    return spark.createDataFrame(
        rows,
        "namespace string, pod string, container string, stream string,"
        " time_ns long, logtag string, message string",
    )


def test_join_partial_lines_reassembles_and_flags(spark):
    df = _lines(
        spark,
        [
            # record 1: two P chunks + F
            ("d", "p1", "c", "stdout", 10, "P", "hel"),
            ("d", "p1", "c", "stdout", 11, "P", "lo "),
            ("d", "p1", "c", "stdout", 12, "F", "world"),
            # record 2: single full line
            ("d", "p1", "c", "stdout", 20, "F", "next"),
            # unterminated trailing run on another stream
            ("d", "p1", "c", "stderr", 30, "P", "tail-without-F"),
            # independent key
            ("d", "p2", "c", "stdout", 10, "F", "solo"),
        ],
    )
    out = {
        (r.pod, r.stream, r.time_ns): r
        for r in join_partial_lines(df).collect()
    }
    assert len(out) == 4
    r1 = out[("p1", "stdout", 10)]
    assert r1.message == "hello world" and r1.logtag == "F" and r1.n_chunks == 3
    assert out[("p1", "stdout", 20)].message == "next"
    r_tail = out[("p1", "stderr", 30)]
    assert r_tail.logtag == "P" and r_tail.message == "tail-without-F"
    assert out[("p2", "stdout", 10)].n_chunks == 1


def test_join_partial_lines_single_shuffle(spark):
    df = _lines(spark, [("d", "p", "c", "s", 1, "F", "x")])
    plan = (
        join_partial_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the groupBy key is a superset of the window partitioning, so the
    # window's exchange must be the ONLY one
    assert plan.count("Exchange") == 1


def test_hashed_linear_score_semantics(spark):
    w = default_weights(16)
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "???")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in hashed_linear_score(
            df, "doc_id", "text", dim=16, weights=w, bias=0.25
        ).collect()
    }
    # empty / punctuation-only docs score exactly the bias
    assert out[2].n_words == 0 and out[2].score == pytest.approx(0.25)
    assert out[3].n_words == 0 and out[3].score == pytest.approx(0.25)
    # manual recomputation of the hashed-bucket mean
    import hashlib

    def bucket(word):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % 16

    expect = 0.25 + (2 * w[bucket("alpha")] + w[bucket("beta")]) / 3
    assert out[1].n_words == 3
    assert out[1].score == pytest.approx(expect, abs=1e-9)
    assert out[1].keep == (expect > 0.0)


def test_hashed_linear_score_validates_weights(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hashed_linear_score(df, "doc_id", "text", dim=8, weights=[0.1] * 4)


def test_decontaminate_semantic_flags_close_vectors(spark):
    from kubernetes_logs_datalake_spark.operators.curate import (
        decontaminate_semantic,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),     # identical to benchmark vec
            (2, [0.9, 0.1]),     # close
            (3, [0.0, 1.0]),     # orthogonal — clean
        ],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: r
        for r in decontaminate_semantic(
            corpus, bench, "vec_id", "embedding", threshold=0.8
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1].max_cos == pytest.approx(1.0)
    assert got[1].n_matches == 1


def test_kmeans_converges_and_is_deterministic(spark):
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    # three well-separated blobs of 5 points each
    pts = []
    for b, center in enumerate([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]):
        for i in range(5):
            pts.append(
                (b * 5 + i, [center[0] + 0.1 * i, center[1] - 0.1 * i])
            )
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")

    def inertia(assigned):
        return assigned.agg(
            F.sum(F.col("dist") * F.col("dist"))
        ).first()[0]

    c1, a1 = kmeans_fit(df, "vec_id", "embedding", k=3, iters=1)
    c4, a4 = kmeans_fit(df, "vec_id", "embedding", k=3, iters=4)
    assert inertia(a4) <= inertia(a1) + 1e-9, "Lloyd iterations reduce inertia"
    # converged fit separates the three blobs exactly
    rows = a4.collect()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.vec_id // 5, set()).add(r.cluster)
    assert all(len(cs) == 1 for cs in by_blob.values())
    assert len({next(iter(cs)) for cs in by_blob.values()}) == 3
    # determinism: same centroids on a re-run
    c4b, _ = kmeans_fit(df, "vec_id", "embedding", k=3, iters=4)
    assert c4 == c4b


def test_kmeans_requires_k_rows(spark):
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        kmeans_fit(df, "vec_id", "embedding", k=3, iters=1)


def test_char_lm_scores_junk_higher(spark):
    from kubernetes_logs_datalake_spark.operators.textstats import (
        char_bigram_lm_score,
    )

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "the quick brown fox"),   # in-distribution
            (2, "zxq vjw qqz xjzv kqx"),  # junk under the model
            (3, "x"),                     # 1 char → no transitions
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in char_bigram_lm_score(train, score, "doc_id", "text").collect()
    }
    assert 3 not in out, "docs without transitions are excluded"
    assert out[2].avg_nll_bits > out[1].avg_nll_bits, (
        "junk text must score higher NLL than in-distribution text"
    )
    assert out[1].n_transitions == len("the quick brown fox") - 1


def test_duplicate_spans_merges_islands(spark):
    from kubernetes_logs_datalake_spark.operators.textstats import (
        duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, "unique one two three " + shared + " tail words here"),
            (2, shared),
            (3, "completely different text with no overlap at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in duplicate_spans(df, "doc_id", "text", n=8).collect()
    }
    assert 3 not in out
    # doc 2 is exactly the shared run: 10 words → windows at 0,1,2 merge
    # into one span [0, 10)
    assert (out[2].span_start, out[2].span_end, out[2].n_windows) == (0, 10, 3)
    # doc 1 has the shared run offset by 4 leading words
    assert (out[1].span_start, out[1].span_end) == (4, 14)
