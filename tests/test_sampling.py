"""Deterministic sampling / mixing / vocab / binning operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.sampling import (
    hash_rate_threshold,
    hash_sample,
    length_bins,
    mix_datasets,
    stratified_sample,
    vocab_topk,
)

SF = "/root/testdata/sf0.001"


def test_stratified_sample_exact_k_and_deterministic(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = stratified_sample(d.select("doc_id", "lang"), "lang", "doc_id", k=3)
    per = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per and all(n == 3 for n in per.values())
    # repartitioning must not change the selection
    s2 = stratified_sample(
        d.select("doc_id", "lang").repartition(13), "lang", "doc_id", k=3
    )
    assert {r.doc_id for r in s1.collect()} == {r.doc_id for r in s2.collect()}


def test_hash_sample_rate_monotone_and_stable(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    n = d.count()
    small = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).collect()}
    big = {r.doc_id for r in hash_sample(d, "doc_id", 0.6).collect()}
    # nested thresholds → nested samples (stable train/holdout splits)
    assert small <= big
    assert 0.05 * n < len(small) < 0.4 * n
    assert 0.4 * n < len(big) < 0.8 * n
    # determinism across partitionings
    again = {r.doc_id for r in hash_sample(d.repartition(7), "doc_id", 0.2).collect()}
    assert again == small


def test_hash_rate_threshold_bounds():
    assert hash_rate_threshold(0.0) == "00000000"
    # 1.0 must compare ABOVE any 8-hex md5 prefix; the naive 9-char
    # "100000000" sorts below "2xxxxxxx" and would drop ~94% of rows
    assert "ffffffff" < hash_rate_threshold(1.0)
    with pytest.raises(ValueError):
        hash_rate_threshold(1.5)


def test_hash_sample_rate_one_keeps_everything(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    assert hash_sample(d, "doc_id", 1.0).count() == d.count()
    with pytest.raises(ValueError):
        hash_sample(d, "doc_id", 1.5)


def test_mix_datasets_weights(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    en = d.filter(F.col("lang") == "en")
    rest = d.filter(F.col("lang") != "en")
    mixed = mix_datasets([(en, 1.0), (rest, 1.0)], "doc_id")
    assert mixed.count() == d.count()  # rate 1.0 keeps everything
    downs = mix_datasets([(en, 0.0), (rest, 1.0)], "doc_id")
    assert downs.filter(F.col("lang") == "en").count() == 0
    assert downs.count() == rest.count()


def test_vocab_topk_counts(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "beta gamma!")], ["doc_id", "text"]
    )
    got = [(r.word, r.n) for r in vocab_topk(docs, "text", k=2).collect()]
    assert got == [("beta", 3), ("alpha", 1)]


def test_length_bins_approx_tracks_exact(spark):
    """The sketch-based binning must agree with the exact ntile oracle
    for the overwhelming majority of rows (disagreement only at bin
    boundaries/ties)."""
    from kubernetes_logs_datalake_spark.operators.sampling import length_bins_approx

    d = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {r.doc_id: r.bin for r in length_bins(d, "doc_id", "text", 4).collect()}
    approx = {
        r.doc_id: r.bin
        for r in length_bins_approx(d, "doc_id", "text", 4, relative_error=0.001).collect()
    }
    assert set(exact) == set(approx)
    agree = sum(1 for k in exact if exact[k] == approx[k]) / len(exact)
    assert agree >= 0.9, f"approx binning agreement {agree:.2f}"
    # never off by more than one bin
    assert all(abs(exact[k] - approx[k]) <= 1 for k in exact)


def test_length_bins_equal_frequency(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(8)], ["doc_id", "text"]
    )
    rows = length_bins(docs, "doc_id", "text", n_bins=4).collect()
    sizes = {}
    for r in rows:
        sizes[r.bin] = sizes.get(r.bin, 0) + 1
    assert sizes == {1: 2, 2: 2, 3: 2, 4: 2}
    # longer docs land in higher bins
    by_id = {r.doc_id: r.bin for r in rows}
    assert by_id[0] == 1 and by_id[7] == 4


def test_token_budget_allocation_math(spark):
    """Hand-checked allocation: equal weights, one under-supplied source
    (epochs 2) and one over-supplied (sample_rate < 1)."""
    from kubernetes_logs_datalake_spark.operators.sampling import (
        token_budget_allocation,
    )

    rows = [(i, "big", "w " * 50) for i in range(20)]          # 1000 tokens
    rows += [(100 + i, "small", "w " * 10) for i in range(5)]  # 50 tokens
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r.source: r
        for r in token_budget_allocation(
            df, "source", "text", {"big": 1.0, "small": 1.0}, 160
        ).collect()
    }
    big, small = out["big"], out["small"]
    assert big.tokens_available == 1000 and small.tokens_available == 50
    assert big.target_tokens == 80 and small.target_tokens == 80
    assert big.sample_rate == 0.08 and big.epochs == 1
    assert small.sample_rate == 1.0 and small.epochs == 2


def test_token_budget_missing_and_empty_sources(spark):
    """A weighted source with no rows still gets its allocation row
    (0 available, rate 0, epochs 0) — silent under-allocation is the
    worst mix-plan failure; empty-text sources don't divide by zero."""
    from kubernetes_logs_datalake_spark.operators.sampling import (
        token_budget_allocation,
    )

    df = spark.createDataFrame(
        [(1, "web", "some words here"), (2, "junk", "!!! ...")],
        ["doc_id", "source", "text"],
    )
    out = {
        r.source: r
        for r in token_budget_allocation(
            df, "source", "text", {"web": 1.0, "code": 1.0, "junk": 1.0}, 300
        ).collect()
    }
    assert set(out) == {"web", "code", "junk"}
    assert out["code"].n_docs == 0 and out["code"].tokens_available == 0
    assert out["code"].sample_rate == 0.0 and out["code"].epochs == 0
    assert out["junk"].tokens_available == 0 and out["junk"].epochs == 0
    assert out["web"].epochs >= 1


# --------------------------------------------- weighted (A-ES) sampling


def test_weighted_sample_exact_k_per_stratum(spark):
    from kubernetes_logs_datalake_spark.operators.sampling import weighted_sample

    rows = [(i, "a" if i < 40 else "b", float(1 + i % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, s string, w double")
    out = weighted_sample(df, "s", "id", "w", k=10)
    got = out.groupBy("s").count().collect()
    assert {r.s: r["count"] for r in got} == {"a": 10, "b": 10}


def test_weighted_sample_small_stratum_returns_all(spark):
    from kubernetes_logs_datalake_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "x", 1.0)], "id long, s string, w double"
    )
    assert weighted_sample(df, "s", "id", "w", k=10).count() == 2


def test_weighted_sample_prefers_heavy_rows(spark):
    """With one row weighted 10^6x the others, it is (essentially)
    always selected: u^(1/w) -> 1 as w grows, for any fixed u."""
    from kubernetes_logs_datalake_spark.operators.sampling import weighted_sample

    rows = [(i, "s", 1.0) for i in range(100)] + [(999, "s", 1e6)]
    df = spark.createDataFrame(rows, "id long, s string, w double")
    picked = {r.id for r in weighted_sample(df, "s", "id", "w", k=5).collect()}
    assert 999 in picked


def test_weighted_sample_deterministic_and_zero_weight_last(spark):
    from kubernetes_logs_datalake_spark.operators.sampling import weighted_sample

    rows = [(1, "s", 0.0), (2, "s", 0.0), (3, "s", 1.0)]
    df = spark.createDataFrame(rows, "id long, s string, w double")
    a = sorted(r.id for r in weighted_sample(df, "s", "id", "w", k=2).collect())
    b = sorted(r.id for r in weighted_sample(df, "s", "id", "w", k=2).collect())
    assert a == b
    assert 3 in a  # the only positive-weight row always wins a slot
