"""Tests: Bloom-filter semi-join pruning (no false negatives, measured
false positives, map-only membership plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.bloom import (
    bloom_build,
    bloom_prune_audit,
    bloom_semi_filter,
)


def test_bloom_no_false_negatives(spark):
    dim = spark.createDataFrame([(i,) for i in range(50)], "k long")
    words = bloom_build(dim, "k", num_bits=256, num_hashes=3)
    fact = spark.createDataFrame([(i,) for i in range(200)], "k long")
    passed = {r.k for r in bloom_semi_filter(fact, "k", words, 3, 256).collect()}
    assert set(range(50)) <= passed  # every true member passes


def test_bloom_filters_most_nonmembers_when_sized(spark):
    dim = spark.createDataFrame([(i,) for i in range(20)], "k long")
    words = bloom_build(dim, "k", num_bits=1 << 12, num_hashes=4)
    fact = spark.createDataFrame([(i,) for i in range(20, 2020)], "k long")
    n_fp = bloom_semi_filter(fact, "k", words, 4, 1 << 12).count()
    # m=4096, n=20, k=4 -> theoretical fp ~ (1-e^(-80/4096))^4 ~ 1.4e-7
    assert n_fp <= 2


def test_bloom_audit_columns_are_consistent(spark):
    dim = spark.createDataFrame([(i,) for i in range(10)], "k long")
    fact = spark.createDataFrame(
        [(i % 40,) for i in range(400)], "fk long"
    )
    row = bloom_prune_audit(fact, dim, "fk", "k", num_bits=128, num_hashes=2) \
        .first()
    assert row.n_fact == 400
    assert row.n_match == 100  # keys 0..9 hit 10 times each
    assert row.n_pass_bloom >= row.n_match
    assert row.n_false_positive == row.n_pass_bloom - row.n_match


def test_bloom_membership_is_map_only(spark):
    dim = spark.createDataFrame([(i,) for i in range(10)], "k long")
    words = bloom_build(dim, "k", num_bits=256, num_hashes=2)
    fact = spark.createDataFrame([(i,) for i in range(100)], "k long")
    plan = bloom_semi_filter(fact, "k", words, 2, 256)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "EvalPython" not in plan
