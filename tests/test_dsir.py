"""Tests: DSIR importance weighting (hashed n-gram log-likelihood
ratio vs a target corpus) and its Gumbel resample step."""

from __future__ import annotations

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.dsir import (
    dsir_resample,
    dsir_weights,
    hashed_grams,
)


def _corpus(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog sat on the log", "en"),
        (3, "der hund sitzt auf dem baum", "de"),
        (4, "le chat est sur le tapis", "fr"),
        (5, "the cat and the dog sat", "en"),
        (6, "", "en"),  # empty text -> zero features, weight 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_weights_separate_target_from_offtarget(spark):
    d = _corpus(spark)
    target = d.filter(F.col("lang") == "en")
    w = {r.doc_id: r for r in
         dsir_weights(target, d, "doc_id", "text", buckets=128).collect()}
    assert set(w) == {1, 2, 3, 4, 5, 6}
    # every English doc must outscore every non-English doc
    en = [w[i].log_weight for i in (1, 2, 5)]
    off = [w[i].log_weight for i in (3, 4)]
    assert min(en) > max(off)
    # empty doc: no features, neutral weight
    assert w[6].n_feats == 0 and w[6].log_weight == 0.0


def test_dsir_weights_cover_every_raw_doc(spark):
    d = _corpus(spark)
    target = d.filter(F.col("lang") == "en")
    out = dsir_weights(target, d, "doc_id", "text", buckets=64)
    assert out.count() == d.count()


def test_hashed_grams_bucket_range_and_counts(spark):
    d = _corpus(spark).filter("doc_id = 1")  # 6 words -> 6 uni + 5 bi
    g = hashed_grams(d, "doc_id", "text", n=2, buckets=32).collect()
    assert len(g) == 11
    assert all(0 <= r.bucket < 32 for r in g)


def test_dsir_resample_is_deterministic_topk(spark):
    d = _corpus(spark)
    target = d.filter(F.col("lang") == "en")
    w = dsir_weights(target, d, "doc_id", "text", buckets=128)
    a = [r.doc_id for r in dsir_resample(w, "doc_id", k=3).collect()]
    b = [r.doc_id for r in dsir_resample(w, "doc_id", k=3).collect()]
    assert a == b and len(a) == 3


def test_dsir_model_is_broadcast_and_scoring_has_no_wide_shuffle(spark):
    d = _corpus(spark)
    target = d.filter(F.col("lang") == "en")
    plan = dsir_weights(target, d, "doc_id", "text", buckets=128)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dsir_condition_path_matches_two_corpus_path(spark):
    """The one-pass target_condition path must produce byte-identical
    weights to the explicit (target, raw) path."""
    d = _corpus(spark)
    two = dsir_weights(
        d.filter(F.col("lang") == "en"), d, "doc_id", "text", buckets=128
    ).collect()
    one = dsir_weights(
        None, d, "doc_id", "text", buckets=128,
        target_condition=F.col("lang") == "en",
    ).collect()
    assert sorted(map(tuple, two)) == sorted(map(tuple, one))
