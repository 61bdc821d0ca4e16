"""Semantic tests for the training-data scrub/quality/packing
operators (cross-engine equality is covered by the oracle harness;
these pin meaning on hand-built inputs)."""

from __future__ import annotations

import math


def test_redact_pii_all_types(spark):
    """Each PII type is counted and replaced by its token; order
    matters — a URL containing digits must not leak into the phone
    pass."""
    from kubernetes_logs_datalake_spark.operators.scrub import redact_pii

    text = (
        "mail a@b.org or visit https://x.test/path?q=1 from 10.0.0.1 "
        "call +1 555 010 9999 done"
    )
    df = spark.createDataFrame([(1, text)], "id long, text string")
    r = redact_pii(df, "id", "text").collect()[0]
    assert (r.n_url, r.n_email, r.n_ip, r.n_phone) == (1, 1, 1, 1)
    assert r.redacted == "mail [EMAIL] or visit [URL] from [IP] call [PHONE] done"


def test_redact_pii_url_with_at_is_url(spark):
    """An @ inside a URL is consumed by the URL pass, not the email
    pass (registry order is the contract)."""
    from kubernetes_logs_datalake_spark.operators.scrub import redact_pii

    df = spark.createDataFrame(
        [(1, "see http://u@h.example/x rest")], "id long, text string"
    )
    r = redact_pii(df, "id", "text").collect()[0]
    assert r.redacted == "see [URL] rest"
    assert r.n_url == 1


def test_redact_pii_clean_text_unchanged(spark):
    from kubernetes_logs_datalake_spark.operators.scrub import redact_pii

    df = spark.createDataFrame([(1, "just words here")], "id long, text string")
    r = redact_pii(df, "id", "text").collect()[0]
    assert r.redacted == "just words here"
    assert (r.n_url, r.n_email, r.n_ip, r.n_phone) == (0, 0, 0, 0)


def test_word_repetition_profile(spark):
    """'a a a a b' → top word 4/5; top bigram 'a a' 3/4; repetitive."""
    from kubernetes_logs_datalake_spark.operators.scrub import (
        word_repetition_profile,
    )

    df = spark.createDataFrame(
        [(1, "a a a a b"), (2, "w x y z q r s t u v")], "id long, text string"
    )
    out = {r.id: r for r in word_repetition_profile(df, "id", "text").collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_distinct_words) == (5, 2)
    assert math.isclose(r1.top_word_frac, 0.8)
    assert math.isclose(r1.top_bigram_frac, 0.75)
    assert r1.repetitive
    r2 = out[2]
    assert r2.n_distinct_words == 10 and not r2.repetitive


def test_word_repetition_single_word_doc(spark):
    """One-word docs have no bigrams: frac 0, no sequence(1,0) blowup."""
    from kubernetes_logs_datalake_spark.operators.scrub import (
        word_repetition_profile,
    )

    df = spark.createDataFrame([(1, "solo")], "id long, text string")
    r = word_repetition_profile(df, "id", "text").collect()[0]
    assert (r.n_words, r.top_bigram_frac) == (1, 0.0)
    assert r.repetitive  # 1/1 = 100% top word


def test_pack_sequences_bins(spark):
    """Within a shard, bins fill to the budget with boundary overflow:
    tokens 3,3,3 at budget 5 → exclusive cumsums 0,3,6 → bins 0,0,1."""
    from kubernetes_logs_datalake_spark.operators.sampling import pack_sequences

    rows = [(0, "a b c"), (8, "d e f"), (16, "g h i")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in
           pack_sequences(df, "id", "text", budget=5, shards=8).collect()}
    assert all(out[i].shard == 0 for i in (0, 8, 16))
    assert (out[0].bin, out[8].bin, out[16].bin) == (0, 0, 1)


def test_pack_sequences_shards_independent(spark):
    """Docs in different shards pack independently from cumsum 0."""
    from kubernetes_logs_datalake_spark.operators.sampling import pack_sequences

    rows = [(0, "a b c d e f"), (1, "a b c d e f")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in
           pack_sequences(df, "id", "text", budget=4, shards=2).collect()}
    assert out[0].shard != out[1].shard
    assert out[0].bin == 0 and out[1].bin == 0


def test_decontaminate_flags_overlap(spark):
    """A train doc sharing an n-gram with eval is flagged; distinct
    shared grams are counted once each; clean docs get 0."""
    from kubernetes_logs_datalake_spark.operators.scrub import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "here the quick brown fox jumps again"),  # shares 3-grams
            (2, "completely different words entirely now"),
            (3, "the quick brown fox jumps the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           decontaminate(train, eval_df, "doc_id", "text", n=3).collect()}
    assert out[1].contaminated and out[1].n_hits == 3
    assert not out[2].contaminated and out[2].n_hits == 0
    # doc 3 repeats the eval text twice but shares the same 3 distinct
    # grams — counted once each
    assert out[3].n_hits == 3


def test_decontaminate_short_docs(spark):
    """Docs shorter than n grams produce no grams and are clean."""
    from kubernetes_logs_datalake_spark.operators.scrub import decontaminate

    eval_df = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    r = decontaminate(train, eval_df, "doc_id", "text", n=5).collect()[0]
    assert (r.n_hits, r.contaminated) == (0, False)


def test_curate_stage_attribution(spark):
    """Each failing stage is attributed: dup doc fails only dedup,
    contaminated doc fails only decontam, wrong-lang only lang."""
    from kubernetes_logs_datalake_spark.operators.curate import (
        curate,
        curation_summary,
    )

    good = "quick brown foxes jump over lazy dogs near the quiet river bank"
    eval_df = spark.createDataFrame(
        [(99, "unique eval phrase nobody else has anywhere", "en")],
        "doc_id long, text string, lang string",
    )
    train = spark.createDataFrame(
        [
            (1, good, "en"),                                   # kept
            (2, good, "en"),                                   # dup of 1
            (3, good, "de"),                                   # wrong lang (also dup!)
            (4, "unique eval phrase nobody else has anywhere today it is", "en"),  # contaminated
            (5, "spam spam spam spam spam spam", "en"),        # repetitive
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r for r in
           curate(train, eval_df, "doc_id", "text", lang_col="lang",
                  langs=("en",), quality_min=0.3, ngram=5).collect()}
    assert out[1].kept
    assert not out[2].pass_dedup and out[2].pass_lang
    assert not out[3].pass_lang
    assert not out[4].pass_decontam and out[4].pass_lang
    assert not out[5].pass_repetition
    assert not any(out[i].kept for i in (2, 3, 4, 5))

    s = curation_summary(
        curate(train, eval_df, "doc_id", "text", lang_col="lang",
               langs=("en",), quality_min=0.3, ngram=5)
    ).collect()[0]
    assert s.n_docs == 5
    assert s.fail_pass_lang == 1
    assert s.fail_kept == 4


def test_curate_keeps_empty_document_row(spark):
    """Punctuation-only documents have no repetition-profile row but
    must still appear in the verdict table (one row per document)."""
    from kubernetes_logs_datalake_spark.operators.curate import curate

    df = spark.createDataFrame(
        [(1, "normal words in a document", "en"), (2, "!!! ...", "en")],
        ["doc_id", "text", "lang"],
    )
    eval_df = spark.createDataFrame([(99, "held out eval text", "en")],
                                    ["doc_id", "text", "lang"])
    out = curate(df, eval_df, "doc_id", "text", lang_col="lang", langs=("en",))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].pass_repetition is True


# ------------------------------------------------------- k-anonymity


def test_k_anonymity_audit_flags_only_small_classes(spark):
    from kubernetes_logs_datalake_spark.operators.scrub import k_anonymity_audit

    rows = [(i, "en", "a") for i in range(10)] + [
        (10, "de", "a"), (11, "de", "a"), (12, "fr", "b")
    ]
    df = spark.createDataFrame(rows, "id long, lang string, src string")
    got = {(r.lang, r.src): r for r in
           k_anonymity_audit(df, ["lang", "src"], k=5).collect()}
    assert set(got) == {("de", "a"), ("fr", "b")}
    assert got[("de", "a")].n_rows == 2 and got[("de", "a")].deficit == 3
    assert got[("fr", "b")].n_rows == 1 and got[("fr", "b")].deficit == 4


def test_k_anonymize_suppress_nulls_violating_rows_only(spark):
    from kubernetes_logs_datalake_spark.operators.scrub import (
        k_anonymize_suppress,
    )

    rows = [(i, "en", "a") for i in range(10)] + [(10, "de", "b")]
    df = spark.createDataFrame(rows, "id long, lang string, src string")
    out = {r.id: r for r in
           k_anonymize_suppress(df, ["lang", "src"], k=5).collect()}
    assert len(out) == 11  # row count preserved
    assert out[10].lang is None and out[10].src is None
    assert out[0].lang == "en" and out[0].src == "a"
    # result is now k-anonymous: suppressed rows form their own class
    from kubernetes_logs_datalake_spark.operators.scrub import k_anonymity_audit
    df2 = spark.createDataFrame(list(out.values()), df.schema)
    viol = k_anonymity_audit(df2.filter("lang IS NOT NULL"),
                             ["lang", "src"], k=5).count()
    assert viol == 0
