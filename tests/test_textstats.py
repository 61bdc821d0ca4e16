"""Text-statistics operators: token entropy, OOV rate, segment dedup,
int8 embedding quantization."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.scrub import segment_dedup
from kubernetes_logs_datalake_spark.operators.textstats import (
    oov_rate,
    token_entropy,
)
from kubernetes_logs_datalake_spark.operators.vectors import quantize_int8


def test_token_entropy_hand_computed(spark):
    d = spark.createDataFrame(
        [
            (1, "a a b b"),            # uniform 2 words -> H = 1 bit
            (2, "a a a a"),            # single word -> H = 0
            (3, "a b c d"),            # uniform 4 -> H = 2 bits
            (4, ""),                   # empty -> nulls
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(d, "doc_id", "text").collect()}
    assert out[1].entropy == 1.0 and out[1].ttr == 0.5
    assert out[2].entropy == 0.0 and out[2].n_types == 1
    assert out[3].entropy == 2.0 and out[3].ttr == 1.0
    assert out[4].entropy is None and out[4].n_tokens is None
    # mixed distribution: p = (1/2, 1/4, 1/4)
    d2 = spark.createDataFrame([(1, "x x y z")], "doc_id long, text string")
    h = token_entropy(d2, "doc_id", "text").collect()[0].entropy
    expect = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))
    assert abs(h - expect) < 1e-6


def test_oov_rate_against_vocab(spark):
    docs = spark.createDataFrame(
        [(1, "cat dog cat bird"), (2, "cat cat cat cat")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame([("cat",), ("dog",)], "word string")
    out = {r.doc_id: r for r in
           oov_rate(docs, "doc_id", "text", vocab).collect()}
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert out[1].oov_rate == 0.25
    assert out[2].n_oov == 0 and out[2].oov_rate == 0.0


def test_segment_dedup_drops_repeats_keeps_first(spark):
    boiler = "alpha beta gamma"  # 3-word boilerplate segment
    d = spark.createDataFrame(
        [
            (1, f"{boiler} one two three"),
            (2, f"{boiler} four five six"),   # repeats doc 1's segment
            (3, "seven eight nine"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           segment_dedup(d, "doc_id", "text", seg_words=3).collect()}
    assert out[1].n_segs == 2 and out[1].n_dup_segs == 0
    assert out[1].clean_text == f"{boiler} one two three"
    # doc 2 loses the boilerplate but keeps its unique tail
    assert out[2].n_dup_segs == 1
    assert out[2].clean_text == "four five six"
    assert out[3].n_dup_segs == 0 and out[3].clean_text == "seven eight nine"
    assert out[4].n_segs == 0 and out[4].clean_text == ""


def test_segment_dedup_intra_doc_repeat(spark):
    d = spark.createDataFrame(
        [(1, "a b c a b c x y z")], "doc_id long, text string"
    )
    r = segment_dedup(d, "doc_id", "text", seg_words=3).collect()[0]
    assert r.n_segs == 3 and r.n_dup_segs == 1
    assert r.clean_text == "a b c x y z"


def test_quantize_int8_error_bound_and_reconstruction(spark):
    d = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),     # zero vector -> scale 1, q=0
            (3, [127.0]),                  # exact max -> q = 127
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in
           quantize_int8(d, "vec_id", "embedding").collect()}
    # |err| <= scale/2 by construction
    for vid, r in out.items():
        assert r.max_abs_err <= r.scale / 2 + 1e-6, vid
    assert out[1].qvec[1] == -127  # amax element quantizes to +/-127
    assert out[2].scale == 1.0 and out[2].qvec == [0, 0, 0, 0]
    assert out[2].mse == 0.0
    assert out[3].qvec == [127]
    # round-trip: dequantized values close to originals
    r1 = out[1]
    deq = [q * r1.scale for q in r1.qvec]
    for orig, back in zip([0.5, -1.0, 0.25, 0.0], deq):
        assert abs(orig - back) <= r1.scale / 2 + 1e-6


def test_entropy_flags_low_diversity(spark):
    """Repetitive spam has lower entropy than natural-ish text of the
    same length."""
    d = spark.createDataFrame(
        [(1, "buy now buy now buy now buy now"),
         (2, "the quick brown fox jumps over a lazy dog")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(d, "doc_id", "text").collect()}
    assert out[1].entropy < out[2].entropy


def test_ngram_novelty_shared_vs_unique(spark):
    """Doc 1 and 2 share their entire text (every 2-gram df=2 → novelty
    0); doc 3 is disjoint (novelty 1)."""
    from kubernetes_logs_datalake_spark.operators.textstats import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in ngram_novelty(df, "doc_id", "text", n=2).collect()}
    assert rows[1].n_grams == 3 and rows[1].n_novel == 0 and rows[1].novelty == 0.0
    assert rows[2].novelty == 0.0
    assert rows[3].n_grams == 3 and rows[3].n_novel == 3 and rows[3].novelty == 1.0


def test_quality_keep_prefers_longest_member(spark):
    """Cluster {1,2,3} (chained near-dups): the longest doc wins keep;
    singleton non-dup docs don't appear."""
    from kubernetes_logs_datalake_spark.operators.dedup import quality_keep
    from kubernetes_logs_datalake_spark.functions.text import token_count

    base = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " eleven"),           # superset: highest quality
            (3, base),
            (9, "totally different content here"),
        ],
        ["doc_id", "text"],
    )
    from kubernetes_logs_datalake_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.8)
    out = quality_keep(df, pairs, "doc_id", token_count("text"))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].keep is True and rows[2].quality == 11
    assert rows[1].keep is False and rows[3].keep is False
    assert all(r.component == 1 for r in rows.values())


def test_portable_base_hash_matches_python_md5(spark):
    """portable_base_hash must equal int(md5(s)[:15], 16) — the property
    all three portable-family oracles (minhash/simhash/ann) rest on.
    Checked over varied unicode/edge strings in one batch."""
    import hashlib

    from kubernetes_logs_datalake_spark.operators.dedup import portable_base_hash

    samples = [
        "", "a", "hello world", "ümlaut ø unicode ✓", "0" * 500,
        "word1 word2", "ALLCAPS", "\ttab\nnewline", "日本語テキスト",
        "mixed 123 числа", " leading", "trailing ", "a b c d e f g",
    ] + [f"doc-{i}-{'x' * (i % 37)}" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = {r.s: r.h for r in df.select("s", portable_base_hash("s").alias("h")).collect()}
    for s in samples:
        expect = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        assert got[s] == expect, f"mismatch for {s!r}"


def test_quantize_int8_empty_vector_no_crash(spark):
    """A zero-length embedding must quantize to nulls, not raise
    DIVIDE_BY_ZERO in the mse denominator under ANSI mode."""
    from kubernetes_logs_datalake_spark.operators.vectors import quantize_int8

    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [])], "id long, vec array<float>"
    )
    rows = {r.id: r for r in quantize_int8(df, "id", "vec").collect()}
    assert rows[1].qvec == [127, -64]
    assert rows[2].mse is None and rows[2].qvec == []


# ------------------------------------------------------- readability


def test_readability_hand_computed(spark):
    from kubernetes_logs_datalake_spark.functions.text import readability_scores

    # "the cat sat. the dog ran!" -> 2 sentences, 6 words, 6 syllables
    # flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    df = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!"), (2, ""), (3, "xyzzy crwth")],
        "doc_id long, text string",
    )
    cols = readability_scores(F.col("text"))
    got = {r.doc_id: r for r in
           df.select("doc_id", *[c.alias(n) for n, c in cols.items()]).collect()}
    r1 = got[1]
    assert (r1.n_sentences, r1.n_words, r1.n_syllables) == (2, 6, 6)
    assert abs(r1.flesch - 119.19) < 1e-9
    # empty text: zero words, NULL score, sentence floor of 1
    assert got[2].n_words == 0 and got[2].flesch is None
    # 'y' is in the vowel class (xyzzy -> 2 groups); vowel-less words
    # floor at 1 (crwth -> 1)
    assert got[3].n_syllables == 3
