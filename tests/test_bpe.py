"""Tests: on-engine BPE tokenizer training (Sennrich-style merge
learning over the word-frequency table) and its apply side."""

from __future__ import annotations

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.bpe import (
    bpe_learn,
    bpe_token_counts,
    merge_fold,
    word_vocab,
)


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower newest newest"),
         (3, "newest newest newest newest widest widest widest")],
        "doc_id long, text string",
    )


def test_bpe_learns_textbook_merges(spark):
    """The classic low/lower/newest/widest corpus: highest-frequency
    pair is (e,s) from 6x newest + 3x widest, then es+t, est+</w>."""
    merges, _ = bpe_learn(_corpus(spark), "text", num_merges=3)
    assert [(a, b) for a, b, _ in merges] == [
        ("e", "s"), ("es", "t"), ("est", "</w>")
    ]
    assert [f for _, _, f in merges] == [9, 9, 9]


def test_bpe_token_count_decreases_with_merges(spark):
    d = _corpus(spark)
    base = {r.doc_id: r.n_tokens_bpe for r in
            bpe_token_counts(d, "doc_id", "text",
                             bpe_learn(d, "text", 0)[1]).collect()}
    merged = {r.doc_id: r.n_tokens_bpe for r in
              bpe_token_counts(d, "doc_id", "text",
                               bpe_learn(d, "text", 8)[1]).collect()}
    assert all(merged[k] <= base[k] for k in base)
    assert sum(merged.values()) < sum(base.values())
    # 0 merges == chars + </w> per word
    assert base[1] == 5 * 4  # "low" -> l,o,w,</w> five times


def test_bpe_fully_merged_vocab_stops_gracefully(spark):
    """More merges than pairs: the sentinel no-ops keep iteration count
    fixed and the reported merges list stops at the real ones."""
    df = spark.createDataFrame([(1, "aa aa")], "doc_id long, text string")
    merges, vocab = bpe_learn(df, "text", num_merges=10)
    # "aa" -> a,a,</w>: ties (a,a) vs (a,</w>) break lexicographically
    # on b ('<' < 'a'), so (a,</w>) merges first, then (a,a</w>)
    assert [(a, b) for a, b, _ in merges] == [("a", "</w>"), ("a", "a</w>")]
    syms = vocab.select("syms").first()[0]
    assert syms == ["aa</w>"]


def test_merge_fold_greedy_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(merge_fold(F.col("syms"), "a", "a").alias("m")).first()[0]
    assert out == ["aa", "a"]  # merged pair not re-merged with next


def test_word_vocab_counts_and_end_marker(spark):
    df = spark.createDataFrame([(1, "cat cat dog")], "doc_id long, text string")
    rows = {r.word: r for r in word_vocab(df, "text").collect()}
    assert rows["cat"].cnt == 2 and rows["dog"].cnt == 1
    assert rows["cat"].syms == ["c", "a", "t", "</w>"]
