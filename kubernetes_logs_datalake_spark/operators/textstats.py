"""Corpus statistics operators for training-data quality signals:
word-distribution entropy and out-of-vocabulary rate.

Both are explode → partial-agg pipelines over the shared ``words()``
tokenizer — pure JVM column expressions, no Python UDFs, and every
aggregation combines map-side so the only shuffles are on (doc, word)
and doc keys (never a global window). Semantics are deliberately
ANSI-SQL-expressible so the DuckDB oracle can verify them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_entropy(
    df: DataFrame, id_col: str, text_col: str, scale: int = 6
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the word distribution and
    type-token ratio — the "natural text vs boilerplate/spam" quality
    signal complementary to the Gopher repetition profile (low entropy
    = dominated by few words; TTR near 1 = no repetition at all, often
    keyword-stuffing). Output: (id, n_tokens, n_types, entropy, ttr);
    documents with zero tokens get nulls.

    Uses the one-pass identity H = log2(n) − (Σ c·log2 c)/n so entropy
    is a plain aggregate over per-word counts. The Σ term is summed as
    DECIMAL(25,12) (order-independent — double summation order varies
    with partitioning) with one double division at the end, the repo's
    exact-sum recipe.
    """
    from kubernetes_logs_datalake_spark.functions.text import words

    tok = df.select(
        F.col(id_col), F.explode(words(text_col)).alias("_word")
    ).filter(F.col("_word") != "")
    wc = tok.groupBy(id_col, "_word").agg(F.count("*").alias("_c"))
    per_doc = wc.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(
            (F.col("_c") * F.log2("_c")).cast("decimal(25,12)")
        ).alias("_clogc"),
    )
    n = F.col("n_tokens")
    stats = per_doc.select(
        F.col(id_col),
        "n_tokens",
        "n_types",
        F.round(
            F.log2(n) - F.col("_clogc").cast("double") / n, scale
        ).alias("entropy"),
        F.round(F.col("n_types").cast("double") / n, scale).alias("ttr"),
    )
    return df.select(F.col(id_col)).join(stats, id_col, "left")


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    word_col: str = "word",
    scale: int = 6,
) -> DataFrame:
    """Per-document out-of-vocabulary token rate against a vocabulary
    table (e.g. :func:`~kubernetes_logs_datalake_spark.operators.
    sampling.vocab_topk` output) — the tokenizer-coverage check run
    before committing a vocab. Output: (id, n_tokens, n_oov, oov_rate).

    Plan: explode → broadcast left join against the vocab (vocabularies
    are ≤ a few hundred thousand rows — always the broadcast side; the
    exploded corpus never shuffles for the join) → one partial-agg
    shuffle on the id.
    """
    from kubernetes_logs_datalake_spark.functions.text import words

    tok = df.select(
        F.col(id_col), F.explode(words(text_col)).alias("_word")
    ).filter(F.col("_word") != "")
    v = F.broadcast(
        vocab.select(F.col(word_col).alias("_vword")).distinct()
    )
    joined = tok.join(v, tok["_word"] == v["_vword"], "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("_vword").isNull(), 1).otherwise(0)).alias(
            "n_oov"
        ),
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        "n_oov",
        F.round(
            F.col("n_oov").cast("double") / F.col("n_tokens"), scale
        ).alias("oov_rate"),
    )
