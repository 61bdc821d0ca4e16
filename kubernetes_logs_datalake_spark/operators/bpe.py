"""Byte-pair-encoding tokenizer training ON the engine (Sennrich et
al. 2016, arXiv:1508.07909) — learn merge rules from the corpus, then
tokenize with them, all as DataFrame ops.

The scale insight is the classic one: BPE never iterates over the
corpus — it iterates over the **word-frequency table**. The corpus
pays exactly one shuffle (word counts); every merge iteration then
runs on the vocabulary (thousands of rows, not billions):

- **learn**: per iteration, explode adjacent symbol pairs weighted by
  word frequency, pick the most frequent pair (ties: lexicographic —
  deterministic), and rewrite the vocabulary's symbol arrays with one
  greedy left-to-right fold (``F.aggregate`` — no UDF). One tiny
  shuffle + a 1-row driver fetch per merge; ``localCheckpoint``
  truncates the growing lineage.
- **apply**: tokenizing the corpus is a broadcast join against the
  final word→symbols vocabulary — map-only on the corpus side. Words
  outside the training vocabulary fall back to character count + 1
  (every symbol unmerged), the untrained-word behavior.

Every step is deterministic integer/string algebra, so the whole
pipeline — including the 20 data-dependent merge iterations — unrolls
into a DuckDB oracle (``list_reduce`` mirrors the greedy fold; see
``_ddb_bpe_ctes`` in ``__spark_entry__.py``) and is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.text import words

END_MARK = "</w>"
# sentinel merge used when an iteration finds no pair to merge (fully
# merged vocabulary); matches nothing, so later iterations are no-ops —
# this keeps the iteration count FIXED, which is what lets the oracle
# unroll. Filtered out of reported merges.
SENTINEL = ("", "")


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, syms) — the word-frequency table with each word
    split into its initial symbols: characters plus a final </w>
    marker (so merges never cross word boundaries and word-final units
    stay distinct, the standard BPE setup)."""
    w = (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_MARK)))
    return w.select("word", "cnt", syms.alias("syms"))


def merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of one merge rule (a,b)→ab to
    a symbol array — a single ``aggregate`` fold, no UDF. After a
    merge the new symbol is not reconsidered as the left side within
    the same adjacency (standard BPE greedy semantics)."""
    if a == "":
        return syms  # sentinel: no-op
    merged = F.lit(a + b)
    return F.when(F.size(syms) < 2, syms).otherwise(
        F.aggregate(
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.slice(syms, 1, 1),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.when(
        F.size("syms") < 2, F.array().cast("array<array<string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.array(
                F.element_at(F.col("syms"), i.cast("int")),
                F.element_at(F.col("syms"), (i + 1).cast("int")),
            ),
        )
    )
    return (
        vocab.select(F.explode(pairs).alias("pr"), "cnt")
        .groupBy(F.col("pr")[0].alias("a"), F.col("pr")[1].alias("b"))
        .agg(F.sum("cnt").alias("freq"))
    )


def bpe_learn(
    df: DataFrame,
    text_col: str,
    num_merges: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merge rules from a corpus. Returns
    (merges, final_vocab) where merges is [(left, right, freq), …] in
    learned order (sentinel no-ops excluded) and final_vocab is the
    (word, cnt, syms) table after all merges.

    Corpus cost: ONE word-count shuffle. Each merge iteration touches
    only the vocabulary table: one pair-count partial-agg shuffle and
    a single-row driver fetch (the winning pair) — the same
    driver-traffic contract as k-means (k·dim per iteration there, one
    pair here).

    ``checkpoint_dir``/``checkpoint_every`` route the per-merge vocab
    truncation through the reliable checkpointer (see :mod:`.lineage`)
    so a long merge loop survives executor loss; unset keeps the
    executor-local fast path. Learned merges are identical either way.
    """
    from .lineage import reliable_this_round, truncate_lineage

    vocab = truncate_lineage(word_vocab(df, text_col), checkpoint_dir, eager=True)
    merges: list[tuple[str, str, int]] = []
    for _it in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            a, b = SENTINEL  # fully merged: remaining iters are no-ops
        else:
            a, b = top[0].a, top[0].b
            merges.append((a, b, int(top[0].freq)))
        vocab = truncate_lineage(
            vocab.select(
                "word", "cnt", merge_fold(F.col("syms"), a, b).alias("syms")
            ),
            reliable_this_round(checkpoint_dir, _it, checkpoint_every),
            eager=True,
        )
    return merges, vocab


def bpe_token_counts(
    corpus: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """Per-document BPE token count under a learned vocabulary:
    (id, n_tokens_bpe). The corpus side is one tokenize + broadcast
    join + doc-keyed partial agg; words missing from the vocabulary
    count as len(word)+1 symbols (nothing merged)."""
    vsize = vocab.select(
        "word", F.size("syms").alias("_n_syms")
    )
    toks = corpus.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("word")
    )
    return (
        toks.join(F.broadcast(vsize), "word", "left")
        .select(
            id_col,
            F.coalesce(
                F.col("_n_syms"), F.length("word") + 1
            ).alias("_n"),
        )
        .groupBy(id_col)
        .agg(F.sum("_n").alias("n_tokens_bpe"))
    )
