"""Web-corpus cleaning rules: the published document-level quality
gates a pretraining pipeline applies before anything expensive runs.

``gopher_quality_rules`` implements the Gopher quality heuristics
(Rae et al. 2021, arXiv:2112.11446 §A.1.1) as one map-only projection:
word-count bounds, mean-word-length bounds, alphabetic-word fraction,
and the required-stopword rule. The repetition half of the Gopher
filter lives in ``operators.scrub.word_repetition_profile`` (top-word /
top-bigram fractions); together they form the full filter.

Scale shape: everything here is per-row column algebra over one staged
tokenization — no shuffle, no UDF, no driver traffic. At 100 TB this
is the cheapest possible pass (a single scan), which is exactly why
real pipelines run it FIRST to shrink the corpus before dedup/LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher's "must contain at least two of" stopword list
# (arXiv:2112.11446 §A.1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    carry_cols: tuple = (),
) -> DataFrame:
    """Per-document Gopher quality verdicts.

    Output: (id, *carry_cols, n_words, mean_word_len, alpha_word_frac,
    stopword_hits, rule_word_count, rule_word_len, rule_alpha,
    rule_stopwords, keep) where ``keep`` is the conjunction of all
    rules. Ratios are exact integer ratios evaluated in one double
    division and rounded (engine-reproducible); ``stopword_hits``
    counts DISTINCT list stopwords present, per the published rule.
    ``carry_cols`` (names or Column expressions ``.alias``-ed) ride the
    same projection so composed reports never join back to the corpus.
    """
    from kubernetes_logs_datalake_spark.functions.text import bind_once, words

    sw = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    carried = [F.col(c) if isinstance(c, str) else c for c in carry_cols]
    carried_names = [
        df.select(c).columns[0] for c in carried
    ]
    staged = df.select(
        F.col(id_col),
        *carried,
        bind_once(
            F.filter(words(text_col), lambda x: x != ""),
            lambda w: F.struct(
                F.size(w).cast("long").alias("n"),
                F.aggregate(
                    w, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
                ).alias("chars"),
                F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
                .cast("long")
                .alias("alpha"),
                F.size(F.array_intersect(F.array_distinct(w), sw))
                .cast("long")
                .alias("stop"),
            ),
        ).alias("_s"),
    )
    n = F.col("_s.n")
    mwl = F.when(n > 0, F.round(F.col("_s.chars") / n, 4)).otherwise(F.lit(0.0))
    alpha_frac = F.when(n > 0, F.round(F.col("_s.alpha") / n, 6)).otherwise(
        F.lit(0.0)
    )
    out = staged.select(
        F.col(id_col),
        *[F.col(c) for c in carried_names],
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        F.col("_s.stop").alias("stopword_hits"),
    )
    rules = {
        "rule_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "rule_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "rule_alpha": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "rule_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for name, expr in rules.items():
        out = out.withColumn(name, expr)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


def source_quality_report(
    df: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    **gopher_kwargs,
) -> DataFrame:
    """Per-source curation dashboard: the report a pipeline operator
    reads to decide which domains/feeds to keep, reweight, or drop.

    Output per source: (source, n_docs, n_unique_texts, dup_rate,
    n_keep, keep_rate, mean_chars) — exact-dedup rate from distinct
    text hashes, keep rate under :func:`gopher_quality_rules`, and the
    mean document length (exact integer sums, one double division).

    Plan: the rule verdicts ride the base scan (map-only, via
    ``carry_cols`` — NO join back to the corpus), then ONE aggregation
    keyed by source; the distinct-text count is a partial (source, md5)
    pre-aggregate — no global distinct, no window. Source cardinality
    is domains, not documents: thousands of groups at 100 TB,
    trivially spread.
    """
    base = gopher_quality_rules(
        df,
        id_col,
        text_col,
        carry_cols=(
            F.col(source_col).alias("source"),
            F.md5(F.col(text_col)).alias("_th"),
            F.length(F.col(text_col)).cast("long").alias("_chars"),
        ),
        **gopher_kwargs,
    )
    agg = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_th").alias("n_unique_texts"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.sum("_chars").alias("_sum_chars"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_unique_texts",
        F.round(1.0 - F.col("n_unique_texts") / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
        "n_keep",
        F.round(F.col("n_keep") / F.col("n_docs"), 6).alias("keep_rate"),
        F.round(F.col("_sum_chars") / F.col("n_docs"), 2).alias("mean_chars"),
    )


def filter_ablation(
    verdicts: DataFrame, rule_cols: list[str], scale: int = 6
) -> DataFrame:
    """Per-rule ablation report over boolean rule verdicts (e.g. the
    output of :func:`gopher_quality_rules`): for each rule, how many
    documents fail it, and how many fail ONLY it — the number a
    curation review needs to know which rule is doing the work and
    which is redundant (a rule with many fails but zero unique fails
    can be dropped without changing the corpus).

    Output: one row per rule (rule, n_docs, n_fail, n_unique_fail,
    fail_frac), ordered by rule name.

    Plan: ONE aggregate over the verdicts scan computes every rule's
    counters simultaneously (2·|rules|+1 sums); the row-per-rule
    reshape is the table_profile explode of a 1-row struct array —
    no second scan, no join, no window.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for r in rule_cols:
        others = [F.col(o) for o in rule_cols if o != r]
        only = ~F.col(r)
        for o in others:
            only = only & o
        aggs.append(
            F.sum((~F.col(r)).cast("long")).alias(f"_f_{r}")
        )
        aggs.append(F.sum(only.cast("long")).alias(f"_u_{r}"))
    one = verdicts.agg(*aggs)
    stacked = one.select(
        F.col("_n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("rule"),
                        F.col(f"_f_{r}").alias("n_fail"),
                        F.col(f"_u_{r}").alias("n_unique_fail"),
                    )
                    for r in rule_cols
                ]
            )
        ).alias("_s"),
    )
    return stacked.select(
        F.col("_s.rule").alias("rule"),
        F.col("_n").alias("n_docs"),
        F.col("_s.n_fail").alias("n_fail"),
        F.col("_s.n_unique_fail").alias("n_unique_fail"),
        F.round(F.col("_s.n_fail") / F.col("_n"), scale).alias("fail_frac"),
    ).orderBy("rule")
