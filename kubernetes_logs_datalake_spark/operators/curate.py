"""End-to-end corpus curation: the composed filter pass a pretraining
pipeline runs over raw documents — language allowlist, quality score,
repetition filter, exact dedup, and eval-set decontamination — emitting
one verdict row per document with per-stage flags (so drop reasons are
attributable, not just a surviving subset).

Composition stays one lazy plan: the map-only flags (lang, quality,
fingerprint) ride the base scan; repetition and decontamination each
contribute their own aggregation subtrees joined back on the id. Every
stage reuses the already-oracle-checked operator/function it fronts, so
the composite inherits their engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str | None = None,
    langs: tuple[str, ...] = ("en",),
    quality_min: float = 0.5,
    ngram: int = 5,
) -> DataFrame:
    """Per-document curation verdicts: (id, pass_lang, pass_quality,
    pass_repetition, pass_dedup, pass_decontam, kept).

    - ``pass_lang``: declared ``lang_col`` (or every doc if None) in the
      allowlist — language *detection* is a separate operator
      (``functions.text.lang_id``).
    - ``pass_quality``: 4-dp-rounded ``quality_score`` ≥ ``quality_min``
      (rounded so the engine-parity boundary is exact).
    - ``pass_repetition``: not flagged by the Gopher top-word/top-bigram
      thresholds (``scrub.word_repetition_profile``).
    - ``pass_dedup``: the document is its fingerprint group's canonical
      (minimum-id) member.
    - ``pass_decontam``: shares no word ``ngram``-gram with ``eval_df``
      (``scrub.decontaminate``).
    - ``kept``: all of the above.
    """
    from kubernetes_logs_datalake_spark.functions.text import (
        fingerprint,
        quality_score,
    )
    from kubernetes_logs_datalake_spark.operators.scrub import (
        decontaminate,
        word_repetition_profile,
    )

    pass_lang = (
        F.col(lang_col).isin(*langs) if lang_col is not None else F.lit(True)
    )
    base = df.select(
        F.col(id_col),
        pass_lang.alias("pass_lang"),
        (F.round(quality_score(text_col), 4) >= quality_min).alias(
            "pass_quality"
        ),
        fingerprint(text_col).alias("_fp"),
    )
    keep = base.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    with_dedup = base.join(keep, "_fp").select(
        id_col,
        "pass_lang",
        "pass_quality",
        (F.col(id_col) == F.col("_keep_id")).alias("pass_dedup"),
    )
    rep = word_repetition_profile(df, id_col, text_col).select(
        F.col(id_col), (~F.col("repetitive")).alias("pass_repetition")
    )
    dec = decontaminate(df, eval_df, id_col, text_col, n=ngram).select(
        F.col(id_col), (~F.col("contaminated")).alias("pass_decontam")
    )
    # LEFT joins: a document whose normalized text is empty has no
    # repetition-profile row (nothing to repeat → passes) — an inner
    # join would silently drop it from the verdict table, violating the
    # one-verdict-row-per-document contract
    return (
        with_dedup.join(rep, id_col, "left")
        .join(dec, id_col, "left")
        .withColumn("pass_repetition", F.coalesce("pass_repetition", F.lit(True)))
        .withColumn("pass_decontam", F.coalesce("pass_decontam", F.lit(True)))
        .select(
            id_col,
            "pass_lang",
            "pass_quality",
            "pass_repetition",
            "pass_dedup",
            "pass_decontam",
            (
                F.col("pass_lang")
                & F.col("pass_quality")
                & F.col("pass_repetition")
                & F.col("pass_dedup")
                & F.col("pass_decontam")
            ).alias("kept"),
        )
    )


def curation_summary(verdicts: DataFrame) -> DataFrame:
    """Stage-attribution rollup of :func:`curate` output: one row per
    flag column with how many documents fail it, plus total/kept — the
    numbers a pipeline report prints. One partial-agg over booleans."""
    flags = [c for c in verdicts.columns if c.startswith("pass_")] + ["kept"]
    agg = verdicts.agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum((~F.col(c)).cast("long")).alias(f"fail_{c}")
            for c in flags
        ],
    )
    return agg

def decontaminate_semantic(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    scale: int = 6,
) -> DataFrame:
    """Embedding-space decontamination: corpus rows whose embedding is
    within ``threshold`` cosine of ANY benchmark vector — the semantic
    complement of the n-gram :func:`~kubernetes_logs_datalake_spark.operators.scrub.decontaminate`
    (catches paraphrased eval leakage that shares no exact n-gram).
    Output: (id, n_matches, max_cos) per contaminated corpus row.

    Scale shape: the benchmark side (eval sets — thousands of rows, not
    billions) is broadcast with prenormed vectors; the corpus never
    shuffles and is scanned exactly once, so the plan is a map-side
    threshold join + one partial aggregation on the corpus id. This is
    the one similarity shape where broadcast-nested-loop IS the 100 TB
    plan — the small side is genuinely small and the big side streams.
    For benchmark sets too big to broadcast, bucket both sides with
    ``similarity.lsh_bucketed_pairs`` instead.
    """
    from kubernetes_logs_datalake_spark.functions.vectors import (
        cosine_prenorm,
        norm,
    )

    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv"), norm(vec_col).alias("_cn")
    )
    b = F.broadcast(
        benchmark.select(
            F.col(vec_col).alias("_bv"), norm(vec_col).alias("_bn")
        )
    )
    cos = cosine_prenorm("_cv", "_bv", "_cn", "_bn")
    return (
        c.join(b, cos >= F.lit(float(threshold)))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.round(F.max(cos), scale).alias("max_cos"),
        )
    )


def quantile_calibrate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    keep_frac: float = 0.5,
    scale: int = 9,
) -> DataFrame:
    """Cross-source quality-score calibration: replace a raw classifier
    score with its within-group percentile, then apply ONE global keep
    threshold.

    Why: a quality classifier's raw score distribution differs per
    source (crawl vs curated vs code), so a single raw-score cutoff
    over- or under-prunes whole sources. Normalizing to the per-source
    percent_rank makes "keep the best ``keep_frac`` of each source"
    exact — the FineWeb-style calibrated gate.

    Adds ``pct_rank`` (percent_rank within ``group_col``, ordered by
    (score, id) so ties are deterministic) and ``keep``
    (rounded pct_rank ≥ 1 - keep_frac; the comparison uses the ROUNDED
    value so the oracle can't flip a boundary row). A single-row group
    always keeps its row: percent_rank of a singleton is 0, which would
    otherwise drop a source's only — by definition best — document for
    every keep_frac < 1. One window sort per group — a single shuffle
    keyed by the group column; group skew is real (one giant crawl
    source) but percent_rank is rank-based, so AQE's skew handling plus
    the absence of any per-row state keeps the sort spillable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(score_col), F.col(id_col))
    thr = 1.0 - keep_frac
    out = df.withColumn(
        "pct_rank", F.round(F.percent_rank().over(w), scale)
    ).withColumn(
        "_gn", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    return out.withColumn(
        "keep", (F.col("pct_rank") >= F.lit(thr)) | (F.col("_gn") == 1)
    ).drop("_gn")
