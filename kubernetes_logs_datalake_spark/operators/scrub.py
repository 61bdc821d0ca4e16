"""Text scrubbing / quality-filter operators for training-data prep:
PII redaction and word-repetition profiling.

Both are pure JVM column/aggregate pipelines — no Python UDFs. The
regexes use only the Java-regex ∩ RE2 common subset (no backrefs, no
lookaround) so the DuckDB oracle applies the byte-identical patterns;
redaction order is part of the contract (urls → emails → ips → phones)
because earlier passes can consume characters later passes would match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pattern registry: (name, regex). Kept engine-portable — Java regex and
# RE2 agree on every construct used here ( \d \b {m,n} character
# classes, alternation-free bodies ).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("url", r"https?://[^\s]+"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+\d[\d ]{7,}\d"),
)


def pii_counts(text) -> dict[str, F.Column]:
    """Per-type PII match counts over ``text`` (pre-redaction), as a
    dict of named long columns — `size(regexp_extract_all(...))`, one
    codegen'd pass per pattern."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS
    }


def redact_text(text) -> F.Column:
    """``text`` with every PII span replaced by its ``[TYPE]`` token,
    applied in registry order (the order is semantic: a URL containing
    an ``@`` must become ``[URL]``, not part-email)."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrub: (id, n_url, n_email, n_ip, n_phone, redacted) — the
    redaction pass every public-web training corpus runs before
    tokenization. Scale: a pure map stage (zero shuffles); regexes run
    inside whole-stage codegen over each partition's strings.
    """
    counts = pii_counts(text_col)
    return df.select(
        F.col(id_col),
        *[col.alias(name) for name, col in counts.items()],
        redact_text(text_col).alias("redacted"),
    )


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, with_id: bool
) -> DataFrame:
    """Distinct (id?, md5(word-n-gram)) rows — the ONE gram/hash recipe
    shared by :func:`decontaminate` and :func:`decontaminate_bloom`, so
    the bloom variant's losslessness (identical output, shared oracle)
    is structural rather than maintained by parallel edits."""
    from kubernetes_logs_datalake_spark.functions.text import shingles

    cols = [F.col(id_col)] if with_id else []
    g = df.select(
        *cols, F.explode(F.array_distinct(shingles(text_col, n))).alias("_g")
    ).select(*cols, F.md5("_g").alias("_h"))
    if with_id:
        # a doc's grams live in one array cell, so per-doc distinctness
        # is already guaranteed by the map-side array_distinct — the
        # train-side corpus-gram exchange a .distinct() would pay is
        # gone (r16, guide §2.4); md5 is injective on distinct grams
        # for any practical purpose (128-bit, no known accidental
        # collisions), so distinct grams ⇔ distinct hashes
        return g
    # cross-document gram set: the global distinct still needs its
    # exchange, but the map-side per-doc dedup shrinks what enters it
    return g.distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation set — the overlap filter every
    pretraining pipeline runs before training so eval questions aren't
    memorized verbatim. Output: (id, n_hits, contaminated) for every
    training doc, ``contaminated = n_hits >= min_hits`` where n_hits is
    the count of DISTINCT shared n-grams.

    Plan: both corpora explode to distinct (doc, md5(gram)) rows; eval
    grams dedupe to a gram set (eval sets are small — Spark broadcasts
    the build side of the hash join on its own, and at 100 TB the train
    side streams through it without shuffling); one partial-agg count
    per train doc; a left join fills n_hits=0 for clean docs. The md5
    keeps join keys fixed-width (engine-portable, no long-string
    comparison skew).
    """
    eval_grams = _gram_hashes(eval_df, id_col, text_col, n, with_id=False)
    hits = (
        _gram_hashes(train, id_col, text_col, n, with_id=True)
        .join(eval_grams, "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def word_repetition_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style repetition metrics per document: (id, n_words,
    n_distinct_words, top_word_frac, top_bigram_frac, repetitive) —
    the "excessive repetition" quality filter for training corpora
    (documents dominated by one word or one bigram are boilerplate or
    spam).

    Plan: one explode of the staged word list into (doc, gram) rows for
    words and bigrams (bigrams built with a bounds-guarded
    ``transform(sequence(...))`` — the sequence(1,0) descending trap is
    guarded with CASE), then two partial-agg shuffles: (doc, gram) →
    counts, doc → profile. Both aggregations combine map-side; nothing
    is ever a global window. ``repetitive`` applies the published
    Gopher thresholds (top word > 20 % of words, top bigram > 20 % of
    bigrams — arXiv:2112.11446 §A.1.1).
    """
    from kubernetes_logs_datalake_spark.functions.text import words

    w = F.filter(words(text_col), lambda x: x != "")
    with_words = df.select(F.col(id_col), w.alias("_w"))
    bigrams = F.when(
        F.size("_w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - 1),
            lambda i: F.concat_ws(" ", F.element_at("_w", i), F.element_at("_w", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _top_frac(grams_col: F.Column, kind: str) -> DataFrame:
        per_gram = (
            with_words.select(F.col(id_col), F.explode(grams_col).alias("_g"))
            .groupBy(id_col, "_g")
            .agg(F.count("*").alias("_c"))
        )
        return per_gram.groupBy(id_col).agg(
            F.sum("_c").alias(f"_n_{kind}"),
            F.count("*").alias(f"_d_{kind}"),
            F.max("_c").alias(f"_top_{kind}"),
        )

    wstats = _top_frac(F.col("_w"), "w")
    bstats = _top_frac(bigrams, "b")
    frac = lambda top, n: F.round(  # noqa: E731
        F.col(top).cast("double") / F.col(n).cast("double"), 6
    )
    return (
        wstats.join(bstats, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_n_w").alias("n_words"),
            F.col("_d_w").alias("n_distinct_words"),
            frac("_top_w", "_n_w").alias("top_word_frac"),
            F.coalesce(frac("_top_b", "_n_b"), F.lit(0.0)).alias("top_bigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("top_word_frac") > 0.2) | (F.col("top_bigram_frac") > 0.2),
        )
    )


def segment_dedup(
    df: DataFrame, id_col: str, text_col: str, seg_words: int = 10
) -> DataFrame:
    """Corpus-level duplicated-segment removal — the CCNet/RefinedWeb
    "line dedup" pass generalized to fixed-width word segments (the
    reference corpus stores flat word streams, not newline-delimited
    paragraphs). Every ``seg_words``-word segment that already occurred
    anywhere earlier in the corpus (ordered by (id, position) — a
    deterministic total order both engines share) is dropped; only its
    first occurrence survives. Output per document:
    (id, n_segs, n_dup_segs, clean_text).

    Plan: one map-side chunking (``transform(sequence(...))`` — no
    per-character work), one shuffle on the segment hash for the
    first-occurrence window, one shuffle back on the id for reassembly.
    The window partitions by segment hash — cardinality ≈ corpus
    segments, perfectly spread — never a global window. At 100 TB the
    boilerplate segments (headers, footers, license blocks) are the hot
    keys; their groups are large but each holds only (id, pos) pairs,
    and only min survives the rank.
    """
    from kubernetes_logs_datalake_spark.functions.text import words
    from pyspark.sql import Window

    # bind the words array to a column BEFORE the transform — an outer
    # expression referenced inside a lambda re-evaluates per element
    # (one full tokenization per segment); a column ref is a cheap read
    with_w = df.select(
        F.col(id_col), F.filter(words(text_col), lambda x: x != "").alias("_wl")
    )
    w = F.col("_wl")
    n_segs = F.ceil(F.size(w) / F.lit(seg_words)).cast("int")
    segs = F.when(F.size(w) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_segs - 1),
            lambda i: F.array_join(
                F.slice(w, i * seg_words + 1, seg_words), " "
            ),
        )
    )
    exploded = with_w.select(
        F.col(id_col), F.posexplode_outer(segs).alias("_pos", "_seg")
    )
    win = Window.partitionBy(F.md5(F.col("_seg"))).orderBy(id_col, "_pos")
    ranked = exploded.withColumn(
        "_first",
        F.when(F.col("_seg").isNull(), F.lit(True)).otherwise(
            F.row_number().over(win) == 1
        ),
    )
    return ranked.groupBy(id_col).agg(
        F.count("_pos").cast("int").alias("n_segs"),
        F.sum(F.when(~F.col("_first"), 1).otherwise(0))
        .cast("int")
        .alias("n_dup_segs"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("_first") & F.col("_seg").isNotNull(),
                            F.struct(F.col("_pos"), F.col("_seg")),
                        )
                    )
                ),
                lambda s: s["_seg"],
            ),
            " ",
        ).alias("clean_text"),
    )


# ------------------------------------------------------- k-anonymity


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Re-identification risk report (Sweeney 2002 k-anonymity): the
    quasi-identifier equivalence classes with fewer than ``k`` members
    — each such class is a privacy leak (its members are identifiable
    to within n_rows < k candidates). Output: (*quasi_cols, n_rows,
    deficit) for violating classes only; empty result == the release
    is k-anonymous over these columns.

    One partial-agg shuffle at quasi-class cardinality — the audit is
    as cheap as a groupBy however large the table."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") < k)
        .select(
            *quasi_cols,
            "n_rows",
            (F.lit(k) - F.col("n_rows")).alias("deficit"),
        )
    )


def k_anonymize_suppress(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Enforce k-anonymity by suppression: rows whose quasi-identifier
    class has fewer than ``k`` members get those columns nulled (the
    class collapses into the suppressed pool); all other rows pass
    through unchanged. The violating-class set is left to AQE's join
    planning rather than force-broadcast: on a mostly-anonymous table
    it is tiny (broadcast wins), but on a high-cardinality
    quasi-identifier — the very case k-anonymity exists for — it
    approaches one row per input row, and a forced broadcast would OOM
    exactly at scale."""
    small = k_anonymity_audit(df, quasi_cols, k).select(
        *[F.col(c).alias(f"_q_{c}") for c in quasi_cols]
    ).withColumn("_violates", F.lit(True))
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(F.col(f"_q_{c}"))
        cond = eq if cond is None else cond & eq
    marked = df.join(small, cond, "left")
    keep_cols = [
        F.when(F.col("_violates"), F.lit(None)).otherwise(df[c]).alias(c)
        if c in quasi_cols
        else df[c]
        for c in df.columns
    ]
    return marked.select(*keep_cols)


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """:func:`decontaminate` with a Bloom pre-filter — the 100 TB shape.

    The eval set's gram hashes are packed into ONE Bloom literal
    (``operators.bloom``) that rides into the train-side scan: clean
    grams — the overwhelming majority of a pretraining corpus — die
    inside whole-stage codegen BEFORE the semi join, so the join (and
    any exchange AQE picks for it) only sees grams that might match.
    False positives only, and the survivors still go through the exact
    semi join, so the output is IDENTICAL to :func:`decontaminate` —
    which is therefore the oracle (the jaccard_prefix losslessness
    pattern). Size ``num_bits`` ≈ 10× the eval gram count for ~1% FP.
    """
    from kubernetes_logs_datalake_spark.operators.bloom import (
        bloom_build,
        bloom_semi_filter,
    )

    eval_grams = _gram_hashes(eval_df, id_col, text_col, n, with_id=False)
    words = bloom_build(eval_grams, "_h", num_bits, num_hashes)
    pruned = bloom_semi_filter(
        _gram_hashes(train, id_col, text_col, n, with_id=True),
        "_h", words, num_hashes, num_bits,
    )
    hits = (
        pruned.join(eval_grams, "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )
