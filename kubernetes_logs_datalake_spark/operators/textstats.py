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

# 36 alphanumerics + space: the alphabet of normalize_text output.
LM_VOCAB_SIZE = 37


def char_bigram_lm_score(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str,
    scale: int = 6,
) -> DataFrame:
    """CCNet-style language-model quality filter: train a character
    bigram LM on a trusted corpus partition, score every document by
    its average negative log2 conditional probability per transition
    (bits/char — low = natural text under the model, high = junk).
    Output: (id, n_transitions, avg_nll_bits).

    Model: Laplace-smoothed P(c2|c1) = (count(c1c2)+1) /
    (count(c1·)+37) over the 37-symbol normalized alphabet. The model
    is two tiny aggregates (≤ 37² bigram rows) built from one scan of
    the training partition and **broadcast** into the scoring join, so
    the corpus-side plan is: scan → explode bigrams → broadcast join →
    one partial-agg shuffle on the doc id. Per-transition logprobs are
    rounded to 12 dp and summed as DECIMAL (order-independent — the
    repo's exact-sum recipe), giving bit-deterministic scores any
    engine can replicate.
    """
    from kubernetes_logs_datalake_spark.functions.text import normalize_text

    def bigrams(df: DataFrame) -> DataFrame:
        # Split to a char array bound to a real column first, then pair
        # adjacent elements. Two traps avoided: (a) outer expressions
        # referenced inside a lambda re-evaluate per element (one
        # regexp_replace per character here), so normalization must be
        # bound before the transform; (b) substr(norm, i, 2) re-scans
        # the string for codepoint offsets — O(len²) per doc — while
        # element_at on a bound array column is O(1). Measured 2.4x.
        bound = df.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), "").alias("_ch"),
        )
        ch = F.col("_ch")
        n = F.size(ch)
        arr = F.when(n < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat(
                    F.element_at(ch, (i + 1).cast("int")),
                    F.element_at(ch, (i + 2).cast("int")),
                ),
            )
        )
        return bound.select(F.col(id_col), F.explode(arr).alias("_bg"))

    tr = bigrams(train)
    model = tr.groupBy("_bg").agg(F.count("*").alias("_c"))
    ctx = (
        model.groupBy(F.substring("_bg", 1, 1).alias("_c1"))
        .agg(F.sum("_c").alias("_ctx"))
    )
    # Precompute the COMPLETE nll grid (observed contexts × the fixed
    # 37-symbol alphabet, ≤ 37² rows) so the 1M-row scoring side pays
    # ONE broadcast join and no per-transition log2 — unseen bigrams
    # with a seen context are grid rows with count 0; only transitions
    # whose context never occurred in training fall to the constant.
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    if len(alphabet) != LM_VOCAB_SIZE:  # not a bare assert: -O must not
        # strip the smoothing invariant (grid completeness) check
        raise ValueError(
            f"alphabet size {len(alphabet)} != LM_VOCAB_SIZE {LM_VOCAB_SIZE}"
        )
    grid = (
        ctx.select(
            "_c1",
            "_ctx",
            F.explode(F.array(*[F.lit(c) for c in alphabet])).alias("_c2"),
        )
        .withColumn("_bg", F.concat("_c1", "_c2"))
        .join(model, "_bg", "left")
        .select(
            "_bg",
            F.round(
                -F.log2(
                    (F.coalesce(F.col("_c"), F.lit(0)) + 1).cast("double")
                    / (F.col("_ctx") + LM_VOCAB_SIZE)
                ),
                12,
            ).cast("decimal(25,12)").alias("_nll"),
        )
    )
    unseen_ctx_nll = F.round(
        -F.log2(F.lit(1.0) / F.lit(float(LM_VOCAB_SIZE))), 12
    ).cast("decimal(25,12)")
    # --- r16: the model grid COLLECTS to the driver (≤ 37² = 1369
    # rows — bounded by the alphabet, never the corpus, the kmeans-
    # centers driver contract) and rides into the scoring scan as ONE
    # constant-folded decimal array literal indexed by the bigram's
    # ascii codes. The corpus side is then MAP-ONLY: the per-char
    # bigram explode, the broadcast-join probe, and the per-doc
    # aggregation exchange all disappear (guide §2.4/§5) — each doc's
    # transitions are summed in-task by one `aggregate` fold over its
    # char-code array. Every nll value is produced by the SAME JVM
    # expressions as before (the grid plan is unchanged, just
    # collected instead of broadcast), decimal addition is
    # order-independent, and docs with <2 normalized chars are
    # filtered exactly like the old explode dropped them — so scores
    # are bit-identical (pinned by test_round16_opt; oracle
    # hash-checked).
    spark = score.sparkSession
    nll_by_bg = {r["_bg"]: r["_nll"] for r in grid.collect()}
    unseen = spark.range(1).select(unseen_ctx_nll.alias("u")).first()["u"]
    # slot index for bigram (c1, c2): (ascii(c1)-32)*91 + ascii(c2)-31,
    # 1-based; the normalized alphabet is ascii 32..122 so 91 slots per
    # context cover every reachable code, unseen-context cells carry
    # the constant fallback value
    slots = [str(unseen)] * (91 * 91)
    for bg, nll in nll_by_bg.items():
        slots[(ord(bg[0]) - 32) * 91 + (ord(bg[1]) - 32)] = str(nll)
    nll_arr = F.split(F.lit(",".join(slots)), ",").cast(
        "array<decimal(25,12)>"
    )
    sc = (
        score.select(
            F.col(id_col),
            F.split(normalize_text(F.col(text_col)), "").alias("_ch"),
        )
        .select(
            F.col(id_col),
            F.transform("_ch", lambda c: F.ascii(c)).alias("_a"),
        )
        .filter(F.size("_a") >= 2)
    )
    total = F.aggregate(
        F.sequence(F.lit(1), F.size("_a") - 1),
        F.lit("0").cast("decimal(25,12)"),
        lambda acc, i: (
            acc
            + F.element_at(
                nll_arr,
                (
                    (F.element_at("_a", i.cast("int")) - 32) * 91
                    + F.element_at("_a", (i + 1).cast("int"))
                    - 31
                ).cast("int"),
            )
        ).cast("decimal(25,12)"),
    )
    return sc.select(
        F.col(id_col),
        (F.size("_a") - 1).cast("long").alias("n_transitions"),
        F.round(
            total.cast("double") / (F.size("_a") - 1), scale
        ).alias("avg_nll_bits"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact repeated-substring detection (the span-level dedup of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, done with word n-grams instead of a suffix array): every
    maximal run of word-``n``-gram windows whose gram occurs in ≥
    ``min_docs`` distinct documents is reported as one span. Output:
    (id, span_start, span_end, n_windows) with word positions,
    span_end exclusive.

    Plan: posexplode the shingle array → count DISTINCT docs per gram
    hash (one shuffle on the md5 hash, perfectly spread) → semi join the
    windows back to hot grams (hash-partitioned equi join — never a
    broadcast assumption on the hot set) → per-doc island merge with one
    window over (id, pos): a window starts a new span when its start
    exceeds the running max end of preceding windows. All integer/string
    ops — bit-deterministic, ANSI-expressible.
    """
    from pyspark.sql import Window

    from kubernetes_logs_datalake_spark.functions.text import shingles

    # binary16 gram keys (r16): unhex(md5) halves the key bytes through
    # both gram-keyed exchanges vs the 32-char hex string, with zero
    # collision change (it is the same 128 bits)
    win = df.select(
        F.col(id_col),
        F.posexplode(shingles(text_col, n=n)).alias("_pos", "_gram"),
    ).select(F.col(id_col), "_pos", F.unhex(F.md5(F.col("_gram"))).alias("_h"))
    if min_docs == 2:
        # ≥2 distinct docs ⟺ min(id) != max(id): plain min/max partial
        # aggregation instead of a distinct-count — the partial state
        # collapses map-side to one row per gram per task, where the
        # distinct count had to keep every (gram, id) pair through the
        # exchange (r16, guide §2.3)
        hot = (
            win.groupBy("_h")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("_h")
        )
    else:
        hot = (
            win.groupBy("_h")
            .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
            .filter(F.col("_nd") >= min_docs)
            .select("_h")
        )
    flagged = win.join(hot, "_h").select(F.col(id_col), "_pos")
    w = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("_pos") + n).over(w)
    isl = flagged.withColumn(
        "_new", F.when(
            prev_end.isNull() | (F.col("_pos") > prev_end), 1
        ).otherwise(0)
    )
    w2 = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = isl.withColumn("_island", F.sum("_new").over(w2))
    return (
        isl.groupBy(id_col, "_island")
        .agg(
            F.min("_pos").alias("span_start"),
            (F.max("_pos") + n).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .drop("_island")
    )


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Corpus-novelty curation signal: the fraction of a document's
    DISTINCT word n-grams that occur in no other document. Boilerplate
    and template docs score near 0; original content near 1.

    Plan (r16): a gram with document frequency 1 belongs to exactly ONE
    document, so the df-count aggregate can carry each gram's owner
    (min id — over one row it IS the owner) and the novel counts
    aggregate straight to doc granularity: explode once → one
    map-side-combined gram-keyed shuffle → one doc-keyed partial agg of
    the df==1 subset. Per-doc set sizes come map-side from the
    unexploded array (no explode at all on that leg). The old shape's
    gram-granularity equi-join back — a second corpus-gram exchange —
    is gone. No windows, no broadcast assumptions on the gram table.
    Output: (id, n_grams, n_novel, novelty).
    """
    from kubernetes_logs_datalake_spark.functions.text import shingles
    from kubernetes_logs_datalake_spark.operators.dedup import shingle_sets

    n_grams = df.select(
        F.col(id_col),
        F.size(F.array_distinct(shingles(text_col, n))).alias("_ng"),
    ).filter(F.col("_ng") > 0)
    novel = (
        shingle_sets(df, id_col, text_col, n=n)
        .groupBy("shingle")
        .agg(F.count("*").alias("_df"), F.min("_id").alias("_owner"))
        .filter(F.col("_df") == 1)
        .groupBy("_owner")
        .agg(F.count("*").alias("_nn"))
    )
    return (
        n_grams.join(novel, n_grams[id_col] == novel["_owner"], "left")
        .select(
            F.col(id_col),
            F.col("_ng").cast("long").alias("n_grams"),
            F.coalesce(F.col("_nn"), F.lit(0)).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6),
        )
    )


def common_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_df: int = 2,
    k: int = 25,
) -> DataFrame:
    """Corpus-level boilerplate phrase detection: the top-``k`` word
    ``n``-grams by document frequency (distinct documents containing
    the gram), the phrase table behind template/boilerplate stripping
    in web-corpus curation. Output: (ngram, doc_freq), doc_freq desc,
    gram asc for deterministic ties.

    Plan: distinct (id, gram) explode → one map-side-combined count per
    gram → TakeOrderedAndProject top-k. Key cardinality is corpus-level
    n-gram vocabulary — spread, never a hot key; the top-k never
    shuffles the gram table globally.
    """
    from kubernetes_logs_datalake_spark.operators.dedup import shingle_sets

    sh = shingle_sets(df, id_col, text_col, n=n)
    return (
        sh.groupBy(F.col("shingle").alias("ngram"))
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
        .orderBy(F.desc("doc_freq"), F.col("ngram"))
        .limit(k)
    )


def term_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
    scale: int = 4,
) -> DataFrame:
    """Top-``k`` word-bigram collocations by pointwise mutual
    information (Church & Hanks 1990): PMI(a,b) =
    log2( p(ab) / (p(a)·p(b)) ) with p(ab) over corpus bigram tokens
    and p(a) over corpus unigram tokens — the collocation/phrase
    detector behind tokenizer vocab curation and boilerplate phrase
    mining. ``min_count`` drops rare bigrams (PMI's classic
    low-frequency instability).

    Output: (bigram, pair_count, pmi), pmi desc then bigram asc for
    deterministic ties; pmi is computed as ONE double log2 over an
    exact integer rational (pair·N_uni² / (N_bi·cnt_a·cnt_b)) and
    rounded, so both engines agree.

    Plan: one explode each for unigrams and bigrams, two
    map-side-combined counts at vocabulary cardinality, a broadcast of
    the two scalar totals, two gram-keyed joins of the bigram table to
    the unigram counts, one TakeOrderedAndProject. No window, no
    all-pairs: cost is linear in corpus tokens + vocab-sized joins.
    """
    from kubernetes_logs_datalake_spark.functions.text import bind_once, words

    w = F.filter(words(F.col(text_col)), lambda x: x != "")
    toks = df.select(F.explode(w).alias("_w"))
    uni = toks.groupBy("_w").agg(F.count("*").alias("_ca"))
    n_uni = uni.agg(F.sum("_ca").alias("_nu"))

    bigrams = bind_once(
        w,
        lambda ws: F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.struct(
                    F.element_at(ws, i).alias("a"),
                    F.element_at(ws, i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>")),
    )
    bi = (
        df.select(F.explode(bigrams).alias("_bg"))
        .groupBy(F.col("_bg.a").alias("_a"), F.col("_bg.b").alias("_b"))
        .agg(F.count("*").alias("_cab"))
    )
    n_bi = bi.agg(F.sum("_cab").alias("_nb"))

    ua = uni.select(F.col("_w").alias("_a"), F.col("_ca").alias("_cnt_a"))
    ub = uni.select(F.col("_w").alias("_b"), F.col("_ca").alias("_cnt_b"))
    joined = (
        bi.filter(F.col("_cab") >= min_count)
        .join(ua, "_a")
        .join(ub, "_b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    pmi = F.round(
        F.log2(
            (
                F.col("_cab").cast("double")
                * F.col("_nu").cast("double")
                * F.col("_nu").cast("double")
            )
            / (
                F.col("_nb").cast("double")
                * F.col("_cnt_a").cast("double")
                * F.col("_cnt_b").cast("double")
            )
        ),
        scale,
    )
    return (
        joined.select(
            F.concat_ws(" ", "_a", "_b").alias("bigram"),
            F.col("_cab").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.col("bigram"))
        .limit(k)
    )


def zipf_fit(df: DataFrame, text_col: str, k: int = 100, scale: int = 6) -> DataFrame:
    """Zipf's-law fit over the top-``k`` corpus terms: OLS slope of
    ln(freq) on ln(rank) — the corpus-health diagnostic (natural text
    slopes ≈ -1; template/generated spam and OCR noise bend the curve,
    so the slope + R² pair is a cheap per-source screen before heavier
    quality models).

    Output: ONE row (n_terms, slope, intercept, r2), rounded.

    Plan: word-count agg (one shuffle) → top-k TakeOrderedAndProject —
    the frame is ≤ k rows from here on, by construction, at ANY corpus
    size. The rank window therefore runs on a bounded single-partition
    frame (k·16 bytes), which is not the banned whole-input
    single-partition sort: the bound comes from the top-k, not from
    luck. The regression itself is one tiny agg (covar/var closed
    form).
    """
    from pyspark.sql import Window

    from kubernetes_logs_datalake_spark.functions.text import words

    top = (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(k)
        .coalesce(1)
    )
    ranked = top.withColumn(
        "_r", F.row_number().over(Window.orderBy(F.desc("n"), "word"))
    )
    x = F.log(F.col("_r").cast("double"))
    y = F.log(F.col("n").cast("double"))
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.covar_pop(x, y).alias("_cxy"),
        F.var_pop(x).alias("_vx"),
        F.var_pop(y).alias("_vy"),
        F.avg(x).alias("_mx"),
        F.avg(y).alias("_my"),
    )
    slope = F.col("_cxy") / F.col("_vx")
    return stats.select(
        "n_terms",
        F.round(slope, scale).alias("slope"),
        F.round(F.col("_my") - slope * F.col("_mx"), scale).alias("intercept"),
        F.round(
            (F.col("_cxy") * F.col("_cxy")) / (F.col("_vx") * F.col("_vy")),
            scale,
        ).alias("r2"),
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    max_len: int | None = 4,
    stopwords: tuple[str, ...] | None = None,
    scale: int = 6,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010), corpus-level:
    candidate phrases are maximal stopword-free word runs; each word
    scores degree/frequency (degree = Σ length of the phrases it
    appears in); a phrase scores the sum of its words' scores. Output:
    the top-``k`` distinct phrases by (score desc, phrase), with their
    corpus occurrence counts.

    ``max_len`` caps candidate phrase length (RAKE's standard guard:
    on stopword-poor text a whole document becomes one run, whose
    summed score always wins while being useless as a keyphrase —
    and whose length is unbounded, which also matters at scale:
    the cap bounds every downstream row width). Runs longer than
    ``max_len`` are dropped as candidates entirely (they contribute
    neither phrases nor word statistics), the Rose et al. semantics.

    Plan (r16): phrase runs are extracted MAP-SIDE — stopwords become a
    sentinel inside the staged word array and one split recovers the
    maximal stopword-free runs, so the per-doc gaps-and-islands window
    (an exchange + sort by doc) and the (doc, island) assembly
    aggregate + two island-keyed joins of the old shape all disappear.
    Phrase INSTANCES explode once and feed two straight partial-agg
    shuffles (word stats; per-phrase counts); phrase scores are
    computed on the DISTINCT phrase table (vocabulary-bounded —
    identical phrases always scored identically, so instance identity
    only matters for the count) through one word-keyed join. Word
    scores are rounded then summed as DECIMAL so identical phrases get
    bit-identical scores under any partitioning (the exact-reduce
    recipe); the final top-k is a TakeOrderedAndProject over the
    distinct-phrase agg.
    """
    from kubernetes_logs_datalake_spark.functions.text import (
        STOPWORDS_EN,
        words,
    )

    stop = stopwords or STOPWORDS_EN
    # maximal stopword-free runs, per row: stopword → '|' sentinel
    # (words are [a-z0-9]+ so the sentinel can't collide), join, split
    # on sentinel-with-surrounding-spaces, drop empties. Run text and
    # order are identical to the old window/island assembly because
    # words() positions are gap-free.
    runs = F.filter(
        F.split(
            F.array_join(
                F.transform(
                    words(F.col(text_col)),
                    lambda w: F.when(w.isin(*stop), F.lit("|")).otherwise(w),
                ),
                " ",
            ),
            r"\s*\|\s*",
        ),
        lambda p: p != "",
    )
    if max_len is not None:
        runs = F.filter(
            runs, lambda p: F.size(F.split(p, " ")) <= F.lit(max_len)
        )
    inst = df.select(F.explode(runs).alias("phrase")).select(
        "phrase", F.size(F.split(F.col("phrase"), " ")).alias("_plen")
    )
    # per-phrase instance counts (also the distinct-phrase table the
    # scoring leg reuses — vocabulary-bounded)
    ph_n = inst.groupBy("phrase", "_plen").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # RAKE word stats over candidate tokens (every word occurrence of
    # every kept instance): freq + degree
    wst = (
        inst.select(F.col("_plen"), F.explode(F.split("phrase", " ")).alias("word"))
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("_freq"),
            F.sum("_plen").alias("_deg"),
        )
        .select(
            "word",
            F.round(F.col("_deg") / F.col("_freq"), 9)
            .cast("decimal(20,9)")
            .alias("_ws"),
        )
    )
    psc = (
        ph_n.select("phrase", F.explode(F.split("phrase", " ")).alias("word"))
        .join(wst, "word")
        .groupBy("phrase")
        .agg(F.sum("_ws").alias("_score"))
    )
    return (
        ph_n.join(psc, "phrase")
        .select(
            "phrase",
            "n",
            F.round(F.col("_score").cast("double"), scale).alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(k)
    )


def vocab_growth(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_checkpoints: int = 10,
) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative (token count,
    distinct vocabulary) at ``n_checkpoints`` evenly-spaced document
    checkpoints in id order — the V(N) ≈ K·N^β curve whose flattening
    tells a corpus curator when additional data stops buying new
    vocabulary (the companion diagnostic to zipf_fit's frequency
    slope). Output: (decile, n_tokens, vocab) — pure integers, so the
    SQL oracle matches bit-for-bit; fit β downstream on the 10 points
    if wanted (ln() cross-engine ulp drift is why the fit is not baked
    in here).

    Scale shape: cumulative DISTINCT is NOT computed per checkpoint —
    each token contributes via its FIRST-occurrence doc id (one
    groupBy(token).min pass), so vocab(t) is a count of first
    occurrences at id ≤ t. Checkpoints are VALUE-space deciles of the
    id range (exact integer arithmetic over min/max — one 2-value
    agg), NOT rank-space: a global row_number() would funnel the doc
    table through one partition, the unpartitioned-window anti-pattern
    the plan gates forbid. On contiguous ids the two definitions
    coincide; on sparse ids the curve is sampled at id-density rather
    than doc-count deciles — document order is what Heaps' law walks
    either way. Two corpus-scan aggregations (token totals per id,
    first occurrences per id) reduce to ≤ |docs| metadata rows; the
    checkpoint join runs over THOSE, never the corpus.
    """
    if n_checkpoints < 1:
        raise ValueError(f"n_checkpoints must be >= 1, got {n_checkpoints}")
    from kubernetes_logs_datalake_spark.functions.text import words

    lo, hi = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if lo is None:
        raise ValueError("vocab_growth needs a non-empty corpus")
    span = hi - lo + 1
    cks = [
        (k, lo + (k * span + n_checkpoints - 1) // n_checkpoints - 1)
        for k in range(1, n_checkpoints + 1)
    ]
    cps = F.explode(
        F.array(
            *[
                F.struct(F.lit(k).alias("k"), F.lit(t).alias("t"))
                for k, t in cks
            ]
        )
    ).alias("_c")
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(words(F.col(text_col))).alias("_tk"),
    ).filter(F.col("_tk") != "")
    per_id_tokens = tok.groupBy("_id").agg(F.count(F.lit(1)).alias("_nt"))
    per_id_vocab = (
        tok.groupBy("_tk")
        .agg(F.min("_id").alias("_fid"))
        .groupBy("_fid")
        .agg(F.count(F.lit(1)).alias("_nv"))
    )
    cp_df = df.sparkSession.range(1).select(cps).select("_c.k", "_c.t")
    a = (
        cp_df.join(per_id_tokens, per_id_tokens["_id"] <= cp_df["t"])
        .groupBy("k")
        .agg(F.sum("_nt").alias("n_tokens"))
    )
    b = (
        cp_df.join(per_id_vocab, per_id_vocab["_fid"] <= cp_df["t"])
        .groupBy("k")
        .agg(F.sum("_nv").alias("vocab"))
    )
    return (
        a.join(b, "k")
        .select(F.col("k").alias("decile"), "n_tokens", "vocab")
        .orderBy("decile")
    )
