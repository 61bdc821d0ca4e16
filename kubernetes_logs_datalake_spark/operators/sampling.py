"""Deterministic sampling & dataset-mixing operators for training-data
pipelines.

Training corpus preparation needs reproducible subsetting: the same
inputs must select the same rows on any cluster size, any partitioning,
any engine — so none of these use ``rand()``/``TABLESAMPLE`` (both are
partition-dependent). Instead rows are ordered/thresholded on the md5
of their id, which every engine computes identically; the DuckDB
oracles mirror each operator exactly.

- :func:`stratified_sample` — exactly ``k`` rows per stratum (language,
  source, quality bin), the balanced-eval-set maker. One window pass:
  ``row_number() over (partition by stratum order by md5(id), id)``.
- :func:`hash_sample` — Bernoulli-style rate sampling by comparing an
  md5 prefix against a hex threshold (lexicographic hex compare ==
  numeric compare at fixed width). O(scan), no shuffle, no state.
- :func:`mix_datasets` — weighted mixture of corpora: per-source
  ``hash_sample`` then union — the "data mixture" step in front of
  tokenizer/training jobs.
- :func:`vocab_topk` — corpus vocabulary with counts (tokenizer prep):
  explode → count → top-k compiles to TakeOrderedAndProject.
- :func:`length_bins` — equal-frequency (ntile) binning of documents by
  token count, for curriculum/bucketed batching.

At 100 TB: stratified_sample shuffles once on the stratum key;
hash_sample/mix are shuffle-free scans; vocab_topk is one partial-agg
shuffle on the word; length_bins is the only global-sort operator
(ntile needs a total order) — bin on a per-partition quantile sketch
(``approxQuantile`` cutpoints) instead when the exact equal-frequency
property isn't required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_of(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, k: int
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically
    pseudo-random: rows ranked by (md5(id), id) within each stratum."""
    w = Window.partitionBy(stratum_col).orderBy(_md5_of(id_col), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col,
    k: int,
    scale: int = 12,
) -> DataFrame:
    """Weighted sampling without replacement, per stratum: exactly
    min(k, |stratum|) rows drawn with probability proportional to
    ``weight_col`` — Efraimidis & Spirakis (2006) A-ES keys,
    ``u^(1/w)`` with the portable md5-uniform ``u``, so the draw is
    deterministic and engine-reproducible (the weighted analog of
    :func:`stratified_sample`; use it to sample documents ∝ token
    count, clicks ∝ dwell time, …).

    One narrow shuffle on the stratum key; the rank-limit window
    rewrites to WindowGroupLimit (≤ k rows per partition survive before
    the exchange), so per-stratum state is O(k) — a distributed
    reservoir. The key is A-ES in LOG form, ``ln(u)/w`` (same ordering
    as ``u^(1/w)``; ln is monotone and ln u < 0): the naive power form
    underflows to 0.0 for small weights and saturates toward 1.0 for
    large ones once rounded, collapsing the draw — the log form stays
    spread across the whole weight range. Non-positive weights get a
    NULL key and sort last (``desc_nulls_last``), entering only when a
    stratum has fewer than k positive-weight rows. The key is rounded
    to ``scale`` so cross-engine float parity holds; ties break by id.
    """
    from kubernetes_logs_datalake_spark.operators.sketch import uniform_hash

    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = uniform_hash(id_col)
    key = F.when(
        wcol > 0, F.round(F.log(u) / wcol.cast("double"), scale)
    ).otherwise(F.lit(None))
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("_aes_key").desc_nulls_last(), F.col(id_col)
    )
    return (
        df.withColumn("_aes_key", key)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk", "_aes_key")
    )


def hash_rate_threshold(rate: float) -> str:
    """Threshold such that md5-prefix < threshold selects ~``rate`` of
    rows (md5 prefixes are uniform on [0, 16^8)). For rate < 1 the
    result is an 8-hex-digit string (same-width lexicographic compare ==
    numeric compare); rate == 1.0 returns ``"g"``, which sorts above
    every hex digit so the compare keeps all rows — the naive
    ``format(16**8, "08x")`` is 9 chars and would *lose* the same-width
    invariant (lexicographically below ``"2..."``, silently keeping only
    ~6% of rows)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def hash_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose md5(id)
    8-hex prefix is below the rate threshold. Same-width lexicographic
    hex compare == numeric compare, and md5 is engine-portable, so the
    selection is reproducible everywhere (unlike rand()/TABLESAMPLE).
    Rows keep their correlated fate across runs and engines — also the
    standard trick for train/holdout splits that survive re-ingestion.
    ``rate >= 1.0`` short-circuits to the input unchanged."""
    if rate >= 1.0:
        hash_rate_threshold(rate)  # still validate the range
        return df
    return df.filter(
        F.substring(_md5_of(id_col), 1, 8) < F.lit(hash_rate_threshold(rate))
    )


def mix_datasets(parts: list[tuple[DataFrame, float]], id_col: str) -> DataFrame:
    """Weighted dataset mixture: per-source deterministic rate sample,
    unioned by name. The mixture-weights step of a training-data
    pipeline; each source scans once, shuffle-free."""
    if not parts:
        raise ValueError("mix_datasets needs at least one (df, rate) pair")
    out = None
    for df, rate in parts:
        sampled = df if rate >= 1.0 else hash_sample(df, id_col, rate)
        out = sampled if out is None else out.unionByName(sampled)
    return out


def token_budget_allocation(
    df: DataFrame,
    source_col: str,
    text_col: str,
    weights: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Training-mix planner: given target mixture ``weights`` per source
    and a total token ``budget``, compute what each source must supply
    and how to get it. Output per source: (source, n_docs,
    tokens_available, target_tokens, sample_rate, epochs) where
    ``sample_rate`` < 1 means downsample, and ``epochs`` > 1 means the
    source is over-asked and must repeat (the up-sampling factor —
    surfaced rather than silently clipped, since repeating data has
    known quality costs).

    One scan + one partial-agg shuffle on the source key (cardinality =
    number of sources); the allocation arithmetic is exact integer/
    decimal column math so any engine reproduces it.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    from kubernetes_logs_datalake_spark.functions.text import token_count

    per_source = (
        df.select(F.col(source_col).alias("source"), token_count(text_col).alias("_t"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("_t").alias("tokens_available"))
    )
    # normalize weights to integer parts-per-million driver-side, then
    # target = budget·ppm DIV 1e6 — integer-exact and reproducible in
    # any engine (float weight division would round differently)
    ppm = {s: round(w / total_w * 1_000_000) for s, w in weights.items()}
    # the weighted-source list drives the output (LEFT join): a source
    # with NO rows in df still gets its allocation row (0 available,
    # rate 0) — silently dropping it would under-allocate the budget
    # with no signal, the worst possible failure for a mix plan
    src_df = df.sparkSession.createDataFrame(
        sorted(ppm.items()), "source string, _ppm int"
    )
    alloc = src_df.join(per_source, "source", "left").select(
        "source",
        "_ppm",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("tokens_available", F.lit(0)).alias("tokens_available"),
    )
    # decimal(38,0) × int / 1e6 has ≤6 fractional digits → the scale-6
    # decimal is exact; cast to long truncates = floor for positives
    tgt = (
        (F.lit(budget_tokens).cast("decimal(38,0)") * F.col("_ppm")) / F.lit(1_000_000)
    ).cast("long")
    has_tokens = F.col("tokens_available") > 0
    ratio = tgt.cast("double") / F.col("tokens_available").cast("double")
    return alloc.select(
        "source",
        "n_docs",
        "tokens_available",
        tgt.alias("target_tokens"),
        # a source with zero tokens can supply nothing: rate 0/epochs 0
        # (not the Infinity-derived garbage a bare division would give)
        F.when(has_tokens, F.round(F.least(F.lit(1.0), ratio), 6))
        .otherwise(F.lit(0.0))
        .alias("sample_rate"),
        F.when(has_tokens, F.ceil(ratio).cast("int"))
        .otherwise(F.lit(0))
        .alias("epochs"),
    )


def vocab_topk(
    df: DataFrame, text_col: str, k: int = 100
) -> DataFrame:
    """Corpus vocabulary: top-k words by document-occurrence count
    (ties broken by word for determinism). One explode + one
    partial-agg shuffle on the word; top-k is TakeOrderedAndProject."""
    from kubernetes_logs_datalake_spark.functions.text import words

    return (
        df.select(F.explode(words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(k)
    )


def length_bins(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bins: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equal-frequency token-length bins (1..n_bins) per document —
    curriculum/bucketed-batching prep. Exact ntile semantics (identical
    to ``ntile(n) OVER (ORDER BY n_tokens, id)``), computed
    **distributed**:

    1. ``repartitionByRange`` on (n_tokens, id) orders ranges across
       partitions (range shuffle — each partition holds a contiguous
       slice of the total order, nothing ever concentrates on one node);
    2. per-partition ``row_number`` over a *partitioned* window gives
       local ranks in parallel;
    3. partition row-counts (one tiny row per partition) turn local
       ranks into exact global ranks via a broadcast join;
    4. the SQL ntile formula (first ``N % B`` bins get one extra row)
       is applied as column math on the global rank.

    This is the repartitionByRange + partition-offset-rank shape — the
    100 TB-safe replacement for the unpartitioned-window ntile (which
    Spark itself warns moves ALL data to a single partition). The
    per-row pass is deterministic, so the counts job and the rank job
    see identical partition assignments.
    """
    from kubernetes_logs_datalake_spark.functions.text import token_count

    with_len = df.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
    from kubernetes_logs_datalake_spark.session import shuffle_partitions

    spark = df.sparkSession
    nparts = num_partitions or shuffle_partitions(spark)
    # localCheckpoint pins the range partitioning: the counts job and
    # the rank job must see the SAME partition assignment, but
    # RangePartitioner samples with a nondeterministic seed, so a
    # recomputation could draw different bounds and corrupt the offsets
    part = (
        with_len.repartitionByRange(nparts, F.col("n_tokens"), F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    # tiny driver-side collect: one (pid, count) row per partition
    counts = sorted(
        (r["_pid"], r["n"])
        for r in part.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    total = sum(n for _, n in counts)
    if total == 0:
        return part.select(id_col, "n_tokens", F.lit(None).cast("int").alias("bin"))
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")

    w = Window.partitionBy("_pid").orderBy("n_tokens", id_col)
    ranked = (
        part.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("_rank", F.col("_off") + F.col("_lrn"))
    )
    # SQL ntile: base rows per bin, first `rem` bins take one extra
    base, rem = total // n_bins, total % n_bins
    cut = rem * (base + 1)
    r = F.col("_rank")
    bin_expr = F.when(
        r <= cut, F.floor((r - 1) / (base + 1)) + 1
    ).otherwise(F.lit(rem) + F.floor((r - cut - 1) / max(base, 1)) + 1)
    return ranked.select(id_col, "n_tokens", bin_expr.cast("int").alias("bin"))


def length_bins_approx(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_bins: int = 4,
    relative_error: float = 0.01,
) -> DataFrame:
    """Scale variant of :func:`length_bins`: bin by approxQuantile
    cutpoints instead of a global-sort ntile.

    Two passes, neither a global sort: a Greenwald-Khanna quantile
    sketch (one scan, mergeable per partition) yields the cutpoints,
    then a shuffle-free scan assigns ``bin = 1 + #cutpoints below``.
    Bins are boundary-approximate (ties and sketch error move rows near
    a cutpoint by at most one bin) but the operator touches each row
    twice and never shuffles it — the 100 TB shape. :func:`length_bins`
    is its exactness oracle in tests.
    """
    from kubernetes_logs_datalake_spark.functions.text import token_count

    with_len = df.select(F.col(id_col), token_count(text_col).alias("n_tokens"))
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = with_len.stat.approxQuantile("n_tokens", probs, relative_error)
    bin_expr = F.lit(1)
    for c in cuts:
        bin_expr = bin_expr + F.when(F.col("n_tokens") > c, 1).otherwise(0)
    return with_len.withColumn("bin", bin_expr.cast("int"))


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    shards: int = 32,
) -> DataFrame:
    """Sequence packing for pretraining batches: assign each document a
    (shard, bin) so every bin holds ~``budget`` tokens — the step that
    turns a shuffled corpus into fixed-token-budget training batches.
    Output: (id, n_tokens, shard, bin).

    Contiguous cumulative packing: documents are sharded by
    ``id % shards`` (callers with clustered ids should pre-hash), then
    within a shard, walking ids in order, ``bin = floor(exclusive-
    cumsum(tokens) / budget)`` — a document straddling a boundary lands
    in the earlier bin (bins overflow by at most one document, the
    standard "packed sequences with boundary overflow" scheme; exact
    first-fit packing is inherently sequential and would not
    distribute).

    Plan: one shuffle on the shard key, a PARTITIONED window cumsum per
    shard (never global — shard count scales with the cluster), map-side
    bin math. State per task is one running sum.
    """
    from kubernetes_logs_datalake_spark.functions.text import token_count

    toks = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.withColumn(
        "bin", F.floor(before / F.lit(budget)).cast("long")
    )


def chunk_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Overlapping passage chunking (the RAG/retrieval indexing step):
    split each document into word windows of ``size`` tokens advancing
    by ``size - overlap``, so consecutive chunks share ``overlap``
    tokens and no token is lost. Output: (id, chunk_idx, start_word,
    n_words, chunk_text); empty documents yield no chunks, documents
    shorter than ``size`` yield exactly one.

    A pure map stage: the window arithmetic and slicing are array HOFs
    over one ``words()`` pass, then a single posexplode — no shuffle,
    no UDF; chunk count per row is O(n_tokens/stride).
    """
    from kubernetes_logs_datalake_spark.functions.text import bind_once, words

    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap

    def chunks_of(w):
        # w is a lambda-bound variable (bind_once): referencing the
        # words() expression directly here would re-tokenize per chunk
        n = F.size(w)
        n_chunks = F.when(n <= size, F.lit(1)).otherwise(
            (F.lit(1) + F.floor((n - size + stride - 1) / F.lit(stride)))
            .cast("int")
        )
        return F.when(n == 0, F.array().cast(
            "array<struct<start_word:int,_ws:array<string>>>"
        )).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda k: F.struct(
                    (k * stride).alias("start_word"),
                    F.slice(w, k * stride + 1, size).alias("_ws"),
                ),
            )
        )

    out = df.select(
        F.col(id_col),
        F.posexplode(
            bind_once(words(F.col(text_col)), chunks_of)
        ).alias("chunk_idx", "_c"),
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("_c.start_word").cast("long").alias("start_word"),
        F.size("_c._ws").cast("long").alias("n_words"),
        F.array_join("_c._ws", " ").alias("chunk_text"),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: list[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    from the md5(id) 8-hex prefix against cumulative fraction
    thresholds — the standard "split that survives re-ingestion" trick
    (same family as :func:`hash_sample`): a document's fate is a pure
    function of its id, so shards can be split independently with no
    shuffle, no rand(), and no coordination, and the split is identical
    on every engine that has md5.

    ``fractions`` is an ordered list of (label, fraction) summing to
    1.0; the last label absorbs hash values at the very top of the
    range (so rounding in the threshold arithmetic can never drop a
    row). Map-only: one hash per row, no shuffle.
    """
    fracs = list(fractions)
    total = sum(f for _, f in fracs)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    prefix = F.substring(_md5_of(id_col), 1, 8)
    cum = 0.0
    expr = None
    for label, frac in fracs[:-1]:
        cum += frac
        cond = prefix < F.lit(hash_rate_threshold(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = fracs[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def temperature_mix_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.3,
    scale: int = 6,
) -> DataFrame:
    """Temperature-scaled multinomial sampling rates per group — the
    mT5/XLM-R language-balancing formula (Xue et al. 2021 §3.1;
    Conneau et al. 2020): q_l ∝ p_l^α, where p_l is a group's share of
    the corpus and α < 1 flattens the distribution so low-resource
    groups are upsampled relative to their raw share.

    Output: (group, n_rows, share, rate, boost) where ``share`` = p_l,
    ``rate`` = q_l (the normalized sampling probability) and ``boost``
    = q_l / p_l (the per-group over/under-sampling factor). One
    partial-agg shuffle at group cardinality; the normalization sums
    12-dp-rounded powers in DECIMAL so the denominator — and therefore
    every rate — is order-independent and engine-exact.
    """
    g = df.groupBy(group_col).agg(F.count("*").alias("n_rows"))
    tot = g.agg(F.sum("n_rows").alias("_tot"))
    g = g.crossJoin(F.broadcast(tot))
    share = F.col("n_rows") / F.col("_tot")
    powed = F.round(F.pow(share, F.lit(alpha)), 12).cast("decimal(25,12)")
    g = g.withColumn("_pw", powed)
    denom = g.agg(F.sum("_pw").alias("_den"))
    g = g.crossJoin(F.broadcast(denom))
    rate = F.round(F.col("_pw").cast("double") / F.col("_den").cast("double"), scale)
    return g.select(
        F.col(group_col),
        F.col("n_rows"),
        F.round(share, scale).alias("share"),
        rate.alias("rate"),
        F.round(rate / share, scale).alias("boost"),
    )


def largest_remainder_allocation(
    df: DataFrame,
    group_col: str,
    target: int,
) -> DataFrame:
    """Epoch-plan allocation: split an exact ``target`` row budget
    across groups proportionally to their corpus counts with the
    largest-remainder method (Hamilton apportionment) — the step after
    temperature_mix_rates when a pretrain epoch needs an INTEGER
    document count per source that sums to the budget exactly (floats
    rounded per-group drift off the budget; largest remainder never
    does).

    All integer arithmetic: base_g = ⌊target·n_g / N⌋ and remainder
    rem_g = (target·n_g) mod N; the target − Σbase leftover goes to
    the largest rem_g (ties to the group key ascending). The remainder
    ranking is a groups×groups self-join — groups are FEW by
    definition (sources/languages), so the tiny quadratic join beats
    an unpartitioned window (banned by the plan gates) and stays
    engine-portable. Output: (group, n_rows, alloc), Σalloc = target.
    """
    if target < 0:
        raise ValueError(f"target must be >= 0, got {target}")
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    tot = counts.agg(F.sum("_n").alias("_tot"))
    base = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "_g",
            "_n",
            F.expr(f"CAST({target} AS BIGINT) * _n DIV _tot").alias("_base"),
            F.expr(f"(CAST({target} AS BIGINT) * _n) % _tot").alias("_rem"),
        )
    )
    # leftover = target − Σbase, computed as a 1-row aggregate and
    # broadcast back (the scalar-join idiom, not a window)
    lo = base.agg(
        (F.lit(target) - F.sum("_base")).cast("long").alias("_lo")
    )
    a = base.alias("a")
    b = base.select(
        F.col("_g").alias("_g2"), F.col("_rem").alias("_rem2")
    ).alias("b")
    ahead = (
        a.join(
            F.broadcast(b),
            (F.col("b._rem2") > F.col("a._rem"))
            | ((F.col("b._rem2") == F.col("a._rem"))
               & (F.col("b._g2") < F.col("a._g"))),
            "left",
        )
        .groupBy("a._g", "a._n", "a._base", "a._rem")
        .agg(F.count(F.col("b._g2")).alias("_ahead"))
    )
    return (
        ahead.crossJoin(F.broadcast(lo))
        .select(
            F.col("_g").alias(group_col),
            F.col("_n").alias("n_rows"),
            (
                F.col("_base")
                + F.when(F.col("_ahead") < F.col("_lo"), 1).otherwise(0)
            ).alias("alloc"),
        )
        .orderBy(group_col)
    )
