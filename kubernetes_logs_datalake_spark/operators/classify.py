"""Hashed bag-of-words linear text classifier (fastText-style scoring).

The quality-classifier stage of an LLM data pipeline (CCNet / GPT-3
style: a linear model over hashed word features scores every document,
and the score gates curation). Training happens offline; what must run
at 100 TB is *inference*, and that is a pure per-row column expression
here: tokenize once, hash each word into one of ``dim`` buckets, look
its weight up in a plan-time-constant weight vector, average, add bias.
No shuffle, no UDF, no join — a map-only stage inside whole-stage
codegen.

The bucket hash is the repo's engine-portable md5 recipe (first 8 hex
chars as an integer, mod dim) so a DuckDB oracle can replicate scores
bit-for-bit: every arithmetic step is IEEE-double add/mul in array
order on both engines (no exp/log — callers wanting a probability can
sigmoid downstream; the decision boundary score>0 is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.text import words
from kubernetes_logs_datalake_spark.functions.vectors import literal_vector


def default_weights(dim: int, seed: int = 7) -> list[float]:
    """Deterministic LCG weight vector in [-0.5, 0.5) — the stand-in
    for offline-trained weights (same generator family as the LSH
    hyperplanes; any trained ``list[float]`` drops in unchanged)."""
    state = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
    out = []
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append((state >> 11) / float(1 << 53) - 0.5)
    return out


def _bucket(word: Column, dim: int) -> Column:
    """md5-prefix bucket in [0, dim) — exact in any engine with md5."""
    return F.conv(F.substring(F.md5(word), 1, 8), 16, 10).cast("long") % dim


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = 256,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    scale: int = 9,
) -> DataFrame:
    """(id, n_words, score, keep) — mean hashed-bucket weight + bias.

    ``score = bias + (Σ_w weights[bucket(w)]) / n_words`` over the
    normalized words of ``text_col``; ``keep = score > threshold``.
    Empty documents score exactly ``bias``. The weight table rides the
    plan as ONE packed literal (see ``literal_vector``), so ``dim`` can
    be 1e5+ without analysis cost; per-row work is O(n_words).
    """
    n, score_rounded, keep = hashed_linear_columns(
        text_col, dim=dim, weights=weights, bias=bias,
        threshold=threshold, scale=scale,
    )
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        score_rounded.alias("score"),
        keep.alias("keep"),
    )


def hashed_linear_columns(
    text_col,
    *,
    dim: int = 256,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    scale: int = 9,
) -> tuple[F.Column, F.Column, F.Column]:
    """The (n_words, score, keep) COLUMN expressions behind
    :func:`hashed_linear_score` — exposed so composed reports can ride
    the classifier on another operator's scan (e.g. through
    ``gopher_quality_rules(carry_cols=...)``) instead of paying a
    second corpus scan + an id-keyed join back (r16, guide §2.4)."""
    if weights is None:
        weights = default_weights(dim)
    if len(weights) != dim:
        raise ValueError(f"weights length {len(weights)} != dim {dim}")
    wtab = literal_vector(weights)
    ws = words(F.col(text_col))
    total = F.aggregate(
        F.transform(ws, lambda w: F.element_at(wtab, (_bucket(w, dim) + 1).cast("int"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = F.size(ws)
    score = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return (
        n.cast("long"),
        F.round(score, scale),
        score > F.lit(float(threshold)),
    )


# DuckDB-side md5-prefix bucket: DuckDB has no conv(hex), so parse the
# 8 hex chars arithmetically — each digit is exact in doubles up to
# 16^7, summed as BIGINT (per-element CAST avoids the list_sum→HUGEINT
# widening). Bit-identical to Spark's conv(substr(md5,1,8),16,10).
_DDB_BUCKET = (
    "(CAST(list_sum(list_transform(range(1, 9), i ->"
    " CAST((strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1)"
    " * CAST(power(16, 8 - i) AS BIGINT) AS BIGINT))) AS BIGINT) % {dim})"
)


def hashed_linear_oracle_sql(
    table: str,
    id_col: str,
    *,
    norm_sql: str,
    words_sql: str,
    dim: int = 256,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    scale: int = 9,
) -> str:
    """DuckDB SQL generated from the SAME weights/dim/bias as the Spark
    path (single source of truth — the two cannot drift). ``repr``
    round-trips every IEEE double exactly, so the literal weight list is
    bit-identical to the packed Spark literal. ``norm_sql``/``words_sql``
    are the caller's engine-portable normalization/tokenizer SQL (the
    `_DDB_NORM`/`_DDB_WORDS` templates, already formatted)."""
    if weights is None:
        weights = default_weights(dim)
    wlist = "[" + ",".join(repr(float(v)) for v in weights) + "]"
    bucket = _DDB_BUCKET.format(dim=dim)
    mean = (
        "CASE WHEN {norm} = '' THEN 0.0 ELSE "
        "list_sum(list_transform({w}, w -> {wl}[{bucket} + 1])) / len({w}) "
        "END"
    ).format(norm=norm_sql, w=words_sql, wl=wlist, bucket=bucket)
    return """
        SELECT {idc},
               CAST(CASE WHEN {norm} = '' THEN 0 ELSE len({w}) END AS BIGINT) AS n_words,
               round({bias} + {mean}, {scale}) AS score,
               ({bias} + {mean}) > {thr} AS keep
        FROM {table}
    """.format(
        idc=id_col,
        norm=norm_sql,
        w=words_sql,
        mean=mean,
        bias=repr(float(bias)),
        thr=repr(float(threshold)),
        scale=scale,
        table=table,
    )


def hashed_tf_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 16,
    scale: int = 6,
) -> DataFrame:
    """(id, embedding: array<double>) — the hashed term-frequency
    vector (``vec[j] = |{w : bucket(w) = j}| / n_words``, rounded):
    the feature-hashing trick that turns arbitrary text into a
    fixed-width vector with no vocabulary table (Weinberger et al.
    2009). Map-only column algebra: one tokenization, one bucket pass,
    ``dim`` bounded counts — the input shape for clustering/classifier
    operators, engine-exact thanks to the md5 bucket + rounding.

    Empty documents are dropped (no direction in TF space).
    """
    from kubernetes_logs_datalake_spark.functions.text import bind_once, words

    ws = F.filter(words(F.col(text_col)), lambda x: x != "")
    vec = bind_once(
        F.transform(ws, lambda w: _bucket(w, dim)),
        lambda bl: F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.round(
                F.size(F.filter(bl, lambda b: b == j.cast("long")))
                / F.size(bl),
                scale,
            ),
        ),
    )
    return (
        df.select(F.col(id_col), F.size(ws).alias("_n"), vec.alias("embedding"))
        .filter(F.col("_n") > 0)
        .select(id_col, "embedding")
    )


def score_agreement_bins(
    df: DataFrame,
    score_col: str,
    pred_col: str,
    label_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Binned classifier-vs-reference agreement report — the curation
    diagnostic read before trusting a learned quality gate: fixed-width
    score bands over [lo, hi] (out-of-range scores clamp to the edge
    bands), and per band the predicted keep rate, the reference-label
    keep rate, and how often the two gates agree.

    Binning is pure arithmetic on the already-rounded score — no
    sigmoid, no transcendentals — so Spark and the oracle compute the
    identical band for every row (an exp()-based bin edge could flip on
    a 1-ulp libm difference). Mean score per band is an exact
    DECIMAL(20,9) sum divided once; the rates are exact integer ratios
    in one double op. Map-only binning + one n_bins-row agg.
    """
    if n_bins < 1 or not hi > lo:
        raise ValueError(f"need hi > lo and n_bins >= 1, got {lo}, {hi}, {n_bins}")
    width = hi - lo
    b = (
        F.least(
            F.greatest(
                F.floor(
                    (F.col(score_col) - F.lit(lo)) / F.lit(width) * F.lit(n_bins)
                ),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
    ).cast("int")
    n = F.count(F.lit(1))
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            n.alias("n_docs"),
            F.round(
                F.sum(F.col(score_col).cast("decimal(20,9)")).cast("double")
                / n,
                9,
            ).alias("mean_score"),
            F.round(
                F.sum(F.when(F.col(pred_col), 1).otherwise(0)) * F.lit(1.0) / n,
                6,
            ).alias("pred_keep_rate"),
            F.round(
                F.sum(F.when(F.col(label_col), 1).otherwise(0))
                * F.lit(1.0)
                / n,
                6,
            ).alias("label_keep_rate"),
            F.round(
                F.sum(
                    F.when(F.col(pred_col) == F.col(label_col), 1).otherwise(0)
                )
                * F.lit(1.0)
                / n,
                6,
            ).alias("agreement"),
        )
        .orderBy("bin")
    )


def cluster_labels(
    assigned: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
    min_df: int = 5,
) -> DataFrame:
    """Topic-cluster interpretability: the ``top_n`` most DISTINCTIVE
    terms per cluster, scored by relative document frequency —
    (df_in_cluster / cluster_size) ÷ (df_global / N) — the lift a term
    gets from being in this cluster. ``min_df`` drops corpus-rare noise
    terms that would otherwise dominate on tiny denominators.

    The score is computed as ONE double division of two exact integer
    products (df_c·N) / (size_c·df_g) — no per-term float chain, so any
    engine reproduces it. Plan: word explode → distinct (doc, term) →
    one doc-keyed join to the assignment → (cluster, term) and term
    aggs → broadcast of the tiny cluster-size/N scalars → a
    cluster-partitioned rank window over ≤ |vocab| rows per cluster.
    Output: (cluster, term, df_in_cluster, score, rank ≤ top_n).
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark.sql import Window

    from kubernetes_logs_datalake_spark.functions.text import words

    dw = (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(words(F.col(text_col))).alias("_t"),
        )
        .filter(F.col("_t") != "")
        .distinct()
    )
    asg = assigned.select(F.col(id_col).alias("_id"), "cluster")
    # lift is (df_c/size_c)/(df_g/N) over ONE corpus: restrict the
    # global-df leg to assigned docs too, so a caller whose `assigned`
    # is a subset of `df` doesn't silently mix denominators
    dwa = dw.join(asg, "_id")
    dfg = (
        dwa.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_dfg"))
        .filter(F.col("_dfg") >= min_df)
    )
    dwc = dwa.groupBy("cluster", "_t").agg(F.count(F.lit(1)).alias("_dfc"))
    sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("_sz"))
    n_docs = asg.agg(F.count(F.lit(1)).alias("_nn"))
    scored = (
        dwc.join(dfg, "_t")
        .join(F.broadcast(sizes), "cluster")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "cluster",
            F.col("_t").alias("term"),
            F.col("_dfc").alias("df_in_cluster"),
            F.round(
                (F.col("_dfc") * F.col("_nn")).cast("double")
                / (F.col("_sz") * F.col("_dfg")).cast("double"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("score"), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .orderBy("cluster", "rank")
    )
