"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw-corpus document by how much more
likely its hashed n-gram bag is under a *target* distribution (the
data you want more of) than under the raw distribution, then resample
by weight.

Spark shape, end to end:

- **Features**: word uni- through n-grams hashed to ``buckets`` ids
  via the repo's portable md5 recipe — the fixed-width bag the paper
  uses, so model state is O(buckets) regardless of vocabulary.
- **Model**: two bucket-count aggregates (one scan of each corpus,
  map-side partials into ≤ ``buckets`` rows each) joined onto a full
  bucket grid with add-1 smoothing; the per-bucket log-likelihood
  ratio is rounded to 12 dp and cast DECIMAL — the repo's exact-sum
  recipe, so scores are bit-deterministic across engines.
- **Scoring**: explode grams → **broadcast** join the ≤ buckets-row
  ratio table → one partial-agg shuffle keyed by doc id. The raw
  corpus is touched twice (model fit + scoring), never shuffled by
  anything wider than the doc id.
- **Resampling**: Gumbel top-k over the weights with the portable
  md5-uniform (deterministic "randomness", same recipe as the
  stratified sampler), which draws k docs proportionally to their
  softmax'd importance — the paper's resample step as one
  TakeOrderedAndProject.

Every step is hash-oracle-checkable; see ``_ddb_dsir_sql`` in
``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.text import shingles, words
from kubernetes_logs_datalake_spark.operators.sketch import uniform_hash


def hashed_grams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    buckets: int = 512,
    keep: list[str] | None = None,
) -> DataFrame:
    """One row per gram occurrence: (``id_col``, bucket[, *keep]) with
    word 1..n-grams hashed to ``buckets`` ids (portable md5 mod
    recipe); ``keep`` columns ride along unchanged."""
    keep = keep or []
    gram_lists = [words(F.col(text_col))] + [
        shingles(F.col(text_col), k) for k in range(2, n + 1)
    ]
    grams = F.concat(*gram_lists) if len(gram_lists) > 1 else gram_lists[0]
    exploded = df.select(
        F.col(id_col), F.explode(grams).alias("_gram"), *keep
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("_gram")), 1, 8), 16, 10).cast("long")
        % buckets
    )
    return exploded.select(F.col(id_col), bucket.alias("bucket"), *keep)


def dsir_log_ratio_model(
    target_grams: DataFrame, raw_grams: DataFrame, buckets: int = 512
) -> DataFrame:
    """Per-bucket importance log-ratio table (≤ ``buckets`` rows):
    round12(ln p_target(b) − ln p_raw(b)) as DECIMAL(25,12), with add-1
    smoothing over the full bucket grid so unseen buckets score too."""
    tc = target_grams.groupBy("bucket").agg(F.count("*").alias("_ct"))
    rc = raw_grams.groupBy("bucket").agg(F.count("*").alias("_cr"))
    return _log_ratio_from_counts(target_grams.sparkSession, tc, rc, buckets)


def _log_ratio_from_counts(
    spark, tc: DataFrame, rc: DataFrame, buckets: int
) -> DataFrame:
    """(bucket, log_ratio) from per-bucket target/raw occurrence
    counts — the shared model-fit tail of :func:`dsir_log_ratio_model`
    and the one-pass flagged path in :func:`dsir_weights`."""
    tot_t = tc.agg(F.sum("_ct").alias("_nt"))
    tot_r = rc.agg(F.sum("_cr").alias("_nr"))
    grid = spark.range(buckets).select(F.col("id").alias("bucket"))
    return (
        grid.join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce("_ct", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("_nt", F.lit(0)) + buckets)
                )
                - F.log(
                    (F.coalesce("_cr", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("_nr", F.lit(0)) + buckets)
                ),
                12,
            )
            .cast("decimal(25,12)")
            .alias("log_ratio"),
        )
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    buckets: int = 512,
    scale: int = 6,
    target_condition=None,
) -> DataFrame:
    """Importance log-weight per raw-corpus document:
    (``id_col``, n_feats, log_weight). Positive = more target-like.
    Documents with no grams (empty text) get weight 0.0.

    When the target is a filter of the raw corpus (the common case —
    "more like the wiki partition"), pass ``target_condition`` (a
    boolean Column over ``raw``) instead of relying on ``target``: the
    model's two bucket distributions then come from ONE flagged
    tokenization pass (``count`` + ``sum(flag)`` in the same shuffle)
    instead of tokenizing the target subset a second time — the
    identical counts, one less corpus scan. ``target`` is ignored when
    the condition is given (pass None).
    """
    if target_condition is not None:
        flagged = raw.withColumn("_is_t", target_condition.cast("long"))
        fg = hashed_grams(flagged, id_col, text_col, n, buckets, keep=["_is_t"])
        counts = fg.groupBy("bucket").agg(
            F.count("*").alias("_cr"), F.sum("_is_t").alias("_ct")
        )
        tc = counts.select("bucket", "_ct").filter(F.col("_ct") > 0)
        rc = counts.select("bucket", "_cr")
        model = _log_ratio_from_counts(raw.sparkSession, tc, rc, buckets)
        rg = fg.select(id_col, "bucket")
    else:
        tg = hashed_grams(target, id_col, text_col, n, buckets)
        rg = hashed_grams(raw, id_col, text_col, n, buckets)
        model = dsir_log_ratio_model(tg, rg, buckets)
    scored = (
        rg.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("_nf"),
            F.round(F.sum("log_ratio").cast("double"), scale).alias("_w"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("_nf", F.lit(0)).alias("n_feats"),
            F.coalesce("_w", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_resample(
    weights: DataFrame, id_col: str, k: int, scale: int = 6
) -> DataFrame:
    """Gumbel top-k resampling over importance weights: draw ``k``
    documents with probability proportional to exp(log_weight) — the
    DSIR resample step — using the portable md5-uniform for the Gumbel
    noise so the draw is deterministic and engine-reproducible.
    Output: (``id_col``, log_weight, gumbel_key), ordered by key desc.
    One TakeOrderedAndProject; no global sort materializes.
    """
    u = uniform_hash(id_col)
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), scale)
    return (
        weights.select(
            F.col(id_col),
            "log_weight",
            key.alias("gumbel_key"),
        )
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )
