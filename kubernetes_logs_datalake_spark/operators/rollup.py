"""Time-bucket rollups over nanosecond event streams.

The hypertable-style continuous-aggregate pattern: bucket the ns-long
event time into fixed windows with pure integer arithmetic (no timestamp
conversion in the hot path — bucketing a long is a single multiply-free
modulo, stays in codegen, and pushes down cleanly), then ordinary
groupBy aggregation, which Spark executes with map-side partial
aggregation — the rollup shuffles only (bucket, key, partial-agg) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.time_ns import epoch_ns_col

NS = {"second": 10**9, "minute": 60 * 10**9, "hour": 3600 * 10**9, "day": 86400 * 10**9}


def bucket_ns(ts_ns: Column | str, every: str = "hour") -> Column:
    """Tumbling-window bucket start (ns since epoch, long)."""
    c = F.col(ts_ns) if isinstance(ts_ns, str) else ts_ns
    width = NS[every]
    return (c - F.pmod(c, F.lit(width))).alias("bucket_ns")


def rollup_events(
    df: DataFrame,
    ts_col: str = "ts",
    every: str = "hour",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Continuous-aggregate rollup: (bucket, *keys) → aggregates.

    Schema-adaptive on the time column (ns long or µs timestamp —
    never hard-assume the input's physical type; the reference infers
    schema at query time, y-logcli:267-273)."""
    aggs = aggs or [F.count("*").alias("n")]
    ts_ns = epoch_ns_col(df, ts_col)
    group_cols = [bucket_ns(ts_ns, every)] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*group_cols).agg(*aggs)


def _floor_div(x: Column, d: int) -> Column:
    """Exact floor division of an integer column by a positive literal,
    without float rounding risk: ``x - pmod(x, d)`` is an exact multiple
    of ``d`` (pmod is floor-mod, so this also floors negative ``x``),
    and dividing an exact multiple yields an exact double → long."""
    return ((x - F.pmod(x, F.lit(d))) / F.lit(d)).cast("long")


def hopping_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    window_us: int = 600_000_000,
    slide_us: int = 300_000_000,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Hopping (sliding) window rollup: every event is counted in each
    window ``[start, start + window_us)`` whose start is a multiple of
    ``slide_us`` — the overlapping-window analog of :func:`rollup_events`
    (Spark's ``F.window(ts, w, s)`` semantics, kept in integer epoch-µs
    arithmetic so the result is bit-identical across engines).

    Plan shape for scale: each event expands to exactly
    ``window_us / slide_us`` window-index rows (a constant, typically
    2–12 — NOT the window contents), via a ``sequence`` + ``explode``
    that stays in codegen; then one map-side-combined groupBy on
    (window_start, keys). Cost is overlap-factor × the tumbling rollup,
    independent of window length in time.
    """
    aggs = aggs or [F.count("*").alias("n")]
    exploded = hopping_expand(df, ts_col, window_us, slide_us)
    group_cols = [F.col("window_start_us")] + [F.col(k) for k in (keys or [])]
    return exploded.groupBy(*group_cols).agg(*aggs)


def hopping_expand(
    df: DataFrame,
    ts_col: str = "ts",
    window_us: int = 600_000_000,
    slide_us: int = 300_000_000,
) -> DataFrame:
    """The hopping-window membership expansion alone: the input plus a
    ``window_start_us`` column, one row per (event, covering window) —
    exactly ``window_us / slide_us`` rows per event. Shared by
    :func:`hopping_rollup` (counts/sums per window) and the sliding
    sketch queries (e.g. KMV distinct per window), so the window
    arithmetic lives in one place."""
    if window_us <= 0 or slide_us <= 0 or window_us % slide_us != 0:
        raise ValueError("window_us must be a positive multiple of slide_us")
    from kubernetes_logs_datalake_spark.functions.time_ns import epoch_us_col

    ts_us = epoch_us_col(df, ts_col)
    # window index i covers t iff i*slide <= t < i*slide + window
    #   ⇔ floor_div(t - window, slide) + 1 <= i <= floor_div(t, slide)
    lo = _floor_div(ts_us - F.lit(window_us), slide_us) + F.lit(1)
    hi = _floor_div(ts_us, slide_us)
    exploded = df.withColumn("_wi", F.explode(F.sequence(lo, hi)))
    return exploded.withColumn(
        "window_start_us", (F.col("_wi") * F.lit(slide_us)).cast("long")
    ).drop("_wi")


def gapfill_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    every: str = "hour",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    locf_cols: list[str] | None = None,
    zero_fill: list[str] | None = None,
) -> DataFrame:
    """Gap-filled continuous aggregate (the `time_bucket_gapfill` +
    `locf` shape of hypertable stores): roll up per (bucket, *keys),
    then densify each key's series over its own [min, max] bucket span
    — missing buckets appear with ``is_gap=true``, columns named in
    ``zero_fill`` (default: the conventional count column ``n`` when
    present) coalesced to 0, and each column in ``locf_cols`` also
    emitted as ``<col>_locf`` carrying the last observed value forward.
    Gap detection uses an internal presence marker, never the agg
    values — an all-NULL aggregate over present rows is NOT a gap.

    Scale shape: the grid generates from ONE row per key
    (``sequence(min, max, step)`` + explode — span/width rows per key,
    no driver loop), the join back to the rollup is (key, bucket)-keyed
    on already-aggregated rows, and LOCF is a partitioned running
    window — nothing touches raw events twice.
    """
    keys = keys or []
    aggs = aggs or [F.count("*").alias("n")]
    locf_cols = locf_cols or []
    width = NS[every]
    rolled = rollup_events(df, ts_col=ts_col, every=every, keys=keys, aggs=aggs)
    span = rolled.groupBy(*keys).agg(
        F.min("bucket_ns").alias("_mn"), F.max("bucket_ns").alias("_mx")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.lit(width))
        ).alias("bucket_ns"),
    )
    agg_names = [c for c in rolled.columns if c != "bucket_ns" and c not in keys]
    if zero_fill is None:
        zero_fill = ["n"] if "n" in agg_names else []
    missing = [c for c in zero_fill if c not in agg_names]
    if missing:
        raise ValueError(f"zero_fill columns not in aggregates: {missing}")
    joined = grid.join(
        rolled.withColumn("_present", F.lit(True)),
        [*keys, "bucket_ns"],
        "left",
    )
    filled = [
        F.coalesce(F.col(c), F.lit(0)).alias(c) if c in zero_fill else F.col(c)
        for c in agg_names
    ]
    out = joined.select(
        *keys, "bucket_ns", *filled, F.col("_present").isNull().alias("is_gap")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket_ns")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in locf_cols:
        out = out.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w))
    return out


def burn_rate_alerts(
    df: DataFrame,
    ts_col: str,
    bad_col,
    short_us: int = 5 * 60 * 1_000_000,
    long_us: int = 3600 * 1_000_000,
    ratio: float = 1.2,
    min_events: int = 10,
) -> DataFrame:
    """Multiwindow burn-rate alerting (the SRE-workbook pattern): a
    short window's bad-event rate must exceed ``ratio`` × its enclosing
    long window's rate — short-only alerting pages on noise, long-only
    pages too late; the AND of both resolutions is the standard fix.

    ``bad_col`` is a boolean Column/name marking budget-burning rows.
    Output: one row per short bucket (bucket_us, n_events, n_bad,
    rate_short, rate_long, alert) with ``alert`` requiring
    ``min_events`` in the short bucket so empty-ish windows can't fire.
    ``long_us`` must be a multiple of ``short_us`` so short buckets
    nest exactly.

    Plan: the same scan feeds both resolutions — the long rollup is a
    second agg over the SHORT buckets (short nests in long, so
    map-side partials combine), then a bucket-keyed equi-join of two
    tiny rollup tables; rates are exact integer ratios in one double
    op each.
    """
    if long_us % short_us != 0:
        raise ValueError(f"long_us {long_us} must be a multiple of short_us {short_us}")
    bad = F.col(bad_col) if isinstance(bad_col, str) else bad_col
    short = (
        df.select(
            (F.col(ts_col) - F.col(ts_col) % short_us).alias("bucket_us"),
            bad.cast("int").alias("_bad"),
        )
        .groupBy("bucket_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_bad").alias("n_bad"),
        )
        .withColumn("_lb", F.col("bucket_us") - F.col("bucket_us") % long_us)
    )
    long_ = short.groupBy("_lb").agg(
        F.sum("n_events").alias("_ln"),
        F.sum("n_bad").alias("_lbad"),
    )
    joined = short.join(long_, "_lb")
    rate_s = F.col("n_bad") * F.lit(1.0) / F.col("n_events")
    rate_l = F.col("_lbad") * F.lit(1.0) / F.col("_ln")
    return joined.select(
        "bucket_us",
        "n_events",
        "n_bad",
        F.round(rate_s, 6).alias("rate_short"),
        F.round(rate_l, 6).alias("rate_long"),
        (
            (F.col("n_events") >= min_events)
            & (rate_s > F.lit(ratio) * rate_l)
        ).alias("alert"),
    ).orderBy("bucket_us")
