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
    if window_us <= 0 or slide_us <= 0 or window_us % slide_us != 0:
        raise ValueError("window_us must be a positive multiple of slide_us")
    from kubernetes_logs_datalake_spark.functions.time_ns import epoch_us_col

    aggs = aggs or [F.count("*").alias("n")]
    ts_us = epoch_us_col(df, ts_col)
    # window index i covers t iff i*slide <= t < i*slide + window
    #   ⇔ floor_div(t - window, slide) + 1 <= i <= floor_div(t, slide)
    lo = _floor_div(ts_us - F.lit(window_us), slide_us) + F.lit(1)
    hi = _floor_div(ts_us, slide_us)
    exploded = df.withColumn("_wi", F.explode(F.sequence(lo, hi)))
    start = (F.col("_wi") * F.lit(slide_us)).cast("long").alias("window_start_us")
    group_cols = [start] + [F.col(k) for k in (keys or [])]
    return exploded.groupBy(*group_cols).agg(*aggs)
