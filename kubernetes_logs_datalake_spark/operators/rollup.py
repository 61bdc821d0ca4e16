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
