"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

The OLAP cross-tab pair. Both stay entirely in JVM column expressions:
pivot with an EXPLICIT value list compiles to one conditional-aggregate
shuffle (no extra distinct-collection job, deterministic output
schema — the form that survives a 100× scale-up); unpivot is Spark's
native `Expand` node (map-side row replication, no shuffle of its own).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _slug(value: str) -> str:
    """Deterministic SQL-safe column name for a pivot value."""
    return "p_" + re.sub(r"[^a-z0-9]+", "_", value.lower()).strip("_")


def pivot_counts(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    values: list[str],
    aliases: list[str] | None = None,
) -> DataFrame:
    """Cross-tab counts: one row per ``row_col`` value, one column per
    entry of ``values`` (missing combinations are 0, not null).

    The value list must be known up front — which is exactly the scale
    discipline a 100 TB cross-tab needs anyway. Given it, conditional
    aggregation (sum of ``when(pivot = v, 1)`` per value) compiles to
    ONE partial-agg shuffle on ``row_col``; both of the alternatives
    are worse: ``DataFrame.pivot`` without values runs a separate
    distinct-collection job over the fact table, and even with values
    it plans two stacked Aggregates (pre-agg on (row, pivot), then
    ``pivotfirst`` on row — a second shuffle).
    """
    aliases = aliases or [_slug(v) for v in values]
    return df.groupBy(row_col).agg(
        *[
            F.sum(
                F.when(F.col(pivot_col) == v, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(a)
            for v, a in zip(values, aliases)
        ]
    )


def unpivot_metric_summary(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """Wide→long metric profile: melt ``value_cols`` into
    (metric, value) rows, then summarize each metric —
    (metric, n, total, vmin, vmax, avg).

    Uses Spark's native ``unpivot`` (the Expand operator: each input
    row fans out to len(value_cols) rows map-side, no shuffle) followed
    by one partial-agg shuffle on the metric name — the melt never
    materializes. Sums aggregate in DECIMAL(18,4) so the totals are
    order-independent and engine-exact (this repo's exact-sums recipe);
    avg is the one fixed double division at the end.
    """
    casted = df.select(
        *[F.col(c).cast("decimal(18,4)").alias(c) for c in value_cols]
    )
    long = casted.unpivot([], value_cols, "metric", "value")
    total = F.sum("value").cast("double")
    cnt = F.count("value")
    return long.groupBy("metric").agg(
        cnt.alias("n"),
        F.round(total, 4).alias("total"),
        F.round(F.min("value").cast("double"), 4).alias("vmin"),
        F.round(F.max("value").cast("double"), 4).alias("vmax"),
        F.round(total / cnt.cast("double"), 4).alias("avg"),
    )
