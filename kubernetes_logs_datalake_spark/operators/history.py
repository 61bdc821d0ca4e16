"""State-history modeling: SCD2 validity intervals from an event log.

Why in this engine: a log datalake's events are point-in-time facts;
most downstream marts want "what was entity X's state DURING period
P" — the slowly-changing-dimension type-2 (Kimball) shape. Building it
from the raw stream is one window pass: detect change points, close
each interval at the next change.

Scale shape: everything is windowed PARTITIONED BY the entity key —
the per-entity event history is the only thing that ever co-locates,
so the job is one entity-keyed shuffle regardless of total volume, and
AQE's skew splitting handles a hot entity. No joins, no global sorts,
no driver traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an event stream into SCD2 validity intervals: one row
    per (entity, consecutive-state run) with the interval's bounds.

    Output: (key, state, valid_from, valid_to, is_current) where
    ``valid_from`` is the first event of the run (in ``order_col``
    units), ``valid_to`` is the start of the NEXT run (NULL on the
    current run — the open interval), and ``is_current`` marks the
    entity's latest state. Interval semantics are [valid_from,
    valid_to): adjacent intervals tile the timeline with no gaps or
    overlaps, the standard warehouse contract.

    Plan: one lag() to find change points, one running filter, one
    lead() to close intervals — two window passes over the SAME
    (key × order) partitioning, so Catalyst plans a single sort+shuffle
    and reuses it for both.
    """
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = df.withColumn(
        "_prev", F.lag(F.col(state_col)).over(w)
    ).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col))
    )
    # change points only; close each run at the next change point
    w2 = Window.partitionBy(key_col).orderBy(*order)
    out = changed.withColumn(
        "valid_to", F.lead(F.col(order_col)).over(w2)
    )
    return out.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col(order_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def snapshot_at(
    intervals: DataFrame, at, order_col: str = "valid_from"
) -> DataFrame:
    """Point-in-time lookup over SCD2 intervals: each entity's state AS
    OF ``at`` (same units as the interval bounds) — the "what did the
    world look like at T" query every type-2 dimension exists to
    answer. [valid_from, valid_to) semantics: a row matches when
    valid_from ≤ at < valid_to (open intervals match any later ``at``).

    A pure filter over the intervals table — partition-prunable when
    the intervals are stored partitioned on ``valid_from`` buckets, and
    never wider than one row per entity by the tiling invariant of
    :func:`scd2_intervals`.
    """
    t = F.lit(at)
    return intervals.filter(
        (F.col(order_col) <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def temporal_join(
    facts: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str = "state",
) -> DataFrame:
    """Temporal (event-time) enrichment: join each fact row to the
    dimension state that was valid AT its timestamp — the standard
    fact-to-SCD2 lookup ("what plan was this user on when they
    purchased"), per-row where :func:`snapshot_at` is whole-table.

    [valid_from, valid_to) semantics; by the tiling invariant of
    :func:`scd2_intervals` at most one interval matches, and facts
    earlier than the entity's first interval (or with no entity at
    all) survive with a NULL state — a left join, so the enrichment
    never drops or duplicates facts.

    Scale shape: an equi-join on the entity key with the interval
    bounds as a residual filter — NOT a range join: the hash join
    co-locates each fact with its entity's handful of change-point
    rows, so per-key multiplicity is the change count, never the fact
    count. The intervals side is change-points only; when it fits,
    AQE broadcasts it and the fact table never shuffles.
    """
    iv = intervals.select(
        F.col(key_col).alias("_tj_k"),
        F.col(state_col).alias("_tj_state"),
        F.col("valid_from").alias("_tj_from"),
        F.col("valid_to").alias("_tj_to"),
    )
    cond = (
        (F.col(key_col) == F.col("_tj_k"))
        & (F.col("_tj_from") <= F.col(ts_col))
        & (F.col("_tj_to").isNull() | (F.col("_tj_to") > F.col(ts_col)))
    )
    return (
        facts.join(iv, cond, "left")
        .drop("_tj_k", "_tj_to")
        .withColumnRenamed("_tj_state", state_col)
        .withColumnRenamed("_tj_from", "state_since")
    )
