"""Event-sequence analytics: conversion funnels and retention cohorts.

The product-analytics layer over the events table — the queries a
training-data pipeline's upstream (or any clickstream lake) runs daily.
Both operators are pure conditional aggregation: one shuffle on the
user key, everything else map-side, no window over the whole corpus and
no per-user state beyond a handful of min/max timestamps — the shape
that holds at any user count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.time_ns import epoch_ns_col

NS_PER_DAY = 86_400 * 1_000_000_000


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: list[str],
) -> DataFrame:
    """Strict-order conversion funnel over first occurrences.

    A user converts through stage *i* when their first stage-*i* event
    is strictly later than their first stage-*i-1* event (the standard
    first-touch funnel). One row per stage: (stage_idx, stage,
    n_users). Single groupBy on the user — the per-user state is one
    min(ts) per stage regardless of event volume.
    """
    firsts = df.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"_t{i}")
            for i, s in enumerate(stages)
        ]
    )
    conv = F.col("_t0").isNotNull()
    out_cols = [F.sum(conv.cast("long")).alias("n_users_0")]
    for i in range(1, len(stages)):
        conv = conv & (F.col(f"_t{i}") > F.col(f"_t{i - 1}"))
        out_cols.append(F.sum(conv.cast("long")).alias(f"n_users_{i}"))
    wide = firsts.agg(*out_cols)
    stage_rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"n_users_{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return wide.select(F.explode(stage_rows).alias("r")).select("r.*")


def interarrival_stats(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Per-user inter-event gap statistics over a numeric epoch column:
    (user, n_gaps, min_gap, max_gap, avg_gap), in whatever unit the
    input column carries. The cadence / bot-detection profile — users
    with sub-second uniform gaps are machines.

    lag() over a window PARTITIONED by user (never global), gaps as
    exact integer longs; avg is the one sum/count double division.
    Equal timestamps are safe: the sorted gap multiset is the same
    whatever order ties land in. Output is O(users), not O(events).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy("_ts")
    gaps = (
        df.select(user_col, F.col(ts_col).alias("_ts"))
        .withColumn("_gap", F.col("_ts") - F.lag("_ts").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    return gaps.groupBy(user_col).agg(
        F.count("*").alias("n_gaps"),
        F.min("_gap").alias("min_gap"),
        F.max("_gap").alias("max_gap"),
        F.round(
            F.sum("_gap").cast("double") / F.count("*").cast("double"), 4
        ).alias("avg_gap"),
    )


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str, max_offset_days: int = 30
) -> DataFrame:
    """Classic retention triangle: users bucketed by first-seen day
    (cohort), counted per day-offset they return on.

    Returns (cohort_day, day_offset, n_users) with epoch-day ints —
    integer outputs, so the oracle comparison is exact. Day math is
    integer division on the epoch-ns long (no timezone dependence);
    the time column is normalized schema-adaptively (ns long or µs
    timestamp input both work).
    Two shuffles: first-day per user, then the distinct
    (cohort, offset, user) count.
    """
    events = df.select(
        F.col(user_col).alias("_u"), epoch_ns_col(df, ts_col).alias("_ns")
    ).withColumn("_day", F.expr(f"CAST(_ns DIV {NS_PER_DAY} AS LONG)"))
    events = events.select("_u", "_day")
    firsts = events.groupBy("_u").agg(F.min("_day").alias("cohort_day"))
    return (
        events.join(firsts, "_u")
        .withColumn("day_offset", (F.col("_day") - F.col("cohort_day")).cast("int"))
        .filter(F.col("day_offset") <= max_offset_days)
        .select("cohort_day", "day_offset", "_u")
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


def session_paths(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_us: int = 30 * 60 * 1_000_000,
    steps: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k most frequent consecutive event-type paths WITHIN sessions
    (the "common user journeys" report): sessionize by inactivity gap,
    slide a ``steps``-long window along each session, count paths.

    Output: (path, n) — path as "a>b[>c...]" — the k most frequent,
    ties broken by path string.

    Plan: ONE user-keyed window partitioning reused three times (gap
    flag → running session id → the ``steps-1`` lead()s; Catalyst plans
    a single sort+exchange because session id is a prefix-extension of
    the user key), then a path-keyed partial agg and a
    TakeOrderedAndProject for the top-k. Per-user state never
    concentrates: sessions are derived per-partition after the one
    shuffle, and path cardinality is at most |event types|^steps — tiny
    — so the final agg is map-side-combined to almost nothing.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    brk = F.when(
        F.lag(F.col(ts_col)).over(w).isNull()
        | ((F.col(ts_col) - F.lag(F.col(ts_col)).over(w)) > gap_us),
        1,
    ).otherwise(0)
    sess = df.withColumn("_brk", brk).withColumn(
        "_sess", F.sum("_brk").over(w)
    )
    w2 = Window.partitionBy(user_col, "_sess").orderBy(ts_col, tiebreak_col)
    # materialize the lead()s as columns first — window expressions are
    # not allowed directly inside a filter
    parts, cond = [F.col(type_col)], F.lit(True)
    for i in range(1, steps):
        name = f"_nxt{i}"
        sess = sess.withColumn(name, F.lead(F.col(type_col), i).over(w2))
        parts.append(F.col(name))
        cond = cond & F.col(name).isNotNull()
    return (
        sess.withColumn("path", F.concat_ws(">", *parts))
        .filter(cond)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(k)
    )


def attribution_credit(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    tiebreak_col: str,
    touch_types: list[str],
    conversion_type: str,
    lookback: int,
) -> DataFrame:
    """Multi-touch attribution: credit each conversion's preceding
    touches under four standard models at once — first-touch,
    last-touch, linear (1/n), and position-based (40/20/40 U-shape).

    A touch is attributed to the NEXT conversion by the same user in
    (ts, tiebreak) order, provided that conversion lands within
    ``lookback`` (same unit as ``ts_col``, which must be an integer
    epoch column). Touches after the user's last conversion, and
    touches whose next conversion is out of window, earn nothing.
    Output: one row per touch channel (the touch's ``type_col``) with
    integer first/last credit counts and exact-decimal-summed
    linear/position credit (per-touch weights rounded to 12 dp before
    the DECIMAL sum, so the aggregate is order-independent; emitted as
    rounded doubles).

    Plan shape: the type filter prunes the corpus map-side to touch +
    conversion rows before any exchange; ONE user-keyed sort shuffle
    then powers both reverse-frame windows (conversion-segment number =
    remaining-conversion count, and next-conversion timestamp) in a
    single Window exec; the per-conversion position numbering re-keys
    only the already-attributed touches on (user, segment) — groups
    bounded by touches-per-conversion, so no skew beyond hot users; the
    final agg is channel-keyed, cardinality = |touch_types|.
    """
    from pyspark.sql import Window

    ev = df.filter(
        F.col(type_col).isin(list(touch_types) + [conversion_type])
    ).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(type_col).alias("_ch"),
        (F.col(type_col) == conversion_type).alias("_isc"),
    )
    rev = (
        Window.partitionBy("_u")
        .orderBy("_ts", "_tb")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = ev.withColumn(
        "_seg", F.sum(F.col("_isc").cast("long")).over(rev)
    ).withColumn("_cts", F.min(F.when(F.col("_isc"), F.col("_ts"))).over(rev))
    touches = seg.filter(
        (~F.col("_isc"))
        & F.col("_cts").isNotNull()
        & (F.col("_cts") - F.col("_ts") <= F.lit(lookback))
    )
    w2 = Window.partitionBy("_u", "_seg")
    pos = touches.withColumn(
        "_rn", F.row_number().over(w2.orderBy("_ts", "_tb"))
    ).withColumn("_n", F.count(F.lit(1)).over(w2))
    lin_w = F.round(F.lit(1.0) / F.col("_n"), 12).cast("decimal(27,12)")
    pos_w = (
        F.when(F.col("_n") == 1, F.lit(1.0))
        .when(F.col("_n") == 2, F.lit(0.5))
        .when((F.col("_rn") == 1) | (F.col("_rn") == F.col("_n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("_n") - 2))
    )
    pos_w = F.round(pos_w, 12).cast("decimal(27,12)")
    return (
        pos.groupBy(F.col("_ch").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias(
                "credit_first"
            ),
            F.sum(F.when(F.col("_rn") == F.col("_n"), 1).otherwise(0)).alias(
                "credit_last"
            ),
            F.round(F.sum(lin_w).cast("double"), 6).alias("credit_linear"),
            F.round(F.sum(pos_w).cast("double"), 6).alias("credit_position"),
        )
        .orderBy("channel")
    )


def decayed_engagement(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_us: int = 86400 * 1_000_000,
    max_age: int = 62,
) -> DataFrame:
    """Recency-weighted engagement score per user: each event counts
    2^(−age) where age = whole ``bucket_us`` buckets between the event
    and the corpus's latest event — the classic half-life-per-bucket
    decay, the batch companion to the streaming EWMA detector.

    The decay base is FIXED at 2 so the score is exact: each term is a
    dyadic rational, summed as Σ 2^(max_age − age) in DECIMAL(38,0) —
    integer addition, associative, immune to the float-summation
    order hazard a shuffled partial aggregation would otherwise have
    (adding 1.0 + 2⁻⁴⁰ + … loses bits depending on arrival order; an
    integer sum cannot). One double division at the very end converts
    the scaled sum back, identically on any engine. Ages clamp to
    ``max_age`` (a 2⁻⁶² event contributes nothing at double precision
    anyway).

    Plan: 1-row max-timestamp aggregate broadcast-cross-joined (the
    repo's scalar-join idiom — never a collect), then one map-only
    age/term expression and one user-keyed agg. Output: (user,
    n_events, score) with score descending, ties by user.
    """
    if bucket_us < 1:
        raise ValueError(f"bucket_us must be >= 1, got {bucket_us}")
    if not 0 <= max_age <= 62:
        raise ValueError(f"max_age must be in [0, 62], got {max_age}")
    ts = F.col(ts_col)
    ref = df.agg(F.max(ts_col).alias("_ref"))
    # integer-exact bucket age: subtract the remainder before dividing
    # so the division is over an exact multiple (Spark casts double→int
    # by truncation, DuckDB by rounding — an inexact quotient would
    # diverge between engines; an exact one cannot)
    diff = F.col("_ref") - ts
    age = F.least(
        ((diff - diff % F.lit(bucket_us)) / F.lit(bucket_us)).cast("int"),
        F.lit(max_age),
    )
    # SQL shiftleft accepts a column shift amount (the DataFrame
    # function demands a Python int)
    term = F.expr(
        f"CAST(shiftleft(CAST(1 AS BIGINT), {int(max_age)} - _age) "
        f"AS DECIMAL(38,0))"
    )
    return (
        df.crossJoin(F.broadcast(ref))
        .select(F.col(user_col), age.alias("_age"))
        .select(F.col(user_col), term.alias("_t"))
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum("_t").cast("double")
                / F.lit(float(1 << max_age)),
                9,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), user_col)
    )
