"""Streaming analytics over the ingested stream: watermarked windowed
aggregation and session windows.

The reference performs no stream-side aggregation (its ingest is
write-only; reordering happens at query time). These operators extend
the surface the Spark-native way: event-time tumbling/session windows
with watermarks bounding state — the piece you need the moment someone
asks "errors per namespace per minute, live".

State sizing at scale: watermark delay × key cardinality bounds the
state store; with `delay=5m` and ~10^5 live (namespace, container)
pairs the state is trivially small because aggregates are partial rows,
not events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def windowed_counts(
    records: DataFrame,
    window: str = "1 minute",
    watermark_delay: str = "5 minutes",
    keys: list[str] | None = None,
    time_col: str = "time",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Event-time tumbling-window aggregation with late-data handling.

    Works identically on a streaming or batch DataFrame (same plan);
    with a stream, the watermark lets Spark emit+drop finalized windows.
    """
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    # watermarks require TIMESTAMP (tz-aware); our time is NTZ-µs — the
    # cast is value-preserving because the session tz is pinned UTC
    out = records.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if records.isStreaming:
        out = out.withWatermark(time_col, watermark_delay)
    res = out.groupBy(F.window(time_col, window).alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    agg_cols = [c for c in res.columns if c != "w" and c not in keys]
    return res.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *agg_cols,
    )


def stream_dedup(
    records: DataFrame,
    keys: list[str],
    watermark_delay: str = "10 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with bounded state.

    The at-least-once ingest contract means re-delivered rows; this is
    the stream-side companion to ``operators.dedup.exact_dedup``:
    ``dropDuplicatesWithinWatermark`` keeps one row per key seen within
    the watermark horizon, and the state store holds only keys newer
    than the horizon — state is O(arrival rate × delay), not O(stream
    history), which is the property that survives at 100 TB/day.
    On a batch DataFrame the same call degrades to a plain
    ``dropDuplicates`` (full-history semantics), so backfills and the
    live stream share one definition.
    """
    out = records.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if records.isStreaming:
        return out.withWatermark(time_col, watermark_delay).dropDuplicatesWithinWatermark(
            keys
        )
    return out.dropDuplicates(keys)


def hopping_counts(
    records: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark_delay: str = "5 minutes",
    keys: list[str] | None = None,
    time_col: str = "time",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding (hopping) window aggregation — the streaming counterpart
    of ``operators.rollup.hopping_rollup``. Uses the native
    ``F.window(time, window, slide)`` so the watermark can finalize and
    DROP window state (the engine recognizes the window as derived from
    the watermarked column; an arithmetic surrogate key would keep
    state forever in append mode). Batch callers wanting the
    oracle-checkable exact-integer form use ``hopping_rollup``; the two
    agree — tests/test_operators_misc.py pins it.
    """
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = records.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if records.isStreaming:
        out = out.withWatermark(time_col, watermark_delay)
    res = out.groupBy(
        F.window(time_col, window, slide).alias("w"), *[F.col(k) for k in keys]
    ).agg(*aggs)
    agg_cols = [c for c in res.columns if c != "w" and c not in keys]
    return res.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *agg_cols,
    )


def sessionized_counts(
    records: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "5 minutes",
    keys: list[str] | None = None,
    time_col: str = "time",
) -> DataFrame:
    """Session-window aggregation (dynamic-length windows closed by a
    quiet gap) — the streaming counterpart of the batch sessionization
    in ``__spark_entry__._events_sessions``."""
    keys = keys or []
    out = records.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if records.isStreaming:
        out = out.withWatermark(time_col, watermark_delay)
    return (
        out.groupBy(F.session_window(time_col, gap).alias("w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "time",
    right_time: str = "rtime",
    horizon: str = "10 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: pair each left row with right rows for
    the same ``key`` whose time falls in [left_time, left_time +
    horizon) — "purchase joined to the clicks that followed it, live".

    The two watermarks plus the time-bound condition are what make the
    state finite: Spark keeps only left rows newer than (watermark)
    and right rows newer than (watermark − horizon), so state is
    O(arrival rate × horizon) per key — the stream-stream join shape
    that survives unbounded streams. Without the time bound the state
    store would grow forever (Spark refuses unbounded stream-stream
    inner joins on watermarked inputs for exactly this reason).

    On batch inputs the same expression degrades to an ordinary
    non-equi inner join, so backfills share the definition.
    """
    lt, rt = F.col(left_time), F.col(right_time)
    lout = left.withColumn(left_time, lt.cast("timestamp"))
    rout = right.withColumn(right_time, rt.cast("timestamp"))
    if left.isStreaming:
        lout = lout.withWatermark(left_time, watermark_delay)
    if right.isStreaming:
        rout = rout.withWatermark(right_time, watermark_delay)
    cond = (
        (lout[key] == rout[key])
        & (rout[right_time] >= lout[left_time])
        & (rout[right_time] < lout[left_time] + F.expr(f"INTERVAL {horizon}"))
    )
    return lout.join(rout, cond, "inner").drop(rout[key])


def sketch_counts(
    records: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming count-min sketch: maintain the depth×width counter
    table over an unbounded stream — frequency estimation whose state
    NEVER grows with key cardinality, the property that makes it the
    streaming answer where an exact per-key count would accumulate
    state forever.

    Same plan batch or stream (the 3-way agreement is tested); on a
    stream run with ``outputMode("update")`` (or "complete" for small
    widths) and point-query the sink table with
    :func:`operators.sketch.cms_estimate` — build and query compose
    across the batch/stream boundary because the bucket hash is the
    same portable recipe.
    """
    from kubernetes_logs_datalake_spark.operators.sketch import cms_sketch

    # same plan as the batch operator — delegation (not a copy) is what
    # guarantees the batch/stream agreement and the cms_estimate
    # point-query composition can never drift
    return cms_sketch(records, key_col, depth=depth, width=width)


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage_idx", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("ts_us", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = "stage_idx int, ts_us long"


def _funnel_fn(stages: list[str]):
    """Per-user funnel state machine: state = (furthest stage index,
    its µs timestamp); an event advances the funnel iff it is the NEXT
    stage in order and strictly later than the current state — the same
    strict-order first-touch rule as ``operators.funnel.funnel_counts``.
    Emits one row per advance."""
    import pandas as pd

    idx = {s: i for i, s in enumerate(stages)}

    def fn(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        cur, cur_ts = state.get if state.exists else (-1, 0)
        out_rows = []
        events = []
        for pdf in pdfs:
            for et, ts in zip(pdf["event_type"], pdf["ts_us"]):
                if et in idx:
                    events.append((int(ts), idx[et]))
        # within a micro-batch, replay in time order; ACROSS batches
        # the semantics are arrival-order (the streaming caveat —
        # watermark-bounded disorder is the deployment contract)
        for ts, si in sorted(events):
            # cur == -1 means "not started" (stage indexes are >= 0, so
            # -1 is unambiguous HERE, unlike as a timestamp where it
            # shadowed legitimate pre-epoch ts_us <= -1 — the same
            # sentinel class _ewma_alert_fn fixed with its 'opened'
            # flag); stage 0 has no prior timestamp to be later than
            if si == cur + 1 and (cur == -1 or ts > cur_ts):
                cur, cur_ts = si, ts
                out_rows.append((key[0], si, stages[si], ts))
        if out_rows or state.exists:
            state.update((cur, cur_ts))
        yield pd.DataFrame(
            out_rows, columns=["user_id", "stage_idx", "stage", "ts_us"]
        )

    return fn


def streaming_funnel(records: DataFrame, stages: list[str]) -> DataFrame:
    """Streaming strict-order conversion funnel: one output row per
    (user, stage) the moment the user advances to it — the live
    counterpart of the batch ``funnel_counts`` report. State per user
    is TWO scalars (stage index + timestamp) however long the stream
    runs: O(live users), the bounded-state property every operator in
    this module keeps.

    Input needs (user_id, event_type, ts_us). Use ``outputMode
    ("append")``; aggregate the emitted advances downstream for live
    per-stage counts.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return records.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(stages),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_distinct_counts(
    records: DataFrame,
    ts_col: str = "time",
    key_col: str = "user_id",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct keys per (optionally sliding) event-time window via the
    built-in HLL sketch — the live audience counter whose state per
    window is O(1/rsd²) registers however many keys flow through,
    finalized by the watermark. Spark's HLL is hash-deterministic, so
    the SAME plan run as a batch query returns the SAME estimates — the
    module's batch/stream agreement pattern (tested 3-way).

    Output: (window_start, window_end, n_distinct)."""
    # NTZ-µs → tz'd timestamp, value-preserving under the pinned-UTC
    # session (the module's shared cast pattern)
    df = records.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    if records.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(win.alias("_w"))
        .agg(F.approx_count_distinct(key_col, rsd=rsd).alias("n_distinct"))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            "n_distinct",
        )
    )


EWMA_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("series_key", T.StringType()),
        T.StructField("bucket_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("baseline", T.DoubleType()),  # EWMA before folding n
        T.StructField("ewma", T.DoubleType()),      # EWMA after folding n
        T.StructField("alert", T.BooleanType()),
    ]
)

EWMA_ALERT_STATE_SCHEMA = (
    "bucket_start_us long, cnt long, ewma double, has_ewma boolean,"
    " opened boolean"
)


def _ewma_alert_fn(
    every_us: int,
    alpha: float,
    spike_factor: float,
    min_count: int,
    max_gap_folds: int,
):
    """Per-key state machine: (open bucket start, its running count,
    recursive EWMA baseline, baseline-initialized + bucket-opened flags) — FIVE scalars
    per live series forever. A bucket closes when an event from a LATER
    bucket arrives; closing folds its count into the recursive EWMA
    (y ← α·x + (1−α)·y; the first bucket seeds y = x) and emits one
    row with the pre-fold baseline and the spike verdict. Empty gap
    buckets fold as zeros, capped at ``max_gap_folds`` — beyond the cap
    (1−α)^k has already decayed the baseline to ~0, so the cap bounds
    per-event work without changing verdicts at the rounding scale."""
    import pandas as pd

    def fn(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        bstart, cnt, ewma, has, opened = (
            state.get if state.exists else (0, 0, 0.0, False, False)
        )
        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(t) for t in pdf["ts_us"])
        rows = []

        def close(b, n):
            nonlocal ewma, has
            baseline = ewma if has else None
            alert = bool(
                has and n >= min_count and n > spike_factor * ewma
            )
            ewma = float(n) if not has else alpha * n + (1 - alpha) * ewma
            has = True
            rows.append((key[0], b, n, baseline, round(ewma, 6), alert))

        # in-batch replay in time order; ACROSS batches arrival-order
        # (the same watermark-bounded-disorder contract as the funnel)
        for ts in sorted(ts_list):
            b = ts - ts % every_us
            if not opened:
                # explicit flag, not a bstart sentinel: negative bucket
                # ids (pre-epoch timestamps) are legitimate values
                bstart, cnt, opened = b, 0, True
            if b <= bstart:
                # late or in-bucket event: counts into the OPEN bucket
                # (at-least-once pragmatics; disorder beyond one bucket
                # is the deployment watermark's job)
                cnt += 1
            else:
                close(bstart, cnt)
                gaps = (b - bstart) // every_us - 1
                for i in range(min(gaps, max_gap_folds)):
                    close(bstart + (i + 1) * every_us, 0)
                bstart, cnt = b, 1
        state.update((bstart, cnt, float(ewma), bool(has), bool(opened)))
        yield pd.DataFrame(
            rows,
            columns=[
                "series_key", "bucket_us", "n", "baseline", "ewma", "alert",
            ],
        )

    return fn


def streaming_rate_alerts(
    records: DataFrame,
    every_us: int = 3_600_000_000,
    alpha: float = 0.3,
    spike_factor: float = 3.0,
    min_count: int = 5,
    max_gap_folds: int = 64,
) -> DataFrame:
    """Streaming rate-spike detection: per-series bucket counts checked
    against a recursive-EWMA baseline the moment each bucket closes —
    the live counterpart of the batch events_ewma_hourly +
    events_cusum_alerts pair. Input needs (series_key: string,
    ts_us: long); output one row per CLOSED bucket with the pre-fold
    baseline and ``alert = n > spike_factor·baseline ∧ n ≥ min_count``.

    State per live series is five scalars regardless of stream length —
    the bounded-state property of this module. Use outputMode("append").
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return records.groupBy("series_key").applyInPandasWithState(
        _ewma_alert_fn(every_us, alpha, spike_factor, min_count, max_gap_folds),
        outputStructType=EWMA_ALERT_SCHEMA,
        stateStructType=EWMA_ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_histogram_state(
    records: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
    window: str = "1 hour",
    watermark_delay: str = "10 minutes",
    keys: list[str] | None = None,
    time_col: str = "time",
) -> DataFrame:
    """Windowed histogram state from a stream: (window_start, keys,
    bin, n) per event-time tumbling window — the streaming producer for
    the mergeable histogram family (operators.sketch). Downstream,
    windows merge by plain count addition (merge_histogram_states) and
    serve quantiles (histogram_quantiles) or drift (histogram_drift)
    without ever rescanning events: the stream maintains the state, the
    batch side consumes it — the classic serving split.

    Identical plan on a batch DataFrame (the agreement test's lever);
    with a stream, the watermark bounds state to live windows × keys ×
    ≤ n_bins counters. Binning is the family's ONE shared expression
    (sketch.histogram_bin_col), so stream-built and batch-built states
    are interchangeable bit-for-bit.
    """
    from kubernetes_logs_datalake_spark.operators.sketch import (
        histogram_bin_col,
    )

    keys = keys or []
    out = records.withColumn(time_col, F.col(time_col).cast("timestamp"))
    if records.isStreaming:
        out = out.withWatermark(time_col, watermark_delay)
    binned = out.filter(F.col(value_col).isNotNull()).select(
        F.window(time_col, window).alias("w"),
        *[F.col(k) for k in keys],
        histogram_bin_col(value_col, lo, hi, n_bins).alias("bin"),
    )
    return (
        binned.groupBy("w", *keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "bin", "n")
    )
