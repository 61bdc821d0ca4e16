"""Input type-drift preflight: every events query must produce identical
results whether the lake's time column is an ns long (reference-style
parquet TIMESTAMP(NANOS) read via nanosAsLong) or a µs timestamp
(stock Spark/pyarrow writers).

The reference never assumes a physical type — it infers schema at query
time (y-logcli:267-273). Round 3 proved the cost of assuming: a driver
testdata regeneration flipped ns-long to µs-timestamp and took out nine
queries and the whole bench. This test feeds BOTH physical layouts
through every events-reading query and asserts equal output.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# every queries() entry that reads the events table and only the events
# table (so a synthetic events.parquet is the full input)
EVENTS_QUERIES = [
    "events_hourly_rollup",
    "events_type_stats",
    "events_sessions",
    "events_top_users",
    "events_iso_ns_format",
    "asof_purchase_click",
    "range_join_error_context",
    "events_funnel",
    "events_retention",
    "events_interarrival",
    "events_session_windows",
    "percentile_event_value",
    "pivot_event_counts",
    # round-5 additions reading only events
    "events_hopping_rollup",
    "events_sliding_topk",
    "events_heavy_hitters",
    "events_gapfill_hourly",
    "events_audience_overlap",
    "events_cusum_alerts",
]


@pytest.fixture(scope="module")
def dual_layout_dirs(tmp_path_factory):
    """(ns_long_dir, us_timestamp_dir) holding the same synthetic events
    rows in the two physical time layouts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    n = 3000
    base_ns = 1_705_314_600_000_000_000  # 2024-01-15T10:30:00Z
    # irregular but deterministic gaps: mostly seconds-scale (so the
    # range join finds in-window matches), with occasional >30 min gaps
    # to split sessions; every ns value is a whole µs so both layouts
    # encode the exact same instants (a µs file carries no sub-µs digits)
    small = rng.integers(100_000, 10_000_000, size=n)
    large = rng.integers(31 * 60 * 1_000_000, 60 * 60 * 1_000_000, size=n)
    gaps_us = np.where(rng.random(n) < 0.03, large, small).cumsum()
    ts_ns = base_ns + gaps_us * 1000
    event_types = np.array(["signup", "view", "click", "purchase", "error"])
    tbl = {
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array((rng.integers(0, 80, size=n)).tolist(), pa.int64()),
        "event_type": pa.array(event_types[rng.integers(0, 5, size=n)].tolist()),
        "value": pa.array(np.round(rng.uniform(0, 100, size=n), 4).tolist(), pa.float64()),
        "props": pa.array(['{"k":%d}' % (i % 7) for i in range(n)]),
    }

    d_ns = tmp_path_factory.mktemp("events_ns_long")
    pq.write_table(
        pa.table({**tbl, "ts": pa.array(ts_ns.tolist(), pa.timestamp("ns"))}),
        str(d_ns / "events.parquet"),
    )
    d_us = tmp_path_factory.mktemp("events_us_ts")
    pq.write_table(
        pa.table({**tbl, "ts": pa.array((ts_ns // 1000).tolist(), pa.timestamp("us"))}),
        str(d_us / "events.parquet"),
    )
    return str(d_ns), str(d_us)


@pytest.mark.parametrize("name", EVENTS_QUERIES)
def test_events_query_identical_across_time_layouts(spark, dual_layout_dirs, name):
    d_ns, d_us = dual_layout_dirs
    q = entrymod.queries()[name]
    rows_ns = sorted(map(tuple, q(spark, d_ns).collect()))
    rows_us = sorted(map(tuple, q(spark, d_us).collect()))
    assert rows_ns == rows_us, f"{name} diverges between ns-long and µs-timestamp input"
    assert rows_ns, f"{name} returned no rows on the synthetic events table"


def test_epoch_ns_col_int_seconds_layout(spark):
    """A 32-bit int time column (epoch seconds — common in minimal
    lakes) must route through the timestamp branch: int→timestamp casts
    interpret seconds, never raw ns."""
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.functions.time_ns import (
        epoch_ns_col,
        epoch_us_col,
    )

    df = spark.createDataFrame([(1_705_314_645,)], "ts int")
    ns = df.select(epoch_ns_col(df, "ts").alias("v")).first().v
    us = df.select(epoch_us_col(df, "ts").alias("v")).first().v
    assert ns == 1_705_314_645 * 1_000_000_000
    assert us == 1_705_314_645 * 1_000_000
