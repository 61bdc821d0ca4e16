"""ns-time kernel golden tests.

Golden values from the reference's unit test
(images/fluentbit/test_compact_columns.c:290-325).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions import (
    cri_ts_to_ns,
    fmt_ns_iso,
    ns_to_timestamp,
    since_cutoff_predicate,
)
from kubernetes_logs_datalake_spark.functions.time_ns import parse_since

GOLDEN = [
    ("2024-01-15T10:30:45.123456789Z", 1705314645123456789),
    ("2024-01-15T10:30:46.000000000Z", 1705314646000000000),
    ("2024-01-15T10:30:47.999999999Z", 1705314647999999999),
]


def test_cri_ts_to_ns_golden(spark):
    df = spark.createDataFrame([(s,) for s, _ in GOLDEN], ["ts"])
    got = [r[0] for r in df.select(cri_ts_to_ns("ts")).collect()]
    assert got == [ns for _, ns in GOLDEN]


def test_cri_ts_to_ns_variable_fraction(spark):
    rows = [
        ("2024-01-15T10:30:45.1Z", 1705314645100000000),
        ("2024-01-15T10:30:45.123Z", 1705314645123000000),
        ("2024-01-15T10:30:45Z", 1705314645000000000),  # no fraction
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], ["ts"])
    got = [r[0] for r in df.select(cri_ts_to_ns("ts")).collect()]
    assert got == [ns for _, ns in rows]


def test_cri_ts_to_ns_null_on_garbage(spark):
    bad = [
        "not a timestamp",
        "2024-01-15 10:30:45Z",          # missing T
        "2024-01-15T10:30:45.123456789", # missing Z
        "2024-13-45T10:30:45Z",          # invalid calendar date
        "2024-01-15T10:30:45.1234567890Z",  # 10 fractional digits
        "",
    ]
    df = spark.createDataFrame([(s,) for s in bad], ["ts"])
    got = [r[0] for r in df.select(cri_ts_to_ns("ts")).collect()]
    assert got == [None] * len(bad)


def test_fmt_ns_iso_roundtrip(spark):
    df = spark.createDataFrame([(ns,) for _, ns in GOLDEN], ["time_ns"])
    got = [r[0] for r in df.select(fmt_ns_iso("time_ns")).collect()]
    assert got == [s for s, _ in GOLDEN]


def test_ns_to_timestamp_truncates_to_micros(spark):
    df = spark.createDataFrame([(1705314645123456789,)], ["time_ns"])
    row = df.select(ns_to_timestamp("time_ns").alias("t")).collect()[0]
    assert row.t.isoformat() == "2024-01-15T10:30:45.123456"


def test_parse_since():
    assert parse_since("5m") == (5, "minutes")
    assert parse_since("90s") == (90, "seconds")
    assert parse_since("2h") == (2, "hours")
    assert parse_since("1d") == (1, "days")
    for bad in ("", "m", "5x", "-5m", "5"):
        try:
            parse_since(bad)
            raise AssertionError(f"expected ValueError for {bad!r}")
        except ValueError:
            pass


def test_since_cutoff_predicate(spark):
    now = F.to_timestamp_ntz(F.lit("2024-01-15T10:35:45"))
    df = spark.createDataFrame(
        [("2024-01-15T10:33:00",), ("2024-01-15T10:20:00",)], ["s"]
    ).select(F.to_timestamp_ntz("s").alias("time"))
    kept = df.filter(since_cutoff_predicate("time", "5m", now=now)).count()
    assert kept == 1


def test_cri_ts_beyond_ns_range_is_null_not_overflow(spark):
    """Valid-format timestamps past 2262 are unrepresentable in ns
    longs: the contract is null, never an ANSI ARITHMETIC_OVERFLOW
    poison pill that would crash-loop the ingest stream."""
    from kubernetes_logs_datalake_spark.functions.time_ns import cri_ts_to_ns

    df = spark.createDataFrame(
        [("2263-01-01T00:00:00.000000000Z",), ("2024-01-15T10:30:45.123456789Z",)],
        ["ts"],
    )
    rows = [r.time_ns for r in df.select(cri_ts_to_ns("ts")).collect()]
    assert rows[0] is None
    assert rows[1] == 1705314645123456789


def test_epoch_ns_col_far_future_timestamp_is_null(spark):
    """A µs timestamp past the ns-long range (year 9999) nulls instead
    of aborting the whole query under default-ANSI arithmetic."""
    import datetime

    from kubernetes_logs_datalake_spark.functions.time_ns import epoch_ns_col

    df = spark.createDataFrame(
        [(datetime.datetime(9999, 1, 1),), (datetime.datetime(2024, 1, 15, 10, 30, 45),)],
        "ts timestamp",
    )
    rows = [r.v for r in df.select(epoch_ns_col(df, "ts").alias("v")).collect()]
    assert rows[0] is None
    assert rows[1] == 1705314645 * 10**9
