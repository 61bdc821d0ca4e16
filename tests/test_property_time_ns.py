"""Property-based ns-kernel round-trip: for arbitrary nanosecond
instants in the parquet-representable range, format → parse → identical
value, and the derived µs timestamp truncates (never rounds)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kubernetes_logs_datalake_spark.functions.time_ns import cri_ts_to_ns, fmt_ns_iso, ns_to_timestamp

# 1970-01-01 .. 2262-04-11 (int64 ns range), one Spark job per example
# is slow → each example carries a batch of values.
ns_value = st.integers(min_value=0, max_value=9_223_372_036_854_775_000)


@settings(max_examples=5, deadline=None)
@given(st.lists(ns_value, min_size=20, max_size=50, unique=True))
def test_ns_roundtrip_property(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["ns"])
    out = df.select(
        "ns",
        cri_ts_to_ns(fmt_ns_iso("ns")).alias("back"),
        ns_to_timestamp("ns").alias("ts"),
    ).collect()
    for row in out:
        assert row.back == row.ns, f"round-trip broke for {row.ns}"
        # µs derivation truncates toward zero
        micros = row.ns // 1000
        got = row.ts
        total_us = (
            (got.toordinal() - 719163) * 86400_000_000
            + got.hour * 3600_000_000
            + got.minute * 60_000_000
            + got.second * 1_000_000
            + got.microsecond
        )
        assert total_us == micros, f"µs truncation broke for {row.ns}"
