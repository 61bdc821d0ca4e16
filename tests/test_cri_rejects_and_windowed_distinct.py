"""CRI dead-letter view (partition invariant with the parser) and the
windowed HLL distinct counter (batch/stream agreement)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.cri import (
    cri_rejects,
    parse_cri_lines,
)
from kubernetes_logs_datalake_spark.streaming.analytics import (
    windowed_distinct_counts,
)


def test_rejects_partition_the_input(spark):
    rows = [
        ("2024-01-15T10:30:00.000000001Z stdout F good line",),
        ("not a cri line at all",),
        ("2024-01-15T10:30:01.000000001Z stderr P partial",),
        ("x" * 300,),  # over the tiny limit below
        ("2024-01-15T10:30:02Z stdout F no-fraction ok",),
    ]
    df = spark.createDataFrame(rows, "value string")
    parsed = parse_cri_lines(df, max_line_bytes=256)
    rejects = cri_rejects(df, max_line_bytes=256)
    assert parsed.count() + rejects.count() == df.count()
    got = {r.value[:12]: r.reject_reason for r in rejects.collect()}
    assert got == {"not a cri li": "unparsed", "x" * 12: "too_long"}


def test_rejects_reason_precedence_too_long_wins(spark):
    # an over-long line that ALSO fails the regex reports too_long —
    # the same precedence the parser applies (length guard first)
    df = spark.createDataFrame([("y" * 999,)], "value string")
    out = cri_rejects(df, max_line_bytes=10).collect()
    assert [r.reject_reason for r in out] == ["too_long"]


def test_windowed_distinct_batch_stream_agree(spark, tmp_path):
    US = 1_000_000
    rows = []
    for u in range(40):
        for k in range(3):
            rows.append(
                {"user_id": u % 17, "ts_us": (1_700_000_100 + 60 * u + k) * US}
            )
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "e.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    schema = "user_id long, ts_us long"

    def prep(df):
        return df.withColumn("time", F.timestamp_micros(F.col("ts_us")))

    batch = {
        (r.window_start, r.window_end): r.n_distinct
        for r in windowed_distinct_counts(
            prep(spark.read.schema(schema).json(src)),
            ts_col="time", key_col="user_id",
            window="10 minutes", slide="5 minutes",
        ).collect()
    }
    q = (
        windowed_distinct_counts(
            prep(spark.readStream.schema(schema).json(src)),
            ts_col="time", key_col="user_id",
            window="10 minutes", slide="5 minutes",
        )
        .writeStream.format("memory")
        .queryName("wdc_t")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        stream = {
            (r.window_start, r.window_end): r.n_distinct
            for r in spark.sql("SELECT * FROM wdc_t").collect()
        }
    finally:
        q.stop()
    assert stream == batch and len(batch) >= 2
    # HLL at rsd=0.05 is exact-ish at this cardinality: sanity bounds
    for (_s, _e), n in batch.items():
        assert 1 <= n <= 17 + 2
