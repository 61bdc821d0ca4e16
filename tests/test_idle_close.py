"""Idle-close stateful operator (T4 close-write semantics): a container
key with no new lines for the idle window emits exactly one close event
with its line count and last event time."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.cri import parse_cri_lines
from kubernetes_logs_datalake_spark.streaming.idle_close import closed_sessions


def test_idle_close_emits_after_quiet_period(spark, tmp_path):
    base = str(tmp_path)
    d = os.path.join(base, "var/log/pods/qa_app-1_u/app")
    os.makedirs(d)
    with open(os.path.join(d, "0.log"), "w") as f:
        f.write(
            "2024-01-15T10:30:00.0Z stdout F a\n"
            "2024-01-15T10:30:01.5Z stdout F b\n"
            "2024-01-15T10:30:02.0Z stderr F c\n"
        )

    stream = parse_cri_lines(
        spark.readStream.format("text")
        .option("recursiveFileLookup", "true")
        .load(base)
        .withColumn("path", F.input_file_name()),
        path_col="path",
        cluster="dev",
    )
    q = (
        closed_sessions(stream, idle_seconds=2)
        .writeStream.format("memory")
        .queryName("idle_close_t")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            assert q.exception() is None, q.exception()
            rows = spark.sql("SELECT * FROM idle_close_t").collect()
            if rows:
                break
            time.sleep(1)
        assert len(rows) == 1, f"expected one close event, got {rows}"
        r = rows[0]
        assert (r.namespace, r.pod, r.container) == ("qa", "app-1", "app")
        assert r.n_lines == 3
        assert r.last_time_ns == 1705314602000000000
        # quiet period continues → no further events (state removed)
        time.sleep(4)
        assert spark.sql("SELECT count(*) c FROM idle_close_t").first().c == 1
    finally:
        q.stop()
