"""Streaming ingest behavioral tests, mirroring the reference's flush
suite (test.sh 7h-7l) against local directories:

- content arrives per format with derived dims + cluster (7a-7c)
- new files become visible promptly (close-write analog, 7l)
- graceful stop commits everything buffered (SIGTERM analog, 7j)
- restart from checkpoint does not duplicate, new data flows (7k/T6)
- the excluded container's logs never enter the lake (P5)
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.logs import LogLake
from kubernetes_logs_datalake_spark.streaming.ingest import IngestJob


def write_log(pods_dir, ns, pod, container, lines, fname="0.log"):
    d = os.path.join(pods_dir, "var/log/pods", f"{ns}_{pod}_uid{pod}", container)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, fname), "w") as f:
        f.write("\n".join(lines) + "\n")


def ts(i):
    return f"2024-01-15T10:30:{i % 60:02d}.{i:09d}Z"


@pytest.fixture()
def pods_dir(tmp_path):
    return str(tmp_path / "logs")


def test_ingest_end_to_end(spark, pods_dir, tmp_path):
    lake_root = str(tmp_path / "lake")
    write_log(pods_dir, "qa", "app-1", "app", [f"{ts(i)} stdout F marker-a {i}" for i in range(20)])
    write_log(pods_dir, "qa", "fb-0", "fluent-bit", [f"{ts(i)} stdout F selflog {i}" for i in range(5)])

    job = IngestJob(
        logs_dir=pods_dir, lake_root=lake_root, cluster="dev", node="n1",
        trigger_seconds=1,
    )
    job.start(spark)
    try:
        job.process_available()
        lake = LogLake(lake_root)

        # 7a: content arrival, both formats
        pq = lake.read(spark, fmt="parquet")
        assert pq.filter(F.col("message").contains("marker-a")).count() == 20
        ar = lake.read(spark, fmt="arrow")
        assert ar.filter(F.col("message").contains("marker-a")).count() == 20

        # 7b/7c: derived dims + cluster
        row = pq.filter(F.col("message").contains("marker-a 3")).first()
        assert (row.namespace, row.pod, row.container, row.cluster, row.node) == (
            "qa", "app-1", "app", "dev", "n1",
        )

        # P5: excluded container absent
        assert pq.filter(F.col("container") == "fluent-bit").count() == 0

        # 7l close-write analog: a new file (terminated pod's rotated log)
        # becomes queryable at the next drain
        write_log(pods_dir, "prod", "job-9", "main", [f"{ts(i)} stderr F done-marker" for i in range(3)])
        job.process_available()
        assert (
            lake.read(spark, fmt="parquet")
            .filter(F.col("message") == "done-marker").count() == 3
        )
    finally:
        # 7j: graceful stop completes in-flight work
        job.stop_gracefully()


def test_restart_from_checkpoint_no_duplicates(spark, pods_dir, tmp_path):
    lake_root = str(tmp_path / "lake2")
    write_log(pods_dir, "qa", "app-1", "app", [f"{ts(i)} stdout F first-batch {i}" for i in range(10)])

    job = IngestJob(logs_dir=pods_dir, lake_root=lake_root, cluster="dev", trigger_seconds=1)
    job.start(spark)
    job.process_available()
    job.stop_gracefully()

    lake = LogLake(lake_root)
    assert lake.read(spark).filter(F.col("message").contains("first-batch")).count() == 10

    # restart with the same checkpoint; add new data
    write_log(pods_dir, "qa", "app-1", "app",
              [f"{ts(i)} stdout F second-batch {i}" for i in range(7)], fname="1.log")
    job2 = IngestJob(logs_dir=pods_dir, lake_root=lake_root, cluster="dev", trigger_seconds=1)
    job2.start(spark)
    job2.process_available()
    job2.stop_gracefully()

    df = lake.read(spark)
    # old file not re-ingested (checkpointed offsets), new file ingested
    assert df.filter(F.col("message").contains("first-batch")).count() == 10
    assert df.filter(F.col("message").contains("second-batch")).count() == 7


@pytest.mark.parametrize("scheme", ["", "file://"])
def test_compaction_preserves_rows(spark, pods_dir, tmp_path, scheme):
    """Parameterized over a plain path and an explicit Hadoop FS URI —
    compaction must go through the FileSystem API, not os/shutil."""
    from kubernetes_logs_datalake_spark.streaming.ingest import compact_lake

    lake_root = scheme + str(tmp_path / "lake3")
    write_log(pods_dir, "qa", "app-1", "app", [f"{ts(i)} stdout F c-{i}" for i in range(50)])
    job = IngestJob(
        logs_dir=pods_dir, lake_root=lake_root, cluster="dev",
        trigger_seconds=1, formats=("parquet",), max_files_per_trigger=5,
    )
    job.start(spark)
    job.process_available()
    job.stop_gracefully()

    lake = LogLake(lake_root)
    # second batch → the partition holds multiple small files
    from kubernetes_logs_datalake_spark.sources import parse_cri_lines

    extra = spark.createDataFrame(
        [("/var/log/pods/qa_app-1_uid1/app/0.log", f"{ts(50 + i)} stdout F x-{i}")
         for i in range(10)],
        ["path", "value"],
    )
    lake.write_batch(parse_cri_lines(extra, path_col="path", cluster="dev"))
    before = lake.read(spark).count()
    import glob as globmod

    local_root = lake_root.removeprefix("file://")
    n_files_before = len(globmod.glob(f"{local_root}/**/*.parquet", recursive=True))
    assert n_files_before >= 2
    compact_lake(spark, lake_root)
    after = lake.read(spark).count()
    assert before == after == 60
    n_files_after = len(globmod.glob(f"{local_root}/**/*.parquet", recursive=True))
    assert n_files_after < n_files_before  # small files actually merged
    # idempotent: re-running on an already-compacted lake is a no-op
    compact_lake(spark, lake_root)
    assert lake.read(spark).count() == 60
    assert len(globmod.glob(f"{local_root}/**/*.parquet", recursive=True)) == n_files_after


def test_compaction_spares_concurrent_appends(spark, pods_dir, tmp_path):
    """A batch appended between compaction's snapshot and its deletes
    must survive (regression: the whole-tree swap deleted it). Simulated
    by appending after a first compaction and re-compacting: only
    snapshot files are ever deleted, so data never straddles a delete."""
    from kubernetes_logs_datalake_spark.sources import parse_cri_lines
    from kubernetes_logs_datalake_spark.streaming.ingest import compact_lake

    lake_root = str(tmp_path / "lake3b")
    lake = LogLake(lake_root)
    raw1 = spark.createDataFrame(
        [("/var/log/pods/qa_p_u/app/0.log", f"{ts(i)} stdout F a-{i}") for i in range(10)],
        ["path", "value"],
    )
    lake.write_batch(parse_cri_lines(raw1, path_col="path", cluster="c"))
    compact_lake(spark, lake_root, min_files=1)
    # late batch lands after compaction snapshot/rewrite
    raw2 = spark.createDataFrame(
        [("/var/log/pods/qa_p_u/app/0.log", f"{ts(i)} stdout F b-{i}") for i in range(5)],
        ["path", "value"],
    )
    lake.write_batch(parse_cri_lines(raw2, path_col="path", cluster="c"))
    compact_lake(spark, lake_root, min_files=1)
    msgs = {r.message for r in lake.read(spark).collect()}
    assert len(msgs) == 15 and "b-4" in msgs and "a-9" in msgs


def test_compaction_dual_format_checkpoint_integration(spark, pods_dir, tmp_path):
    """Integration over one qualified (file://-scheme) root: streaming
    dual-format ingest with checkpointed offsets, then compaction, then
    a restart. Compaction must shrink the parquet side only — the Arrow
    files and the checkpoint survive byte-for-byte, and the restarted
    stream resumes from its offsets (no re-ingest) while new data still
    flows. Catches scheme-handling regressions none of the single-
    feature tests can."""
    import glob as globmod

    from kubernetes_logs_datalake_spark.streaming.ingest import compact_lake

    local_root = str(tmp_path / "lake6")
    lake_root = "file://" + local_root
    write_log(pods_dir, "qa", "app-1", "app",
              [f"{ts(i)} stdout F int-{i}" for i in range(30)])
    job = IngestJob(
        logs_dir=pods_dir, lake_root=lake_root, cluster="dev",
        trigger_seconds=1, max_files_per_trigger=3,
    )
    job.start(spark)
    job.process_available()
    # second file before stopping → more small parquet files
    write_log(pods_dir, "qa", "app-1", "app",
              [f"{ts(30 + i)} stdout F int-{30 + i}" for i in range(10)], fname="1.log")
    job.process_available()
    job.stop_gracefully()

    lake = LogLake(lake_root)
    assert lake.read(spark, fmt="parquet").count() == 40
    n_arrow = sorted(globmod.glob(f"{local_root}/**/*.arrow", recursive=True))
    n_pq_before = len(globmod.glob(f"{local_root}/**/*.parquet", recursive=True))
    assert n_pq_before >= 2 and len(n_arrow) >= 1
    ckpt_dir = local_root + "_checkpoint"
    ckpt_files_before = sorted(globmod.glob(f"{ckpt_dir}/**", recursive=True))
    assert ckpt_files_before, "checkpoint must live outside the lake root"

    compact_lake(spark, lake_root)

    # parquet shrank, rows identical, both formats still queryable
    assert len(globmod.glob(f"{local_root}/**/*.parquet", recursive=True)) < n_pq_before
    assert lake.read(spark, fmt="parquet").count() == 40
    assert sorted(globmod.glob(f"{local_root}/**/*.arrow", recursive=True)) == n_arrow
    assert lake.read(spark, fmt="arrow").count() == 40
    # checkpoint untouched by compaction
    assert sorted(globmod.glob(f"{ckpt_dir}/**", recursive=True)) == ckpt_files_before

    # restart: offsets intact (no re-ingest), new data flows
    write_log(pods_dir, "prod", "late-1", "main",
              [f"{ts(50)} stdout F post-compact"], fname="0.log")
    job2 = IngestJob(
        logs_dir=pods_dir, lake_root=lake_root, cluster="dev",
        trigger_seconds=1, max_files_per_trigger=3,
    )
    job2.start(spark)
    job2.process_available()
    job2.stop_gracefully()
    df = lake.read(spark, fmt="parquet")
    assert df.filter(F.col("message").startswith("int-")).count() == 40
    assert df.filter(F.col("message") == "post-compact").count() == 1


def test_lake_read_stream(spark, pods_dir, tmp_path):
    """Downstream consumers tail the lake itself as a stream."""
    lake_root = str(tmp_path / "lake4")
    write_log(pods_dir, "qa", "app-1", "app", [f"{ts(i)} stdout F s-{i}" for i in range(15)])
    job = IngestJob(logs_dir=pods_dir, lake_root=lake_root, cluster="dev",
                    trigger_seconds=1, formats=("parquet",))
    job.start(spark)
    job.process_available()
    job.stop_gracefully()

    stream = LogLake(lake_root).read_stream(spark)
    assert stream.isStreaming
    q = (stream.groupBy("namespace").count()
         .writeStream.format("memory").queryName("lake_tail")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        rows = {(r.namespace, r["count"]) for r in spark.sql("SELECT * FROM lake_tail").collect()}
        assert rows == {("qa", 15)}
    finally:
        q.stop()


def test_compaction_preserves_arrow_side(spark, pods_dir, tmp_path):
    """Compaction rewrites parquet only — the Arrow IPC side of a
    dual-format lake must survive the directory swap (regression: it was
    silently deleted)."""
    import glob as globmod

    from kubernetes_logs_datalake_spark.sources import parse_cri_lines
    from kubernetes_logs_datalake_spark.streaming.ingest import compact_lake

    lake_root = str(tmp_path / "lake5")
    raw = spark.createDataFrame(
        [("/var/log/pods/qa_p_u/app/0.log", f"{ts(i)} stdout F d-{i}") for i in range(20)],
        ["path", "value"],
    )
    lake = LogLake(lake_root)
    rec = parse_cri_lines(raw, path_col="path", cluster="c")
    lake.write_batch(rec, fmt="parquet")
    lake.write_batch(rec, fmt="arrow")
    n_arrow_before = len(globmod.glob(f"{lake_root}/**/*.arrow", recursive=True))
    assert n_arrow_before >= 1

    compact_lake(spark, lake_root)
    assert len(globmod.glob(f"{lake_root}/**/*.arrow", recursive=True)) == n_arrow_before
    assert lake.read(spark, fmt="parquet").count() == 20
    assert lake.read(spark, fmt="arrow").count() == 20
