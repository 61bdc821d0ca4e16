"""Streaming ingest job: CRI log files → dual-format partitioned lake.

The reference's ingest is a Fluent Bit DaemonSet: inotify-tail of
``/var/log/pods/*/*/*.log``, per-(pod,container) buffers, and four flush
triggers — size (1 MB), timeout (60 s), close-write, SIGTERM (reference
``fluent-bit.conf:6-67``, ``close-write-flush.patch``). The semantics to
preserve (reference ``test.sh`` 7h–7l): bounded flush latency, prompt
visibility of terminated containers' logs, graceful-stop completeness,
and at-least-once delivery with checkpointed offsets.

Spark-first mapping (not a port):

- **Source**: the file stream source discovers *new* files each trigger
  (``pathGlobFilter``/``maxFilesPerTrigger``); checkpointed file offsets
  are the tail-DB analog (T6). Spark's unit is the file, not the
  appended line — the stream consumes closed/rotated CRI chunks, which
  makes the reference's close-write trigger (T4) hold by construction:
  a file is ingested, wholly, the trigger after it appears.
- **T3 timeout flush** → ``trigger(processingTime=…)`` upper-bounds
  latency the way ``upload_timeout`` does.
- **T2 size flush** → ``maxRecordsPerFile``/``maxBytesPerTrigger``-style
  rolling inside the batch writer bounds file sizes.
- **T5 graceful stop** → ``stop_gracefully()`` lets the in-flight batch
  commit (``foreachBatch`` is atomic per epoch); nothing buffered is
  lost, and re-delivery after an unclean stop is at-least-once (T6),
  exactly the reference's contract (its tests count *distinct* markers
  for this reason, ``test.sh:519-525``).
- **Per-key buffers (T1)** → ``partitionBy`` on the lake layout; there
  is no per-pod state to manage because batches are written partitioned.

At 100 TB/day the same topology holds: one stream per cluster (or a
shared S3 inventory stream), file-offset checkpoints in object storage,
AQE-sized batch writes, and a periodic compaction pass for small files
(``compact_lake``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.cri import parse_cri_lines
from kubernetes_logs_datalake_spark.sources.logs import LogLake

DEFAULT_EXCLUDE = "fluent-bit"  # reference Exclude_Path: its own logs


@dataclass
class IngestJob:
    """Config + lifecycle for one ingest stream (≈ one DaemonSet)."""

    logs_dir: str
    lake_root: str
    cluster: str
    node: str = "local"
    formats: tuple[str, ...] = ("parquet", "arrow")
    trigger_seconds: int = 60  # reference upload_timeout
    max_files_per_trigger: int = 1000  # backpressure (T8)
    exclude_container: str | None = DEFAULT_EXCLUDE
    checkpoint: str | None = None
    _query: object = field(default=None, repr=False)

    # ------------------------------------------------------------ plan

    def source(self, spark: SparkSession) -> DataFrame:
        """Streaming source of (path, value) CRI lines."""
        reader = (
            spark.readStream.format("text")
            .option("pathGlobFilter", "*.log")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        )
        raw = reader.load(self.logs_dir).withColumn("path", F.input_file_name())
        if self.exclude_container:
            # reference Exclude_Path /var/log/pods/*/fluent-bit/*.log
            raw = raw.filter(~F.col("path").contains(f"/{self.exclude_container}/"))
        return raw

    def records(self, spark: SparkSession) -> DataFrame:
        return parse_cri_lines(
            self.source(spark), path_col="path", cluster=self.cluster, node=self.node
        )

    # ------------------------------------------------------------- run

    def start(self, spark: SparkSession):
        lake = LogLake(self.lake_root)
        formats = self.formats

        def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if not batch_df.isEmpty():
                for fmt in formats:
                    lake.write_batch(batch_df, fmt=fmt)

        # checkpoint lives OUTSIDE the lake root so compaction's
        # directory swap can never clobber stream offsets
        checkpoint = self.checkpoint or (self.lake_root.rstrip("/") + "_checkpoint")
        self._query = (
            self.records(spark)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )
        return self._query

    def process_available(self) -> None:
        """Drain everything currently discoverable (test/backfill aid)."""
        self._query.processAllAvailable()

    def stop_gracefully(self) -> None:
        """T5: finish the in-flight epoch, then stop.

        ``StreamingQuery.stop`` interrupts; ``processAllAvailable`` first
        ensures buffered input is committed — the 30 s-grace SIGTERM
        analog."""
        if self._query is not None:
            self._query.processAllAvailable()
            self._query.stop()
            self._query.awaitTermination(30)


def compact_lake(
    spark: SparkSession,
    lake_root: str,
    target_records_per_file: int = 5_000_000,
) -> None:
    """Small-file compaction (the OPTIMIZE-style answer to micro-batch
    files the reference simply accepts). Rewrites each partition's many
    small parquet files into few large ones; idempotent under re-run —
    at-least-once duplicates from ingest are NOT removed here (they are
    an ingest contract), only file counts change.
    """
    import os
    import shutil

    lake = LogLake(lake_root)
    df = lake.read(spark, fmt="parquet")
    tmp = lake_root.rstrip("/") + "_compacted"
    (
        df.repartition("cluster", "namespace", "date")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy("cluster", "namespace", "date")
        .parquet(tmp)
    )
    # The directory swap replaces the whole tree — carry the lake's
    # non-parquet content (the Arrow IPC side of the dual-format lake)
    # into the compacted tree first, or it would be silently deleted.
    root = lake_root.rstrip("/")
    for dirpath, _dirs, files in os.walk(root):
        for fname in files:
            if fname.endswith(".arrow"):
                rel = os.path.relpath(os.path.join(dirpath, fname), root)
                dest = os.path.join(tmp, rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                shutil.copy2(os.path.join(dirpath, fname), dest)
    # atomic-ish swap on the same filesystem
    old = root + "_old"
    shutil.move(lake_root, old)
    shutil.move(tmp, lake_root)
    shutil.rmtree(old)
