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
            # persist: isEmpty + one write per format would otherwise
            # re-read and re-parse every input file per sink (3x the
            # ingest hot path with the default dual-format config)
            batch_df.persist()
            try:
                if not batch_df.isEmpty():
                    for fmt in formats:
                        lake.write_batch(batch_df, fmt=fmt)
            finally:
                batch_df.unpersist()

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


def _parquet_files_by_dir(fs, root) -> dict[str, list[str]]:
    """Recursive data-file listing grouped by parent directory (Hadoop
    FileSystem API — works on any scheme), skipping _SUCCESS/.crc and
    other marker files."""
    by_dir: dict[str, list[str]] = {}
    it = fs.listFiles(root, True)
    while it.hasNext():
        p = it.next().getPath()
        name = p.getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            by_dir.setdefault(p.getParent().toString(), []).append(p.toString())
    return by_dir


def compact_lake(
    spark: SparkSession,
    lake_root: str,
    target_records_per_file: int = 5_000_000,
    min_files: int = 2,
) -> None:
    """Small-file compaction (the OPTIMIZE-style answer to micro-batch
    files the reference simply accepts). Rewrites each partition's many
    small parquet files into few large time-clustered ones; idempotent
    under re-run — at-least-once duplicates from ingest are NOT removed
    (they are an ingest contract), only file counts change.

    Object-store-safe, Hadoop FileSystem API end to end (``s3a://`` and
    local paths take the same code path):

    1. snapshot the parquet listing, keeping partitions with
       ≥ ``min_files`` files;
    2. read EXACTLY the snapshot files (basePath keeps hive values);
    3. write compacted files to a sibling temp tree;
    4. rename them into the live partition dirs, then delete exactly
       the snapshot files — never a whole-tree swap, so the Arrow side
       of a dual-format lake and any checkpoint dirs are untouched.

    Concurrent WRITERS are safe: a batch appended after the snapshot is
    neither read nor deleted (the old swap deleted it). Concurrent
    READERS can transiently see a compacted file next to its inputs —
    duplicate rows within the lake's at-least-once contract; compact
    quiesced partitions (e.g. closed days) where exactly-once reads
    matter, or use a transactional table format (Delta OPTIMIZE) —
    see ``sources.delta_lake``.
    """
    import uuid as uuidmod

    from kubernetes_logs_datalake_spark.schema import NATIVE_PARTITIONING

    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    root = hpath(lake_root)
    fs = root.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return
    qroot = fs.makeQualified(root)
    targets = {
        d: fl
        for d, fl in _parquet_files_by_dir(fs, qroot).items()
        if len(fl) >= min_files
    }
    if not targets:
        return
    snapshot = [f for fl in targets.values() for f in fl]
    df = spark.read.option("basePath", qroot.toString()).parquet(*snapshot)
    tmp_root = qroot.toString().rstrip("/") + f"_compacting_{uuidmod.uuid4().hex}"
    # same physical layout as LogLake.write_batch: range-partitioned and
    # sorted on (partition cols, time_ns) → disjoint-time files whose
    # row groups zone-map-skip under --since predicates
    cols = [F.col(c) for c in NATIVE_PARTITIONING] + [F.col("time_ns")]
    (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy(*NATIVE_PARTITIONING)
        .parquet(tmp_root)
    )
    qtmp = fs.makeQualified(hpath(tmp_root))
    tmp_prefix = qtmp.toString()
    for _d, files in _parquet_files_by_dir(fs, qtmp).items():
        for f in files:
            rel = f[len(tmp_prefix):].lstrip("/")
            dest = hpath(qroot.toString() + "/" + rel)
            fs.mkdirs(dest.getParent())
            if not fs.rename(hpath(f), dest):
                raise OSError(f"compaction rename failed: {f} -> {dest}")
    for f in snapshot:
        fs.delete(hpath(f), False)
    fs.delete(qtmp, True)
