"""The log lake: partitioned columnar storage of log records, readable
and writable in two layouts and two formats.

Layouts
-------
- **native** (default): hive-style ``cluster=…/namespace=…/date=…``
  partition directories. This is what the reference *wanted* ("Ideally
  we'd use Hive-style key=value partitioning", reference
  ``fluent-bit.conf:62-66``) and it makes partition pruning a pure
  Catalyst concern (``PruneFileSourcePartitions``): a selector equality
  filter on ``cluster``/``namespace`` or a date-bounded ``--since``
  never lists, let alone reads, non-matching directories. At 100 TB the
  date partition bounds per-query listing to the selected days.
- **positional** (reference-compatible): the reference's
  ``/<cluster>/<namespace>/YYYY/MM/DD/<node>/<pod>/<container>/HH/MM/<uuid>.ext``
  key layout, where identity columns exist only in the path. Reading it
  requires (a) selector→glob construction *before* ``load()`` — the same
  manual pruning the reference CLI does (``y-logcli:104-123``) — and
  (b) deriving the dimension columns from ``input_file_name()``
  (``y-logcli:138-143``; DuckDB's 1-based ``string_split`` indexes
  become 0-based here).

Formats: ``parquet`` natively; ``arrow`` (Feather v2, ZSTD, int8
dictionaries) via :mod:`kubernetes_logs_datalake_spark.sources.arrow_ipc`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.time_ns import ns_to_timestamp
from kubernetes_logs_datalake_spark.schema import NATIVE_PARTITIONING


def _ensure_date(df: DataFrame) -> DataFrame:
    if "date" in df.columns:
        return df
    return df.withColumn("date", F.date_format("time", "yyyy-MM-dd"))


def _normalize_time(df: DataFrame) -> DataFrame:
    """Reference-written files store a single ``time`` column as parquet
    TIMESTAMP(NANOS), which Spark reads as a long (nanosAsLong). Our
    native files carry ``time_ns`` + ``time`` explicitly. Normalize both
    shapes to the canonical pair."""
    if "time_ns" in df.columns:
        if "time" not in df.columns:
            df = df.withColumn("time", ns_to_timestamp("time_ns"))
        return df
    time_field = next((f for f in df.schema.fields if f.name == "time"), None)
    if time_field is None:
        raise ValueError(
            f"lake data has neither 'time_ns' nor 'time' columns "
            f"(found: {df.columns}) — is the root pointed at a log lake?"
        )
    if time_field.dataType.simpleString() == "bigint":
        return (
            df.withColumnRenamed("time", "time_ns")
            .withColumn("time", ns_to_timestamp("time_ns"))
        )
    return df.withColumn(
        "time_ns",
        F.try_multiply(F.unix_micros(F.col("time").cast("timestamp")), F.lit(1000)),
    )


@dataclass
class LogLake:
    """A log lake rooted at ``root`` (local path or object-store URI —
    everything goes through the Hadoop filesystem layer, so ``s3a://``
    works unchanged on a cluster)."""

    root: str
    layout: str = "native"  # native | positional
    # T2 size-flush analog: bounds output file size so one hot
    # partition cannot produce an unsplittable multi-GB file. The
    # reference bounds bytes (total_file_size 1M); record count is the
    # splittable-parquet equivalent.
    max_records_per_file: int = 5_000_000

    # ---------------------------------------------------------------- write

    def write_batch(self, df: DataFrame, fmt: str = "parquet", mode: str = "append") -> None:
        """Write a batch of canonical log records.

        Native layout only (the positional layout exists for reading data
        produced by the reference's writer, not for producing new data).
        ``maxRecordsPerFile`` caps file size so a skewed namespace/day
        cannot produce an unsplittable multi-GB file at scale.
        """
        if self.layout != "native":
            raise ValueError("write_batch supports the native hive layout only")
        out = _ensure_date(df)
        if fmt == "parquet":
            # Range-partition on (partition cols, time): a hot
            # namespace/day splits into parallel TIME-RANGE tasks (not
            # interleaved hash/skew splits), and the in-task sort makes
            # every file and row group a tight, disjoint time span —
            # zone-map clustering, so a --since predicate skips whole
            # row groups instead of scanning the day.
            cols = [F.col(c) for c in NATIVE_PARTITIONING] + [F.col("time_ns")]
            (
                out.repartitionByRange(*cols)
                .sortWithinPartitions(*cols)
                .write.mode(mode)
                .option("maxRecordsPerFile", self.max_records_per_file)
                .partitionBy(*NATIVE_PARTITIONING)
                .parquet(self.root)
            )
        elif fmt == "arrow":
            from kubernetes_logs_datalake_spark.sources.arrow_ipc import write_arrow_partitioned

            if mode != "append":
                # the uuid-file arrow sink has no overwrite semantics;
                # silently appending under mode='overwrite' would leave
                # old+new rows side by side
                raise ValueError(
                    f"arrow format supports mode='append' only, got {mode!r}"
                )
            write_arrow_partitioned(out, self.root, partition_cols=NATIVE_PARTITIONING)
        else:
            raise ValueError(f"unknown format {fmt!r}")

    # ----------------------------------------------------------------- read

    def read(
        self,
        spark: SparkSession,
        fmt: str = "parquet",
        selectors: dict[str, str] | None = None,
        cluster: str | None = None,
    ) -> DataFrame:
        """Scan the lake, pushing identity selectors into partition
        pruning (native) or glob construction (positional)."""
        if self.layout == "native":
            return self._read_native(spark, fmt, selectors or {}, cluster)
        return self._read_positional(spark, fmt, selectors or {}, cluster)

    def _read_native(
        self, spark: SparkSession, fmt: str, selectors: dict[str, str], cluster: str | None
    ) -> DataFrame:
        if fmt == "parquet":
            # pathGlobFilter: the lake may hold both formats side by side
            # (the reference writes every batch twice, fluent-bit.conf:32-67).
            df = (
                spark.read.option("basePath", self.root)
                .option("pathGlobFilter", "*.parquet")
                .parquet(self.root)
            )
        elif fmt == "arrow":
            from kubernetes_logs_datalake_spark.sources.arrow_ipc import read_arrow

            df = read_arrow(spark, self.root)
            # Hive partition values live in the directory names; the
            # arrow decode carries the file path in `_file` — recover
            # cluster/namespace/date from it (Spark's parquet source
            # does this natively; the IPC source mirrors it).
            for part in NATIVE_PARTITIONING:
                if part not in df.columns:
                    df = df.withColumn(
                        part, F.regexp_extract(F.col("_file"), f"/{part}=([^/]+)/", 1)
                    )
        else:
            raise ValueError(f"unknown format {fmt!r}")
        df = _normalize_time(df)
        # Plain equality filters: on native layout cluster/namespace/date
        # are partition columns, so Catalyst prunes directories; the rest
        # (pod/container) prune via parquet row-group dictionary/stats.
        if cluster:
            df = df.filter(F.col("cluster") == cluster)
        for k, v in selectors.items():
            df = df.filter(F.col(k) == v)
        return df

    def read_stream(self, spark: SparkSession) -> DataFrame:
        """The lake as a continuous source: downstream jobs (live
        rollups, alerting) tail the lake itself instead of re-ingesting
        raw logs. File-source discovery + checkpoints give the same
        at-least-once contract as ingest; hive partition columns are
        recovered from the directory layout."""
        if self.layout != "native":
            raise ValueError("read_stream supports the native layout only")
        static = self._read_native(spark, "parquet", {}, None)
        return (
            spark.readStream.schema(static.schema)
            .option("basePath", self.root)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1000")
            .parquet(self.root)
        )

    # -- positional (reference) layout ---------------------------------

    def positional_glob(
        self, selectors: dict[str, str], cluster: str | None, ext: str
    ) -> str:
        """Selector → glob path, mirroring the reference CLI's manual
        partition pruning (``y-logcli:104-123``): namespace substitutes
        at depth 2; a pod or container selector switches to a fixed-depth
        glob so those path positions can be pinned."""
        ns = selectors.get("namespace", "*")
        pod = selectors.get("pod", "*")
        container = selectors.get("container", "*")
        cl = cluster or "*"
        root = self.root.rstrip("/")
        if pod != "*" or container != "*":
            return f"{root}/{cl}/{ns}/*/*/*/*/{pod}/{container}/*/*/*.{ext}"
        return f"{root}/{cl}/{ns}/*/*/*/*/*/*/*/*/*.{ext}"

    def _positional_dim_cols(self, file_col: F.Column | None = None) -> dict[str, F.Column]:
        """Dimension columns derived from the file path — the Spark
        equivalent of ``string_split(filename,'/')[5/9/10/11]``
        (``y-logcli:138-143``). Anchored at the lake root so the result
        is independent of filesystem prefix and URI scheme."""
        # .../<root>/<cluster>/<ns>/YYYY/MM/DD/<node>/<pod>/<container>/HH/MM/<file>
        root_name = os.path.basename(self.root.rstrip("/"))
        pat = (
            "/" + root_name + "/"
            r"([^/]+)/([^/]+)/(\d{4})/(\d{2})/(\d{2})/([^/]+)/([^/]+)/([^/]+)/"
        )
        f = file_col if file_col is not None else F.input_file_name()
        return {
            "cluster": F.regexp_extract(f, pat, 1),
            "namespace": F.regexp_extract(f, pat, 2),
            "node": F.regexp_extract(f, pat, 6),
            "pod": F.regexp_extract(f, pat, 7),
            "container": F.regexp_extract(f, pat, 8),
        }

    def _read_positional(
        self, spark: SparkSession, fmt: str, selectors: dict[str, str], cluster: str | None
    ) -> DataFrame:
        ext = "arrow" if fmt == "arrow" else "parquet"
        glob = self.positional_glob(selectors, cluster, ext)
        if fmt == "parquet":
            df = spark.read.parquet(glob)
        elif fmt == "arrow":
            from kubernetes_logs_datalake_spark.sources.arrow_ipc import read_arrow

            df = read_arrow(spark, glob)
        else:
            raise ValueError(f"unknown format {fmt!r}")
        df = _normalize_time(df)
        file_col = F.col("_file") if "_file" in df.columns else None
        for name, col in self._positional_dim_cols(file_col).items():
            if name not in df.columns:
                df = df.withColumn(name, col)
        # Globs already pruned; re-apply as filters for exactness (a `*`
        # glob component matches more than an equality selector would).
        if cluster:
            df = df.filter(F.col("cluster") == cluster)
        for k, v in selectors.items():
            df = df.filter(F.col(k) == v)
        return df
