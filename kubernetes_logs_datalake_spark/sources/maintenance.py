"""Lake maintenance: retention expiry and key-based upsert for the
plain-parquet LogLake — the lifecycle operations a transactional table
format gives you for free, implemented object-store-safe on the Hadoop
FileSystem API (the same s3a://-or-local code path as ``compact_lake``,
whose snapshot→write→rename→delete dance these ops reuse).

Scale notes: both operators touch ONLY the affected partition
directories — expiry never lists file contents, upsert reads and
rewrites just the partitions present in the update set. At 100 TB the
cost is proportional to the data actually changing, never the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, root: str):
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path
    p = hpath(root)
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, hpath, fs.makeQualified(p)


def list_date_partitions(spark: SparkSession, lake_root: str) -> list[str]:
    """All ``date=<d>`` partition directory paths under the lake's
    hive layout (cluster=/namespace=/date=), via FS listing only."""
    fs, hpath, qroot = _fs(spark, lake_root)
    if not fs.exists(qroot):
        return []
    out = []

    def walk(p):
        for st in fs.listStatus(p):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.startswith("date="):
                out.append(st.getPath().toString())
            elif name.startswith(("cluster=", "namespace=")):
                walk(st.getPath())

    walk(qroot)
    return sorted(out)


def expire_partitions(
    spark: SparkSession,
    lake_root: str,
    before_date: str,
    dry_run: bool = False,
) -> list[str]:
    """Retention enforcement: drop every ``date=<d>`` partition with
    ``d < before_date`` (ISO dates — lexicographic == chronological).
    Returns the partition paths that were (or, with ``dry_run``, would
    be) deleted. Directory-granular: no file reads, no data movement,
    safe under concurrent writers appending CURRENT dates.
    """
    fs, hpath, _ = _fs(spark, lake_root)
    victims = [
        p
        for p in list_date_partitions(spark, lake_root)
        if p.rsplit("date=", 1)[1] < before_date
    ]
    if not dry_run:
        for p in victims:
            fs.delete(hpath(p), True)
    return victims


def merge_upsert(
    spark: SparkSession,
    lake_root: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """Key-based upsert into the parquet lake (MERGE-INTO semantics
    without a transaction log): within every partition present in
    ``updates``, rows whose key matches an update are REPLACED and new
    keys are APPENDED; untouched partitions are never read or written.
    Returns the number of partitions rewritten.

    Mechanics (the compact_lake swap, scoped to affected partitions):
    snapshot the affected partitions' files → read exactly those files
    → anti-join old rows against the update keys → union the updates →
    write to a temp tree → rename in → delete exactly the snapshot.
    A concurrent append after the snapshot is neither read nor deleted.
    Readers can transiently see old+new files together (duplicate rows
    within the lake's at-least-once contract) — run against quiesced
    partitions where exactly-once reads matter, or use the Delta path.
    """
    import uuid as uuidmod

    from kubernetes_logs_datalake_spark.schema import NATIVE_PARTITIONING
    from kubernetes_logs_datalake_spark.sources.logs import (
        _ensure_date,
        _normalize_time,
    )
    from kubernetes_logs_datalake_spark.streaming.ingest import (
        _parquet_files_by_dir,
    )

    # same canonicalization as LogLake.write_batch: derive date from
    # time when absent, normalize the (time_ns, time) pair
    if "time_ns" in updates.columns or "time" in updates.columns:
        updates = _ensure_date(_normalize_time(updates))
    missing = [c for c in NATIVE_PARTITIONING if c not in updates.columns]
    if missing:
        raise ValueError(
            f"updates must carry the partition columns; missing {missing}"
        )
    fs, hpath, qroot = _fs(spark, lake_root)
    affected = [
        tuple(r)
        for r in updates.select(*NATIVE_PARTITIONING).distinct().collect()
    ]
    if not affected:
        return 0
    # snapshot the files of exactly the affected partition dirs
    prefixes = {
        qroot.toString()
        + "/"
        + "/".join(
            f"{c}={v}" for c, v in zip(NATIVE_PARTITIONING, vals)
        )
        for vals in affected
    }
    by_dir = _parquet_files_by_dir(fs, qroot) if fs.exists(qroot) else {}
    snapshot = [
        f
        for d, fl in by_dir.items()
        if any(d == p or d.startswith(p + "/") for p in prefixes)
        for f in fl
    ]
    upd = updates
    if snapshot:
        old = spark.read.option("basePath", qroot.toString()).parquet(*snapshot)
        # replaced = old rows whose key matches an update
        old_kept = old.join(
            upd.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = old_kept.unionByName(
            upd.select(*old.columns), allowMissingColumns=False
        )
    else:
        merged = upd
    tmp_root = qroot.toString().rstrip("/") + f"_upserting_{uuidmod.uuid4().hex}"
    cols = [F.col(c) for c in NATIVE_PARTITIONING] + (
        [F.col("time_ns")] if "time_ns" in merged.columns else []
    )
    (
        merged.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
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
                raise OSError(f"upsert rename failed: {f} -> {dest}")
    for f in snapshot:
        fs.delete(hpath(f), False)
    fs.delete(qtmp, True)
    return len(affected)
