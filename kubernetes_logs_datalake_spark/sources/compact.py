"""Executing small-file compactor: plan → rewrite bins → swap.

The planner (``sources.metadata.compaction_plan``) bins a file LISTING;
this module executes the rewrite the plan describes, with the
at-least-once discipline of SURVEY §7.5 (crash anywhere, re-run, and
the lake converges to the same state — the same contract the streaming
sink keeps):

* The target file name is a **pure function of the bin's source file
  list** (sha256 over the sorted source paths), so every re-run of the
  same plan derives the same target — replay never forks.
* Per bin, the rewrite is a tiny state machine replayed idempotently:
    target absent,  sources present → write target (staged), delete
                                      sources
    target present, sources present → crashed between publish and
                                      delete → just delete sources
    target present, sources absent  → bin already done → no-op
* The staged write goes to a ``_compact-…`` name in the SAME directory:
  Hadoop/Spark readers ignore ``_``/``.``-prefixed files, so a
  half-written stage is invisible, and the publish is a same-directory
  ``os.replace`` — one atomic syscall on a real filesystem. (On an
  object store the publish is copy+delete; the commit-log of a table
  format is what makes THAT atomic — see sources/delta_lake.py for the
  contract. The replay matrix above is what keeps plain-parquet
  correctness anyway: worst case a reader between publish and
  source-delete sees a bin twice, never torn and never missing.)

Bins are metadata rows: the driver iterates the PLAN (thousands of
rows at 100 TB, not bytes of data) and each bin's rewrite is one
distributed read→write job; independent bins are embarrassingly
parallel, so at scale you run the loop with a thread pool submitting
concurrent Spark jobs (``max_parallel_bins``) — the default of 4 keeps
a local[32] test box busy without job-queue thrash.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.metadata import _local, glob_files


def compaction_bins(
    spark: SparkSession, pattern: str, target_bytes: int
) -> DataFrame:
    """Per-FILE bin assignment — the executable form of
    ``compaction_plan`` (which aggregates this to a report). Same
    binning rule: within each parent dir, pack files in path order by
    exclusive-cumsum DIV target; an oversized file closes its bin.
    Output: (dir, bin, path, length), deterministic under re-listing.

    Files this compactor itself published (``compact-<hash>.parquet``)
    are EXCLUDED from binning: including them would shift every
    neighbor's cumsum on replay — a crashed run's published target
    would land inside its own sources' bin, fork the target name, and
    the rewrite would double the rows. Exclusion keeps replay bins
    byte-identical to the crashed run's. (Consequence: compact outputs
    are terminal for this compactor — re-compacting compacted files
    into larger ones is a different generation with its own plan.)
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    from pyspark.sql import Window

    files = (
        glob_files(spark, pattern)
        .filter(~F.col("path").rlike("/compact-[0-9a-f]{16}\\.parquet$"))
        .select(
            F.regexp_replace("path", "/[^/]+$", "").alias("dir"),
            "path",
            "length",
        )
    )
    w = (
        Window.partitionBy("dir")
        .orderBy("path")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        files.withColumn(
            "_cum", F.coalesce(F.sum("length").over(w), F.lit(0))
        )
        .withColumn("bin", F.expr(f"CAST(_cum DIV {target_bytes} AS LONG)"))
        .select("dir", "bin", "path", "length")
    )


def _target_name(paths: list[str]) -> str:
    h = hashlib.sha256("\n".join(sorted(paths)).encode()).hexdigest()[:16]
    return f"compact-{h}.parquet"


def _rewrite_bin(spark: SparkSession, dir_: str, paths: list[str]) -> str:
    """Execute one bin's state machine; returns the action taken."""
    ldir = _local(dir_)
    lpaths = [_local(p) for p in paths]
    target = os.path.join(ldir, _target_name(paths))
    existing = [p for p in lpaths if os.path.exists(p)]
    if os.path.exists(target):
        action = "replayed_delete" if existing else "already_done"
    else:
        if len(existing) < len(lpaths):
            # target missing AND some sources gone: a concurrent writer
            # broke the plan's snapshot — refuse rather than guess
            raise RuntimeError(
                f"bin in {dir_} lost {len(lpaths) - len(existing)} source "
                f"files without a published target; re-plan before rerun"
            )
        stage_dir = os.path.join(ldir, f"_compact-stage-{_target_name(paths)}")
        shutil.rmtree(stage_dir, ignore_errors=True)
        # one distributed read of exactly this bin's files, one output
        # file: the shuffle-free coalesce(1) narrows the write, it does
        # NOT re-sort — row order is concatenation in path order
        (
            spark.read.parquet(*sorted(paths))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage_dir)
        )
        part = next(
            os.path.join(stage_dir, f)
            for f in os.listdir(stage_dir)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        os.replace(part, target)  # atomic publish, same filesystem
        shutil.rmtree(stage_dir, ignore_errors=True)
        action = "rewritten"
    for p in lpaths:
        if os.path.exists(p):
            os.remove(p)
    return action


def compact_files(
    spark: SparkSession,
    pattern: str,
    target_bytes: int,
    max_parallel_bins: int = 4,
) -> DataFrame:
    """Execute the compaction plan for ``pattern``: every multi-file
    bin is rewritten to one deterministically-named file and its
    sources removed; single-file bins are untouched. Idempotent — a
    crashed run re-converges on re-run (see module docstring) — and
    query-preserving: the compacted lake returns byte-identical results
    (order-insensitive; compaction concatenates, never drops/edits).

    Returns the execution report: (dir, bin, n_source_files, bytes_in,
    target, action), action ∈ {rewritten, replayed_delete,
    already_done, skip_single}.
    """
    rows = compaction_bins(spark, pattern, target_bytes).collect()
    bins: dict[tuple[str, int], list] = {}
    for r in rows:
        bins.setdefault((r.dir, r.bin), []).append(r)

    report = []

    def run_bin(key):
        dir_, b = key
        members = sorted(bins[key], key=lambda r: r.path)
        paths = [m.path for m in members]
        total = sum(m.length for m in members)
        if len(paths) == 1:
            action, target = "skip_single", None
        else:
            action = _rewrite_bin(spark, dir_, paths)
            target = os.path.join(_local(dir_), _target_name(paths))
        return (dir_, b, len(paths), total, target, action)

    with ThreadPoolExecutor(max_workers=max_parallel_bins) as pool:
        report = list(pool.map(run_bin, sorted(bins)))

    return spark.createDataFrame(
        report,
        "dir string, bin long, n_source_files int, bytes_in long, "
        "target string, action string",
    ).orderBy("dir", "bin")
