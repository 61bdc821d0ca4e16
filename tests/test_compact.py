"""Executing compactor: idempotence, crash replay, query preservation.

The r7 gap: ``compaction_plan`` binned files but nothing rewrote them.
``compact_files`` executes the plan; these tests pin the at-least-once
contract (SURVEY §7.5): re-run converges, a crash between publish and
source-delete replays to the same state, and a query over the lake
hashes identically pre/post compaction while scanning fewer files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.compact import (
    _target_name,
    compact_files,
    compaction_bins,
)


def _write_lake(spark, root, n_parts=2, files_per_part=6, rows_per_file=50):
    """Many tiny files across partition dirs; returns row count."""
    n = 0
    for p in range(n_parts):
        d = os.path.join(root, f"part={p}")
        os.makedirs(d, exist_ok=True)
        for f in range(files_per_part):
            df = spark.range(n, n + rows_per_file).select(
                F.col("id"), (F.col("id") % 7).alias("v")
            )
            df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_stage")
            part = next(
                x
                for x in os.listdir(f"{d}/_stage")
                if x.startswith("part-") and x.endswith(".parquet")
            )
            os.replace(f"{d}/_stage/{part}", f"{d}/f-{f:03d}.parquet")
            import shutil

            shutil.rmtree(f"{d}/_stage")
            n += rows_per_file
    return n


def _lake_hash(spark, root):
    rows = sorted(
        (r.id, r.v)
        for r in spark.read.parquet(f"{root}/part=*/").collect()
    )
    return hash(tuple(rows)), len(rows)


def _data_files(root):
    out = []
    for d, _, fs in os.walk(root):
        out += [
            os.path.join(d, f)
            for f in fs
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    return sorted(out)


def test_compact_reduces_files_preserves_query(spark, tmp_path):
    root = str(tmp_path / "lake")
    _write_lake(spark, root)
    before_hash = _lake_hash(spark, root)
    n_before = len(_data_files(root))

    rep = compact_files(
        spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30
    ).collect()
    assert all(r.action == "rewritten" for r in rep)

    n_after = len(_data_files(root))
    assert n_after < n_before and n_after == 2  # one file per partition
    assert _lake_hash(spark, root) == before_hash


def test_compact_rerun_is_noop(spark, tmp_path):
    root = str(tmp_path / "lake")
    _write_lake(spark, root)
    compact_files(spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30)
    files = _data_files(root)
    rep2 = compact_files(
        spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30
    ).collect()
    # compact outputs are excluded from binning (terminal for this
    # generation), so a second run finds nothing to do at all
    assert rep2 == []
    assert _data_files(root) == files


def test_compact_crash_between_publish_and_delete_replays(spark, tmp_path):
    """Simulate the worst crash: target published, sources still on
    disk (the at-least-once duplicate window). Re-run must delete the
    sources without rewriting, landing on the exact same lake state."""
    root = str(tmp_path / "lake")
    total = _write_lake(spark, root, n_parts=1)
    d = os.path.join(root, "part=0")
    paths = [f"file:{p}" for p in _data_files(d)]

    # hand-publish the deterministic target, keep the sources
    src = spark.read.parquet(*sorted(paths))
    src.coalesce(1).write.mode("overwrite").parquet(f"{d}/_stage")
    part = next(
        x
        for x in os.listdir(f"{d}/_stage")
        if x.startswith("part-") and x.endswith(".parquet")
    )
    os.replace(f"{d}/_stage/{part}", os.path.join(d, _target_name(paths)))
    import shutil

    shutil.rmtree(f"{d}/_stage")
    # duplicate window is visible (reader sees the bin twice)...
    assert spark.read.parquet(d).count() == 2 * total

    rep = compact_files(
        spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30
    ).collect()
    # ...but replay converges: sources deleted, target kept, rows exact
    acts = {r.action for r in rep}
    assert "replayed_delete" in acts
    assert spark.read.parquet(d).count() == total


def test_compact_oversized_file_untouched(spark, tmp_path):
    root = str(tmp_path / "lake")
    _write_lake(spark, root, n_parts=1, files_per_part=3)
    before = _data_files(root)
    # target smaller than any single file: every file is its own bin
    rep = compact_files(
        spark, f"{root}/part=*/*.parquet", target_bytes=10
    ).collect()
    assert all(r.action == "skip_single" for r in rep)
    assert _data_files(root) == before


def test_compaction_bins_rejects_bad_target(spark):
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_bins(spark, "/tmp/nope/*.parquet", 0)
