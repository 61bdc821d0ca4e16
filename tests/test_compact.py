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


def test_compact_crash_mid_source_delete_does_not_duplicate(
    spark, tmp_path, monkeypatch
):
    """THE replay-duplication hole (r8 ADVICE, high): crash partway
    through the source-delete loop. The survivors' exclusive-cumsum bin
    assignment would shift on re-listing — landing them in a NEW bin
    whose target is absent, so the old code rewrote their rows a second
    time next to the published target. The sidecar manifest pins the
    bin before the first delete; replay must finish the claimed bin,
    never re-bin the survivors."""
    import kubernetes_logs_datalake_spark.sources.compact as compact_mod

    root = str(tmp_path / "lake")
    total = _write_lake(spark, root, n_parts=1, files_per_part=6)
    d = os.path.join(root, "part=0")

    real_finish = compact_mod._finish_claim

    def crash_after_two(fsx, paths, existing, mpath):
        for p in existing[:2]:
            fsx.delete(p)
        raise RuntimeError("injected crash mid source-delete")

    monkeypatch.setattr(compact_mod, "_finish_claim", crash_after_two)
    with pytest.raises(Exception, match="injected crash"):
        compact_files(spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30)

    # crashed state: target published, manifest live, 4 of 6 sources left
    assert len(_data_files(d)) == 1 + 4
    assert any(f.startswith(".compact-") for f in os.listdir(d))

    monkeypatch.setattr(compact_mod, "_finish_claim", real_finish)
    rep = compact_files(
        spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30
    ).collect()
    assert [r.action for r in rep] == ["replayed_delete"]
    assert rep[0].bin == -1  # membership came from the manifest
    # converged: one compact file, exact rows, no duplicates, no manifest
    assert len(_data_files(d)) == 1
    assert spark.read.parquet(d).count() == total
    # no manifest remnants (the target's hadoop-local .crc sidecar may
    # remain — it is the checksum of the published file, not state)
    assert not any(".sources" in f for f in os.listdir(d))
    # and a further re-run is a clean no-op
    assert (
        compact_files(
            spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30
        ).collect()
        == []
    )


def test_compact_crash_before_publish_replays_from_stage(
    spark, tmp_path, monkeypatch
):
    """Crash between writing the claim manifest and publishing the
    target: the stage is intact, so replay publishes it without
    re-reading the sources, then finishes the claim."""
    import kubernetes_logs_datalake_spark.sources.compact as compact_mod

    root = str(tmp_path / "lake")
    total = _write_lake(spark, root, n_parts=1, files_per_part=4)
    d = os.path.join(root, "part=0")

    def crash_publish(*args, **kwargs):
        raise RuntimeError("injected crash before publish")

    monkeypatch.setattr(compact_mod, "_publish", crash_publish)
    with pytest.raises(Exception, match="injected crash"):
        compact_files(spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30)
    monkeypatch.undo()

    # crashed state: no target, manifest + hidden stage dir + all sources
    # (_data_files walks into the stage dir; exclude it — readers don't)
    assert len([f for f in _data_files(d) if "_compact-stage-" not in f]) == 4
    assert any(f.startswith("_compact-stage-") for f in os.listdir(d))

    rep = compact_files(
        spark, f"{root}/part=*/*.parquet", target_bytes=1 << 30
    ).collect()
    assert [r.action for r in rep] == ["replayed_publish"]
    assert len(_data_files(d)) == 1
    assert spark.read.parquet(d).count() == total
    assert not any(
        ".sources" in f or f.startswith("_compact-stage-")
        for f in os.listdir(d)
    )


def test_compact_copy_mode_end_to_end(spark, tmp_path):
    """Object-store publish semantics (no rename): copy + length-verify
    + stage delete must converge to the same lake state as rename mode,
    and re-run must be a no-op."""
    root = str(tmp_path / "lake")
    _write_lake(spark, root)
    before_hash = _lake_hash(spark, root)

    rep = compact_files(
        spark,
        f"{root}/part=*/*.parquet",
        target_bytes=1 << 30,
        publish_mode="copy",
    ).collect()
    assert all(r.action == "rewritten" for r in rep)
    assert len(_data_files(root)) == 2
    assert _lake_hash(spark, root) == before_hash
    assert (
        compact_files(
            spark,
            f"{root}/part=*/*.parquet",
            target_bytes=1 << 30,
            publish_mode="copy",
        ).collect()
        == []
    )


def test_compact_copy_mode_torn_target_republishes(spark, tmp_path):
    """A torn copy-mode publish (crash mid-PUT on a store without an
    atomic one): the target exists but its length disagrees with the
    manifest. Replay must detect the tear via the length check,
    republish, and converge — never trust a target by existence."""
    from kubernetes_logs_datalake_spark.sources.compact import (
        _Fs,
        _manifest_name,
        _sha256_of,
        _stage_part,
        _write_manifest,
    )

    root = str(tmp_path / "lake")
    total = _write_lake(spark, root, n_parts=1, files_per_part=4)
    d = os.path.join(root, "part=0")
    paths = [f"file:{p}" for p in _data_files(d)]

    # hand-build the crashed state: stage + manifest + torn target
    fsx = _Fs(spark, f"file:{d}")
    stage_dir, part = _stage_part(spark, fsx, f"file:{d}", paths)
    expected = fsx.length(part)
    _write_manifest(fsx, f"file:{d}", paths, expected, _sha256_of(spark, part))
    torn = os.path.join(d, _target_name(paths))
    with open(torn, "wb") as fh:
        fh.write(b"\x00" * (expected // 2))  # half the bytes — torn

    rep = compact_files(
        spark,
        f"{root}/part=*/*.parquet",
        target_bytes=1 << 30,
        publish_mode="copy",
    ).collect()
    assert [r.action for r in rep] == ["replayed_publish"]
    assert len(_data_files(d)) == 1
    assert spark.read.parquet(d).count() == total
    assert os.path.getsize(torn) == expected
    assert not any(
        ".sources" in f or f.startswith("_compact-stage-")
        for f in os.listdir(d)
    )


def test_compact_copy_mode_same_length_corruption_republishes(
    spark, tmp_path
):
    """A torn PUT with a coincidentally-correct LENGTH (the r9 verdict's
    'beyond-parity polish' hole): the length check passes but the bytes
    are wrong. Replay must detect it via the manifest's sha256 and
    republish — content, not size, is the claim."""
    from kubernetes_logs_datalake_spark.sources.compact import (
        _Fs,
        _sha256_of,
        _stage_part,
        _write_manifest,
    )

    root = str(tmp_path / "lake")
    total = _write_lake(spark, root, n_parts=1, files_per_part=4)
    d = os.path.join(root, "part=0")
    paths = [f"file:{p}" for p in _data_files(d)]

    fsx = _Fs(spark, f"file:{d}")
    stage_dir, part = _stage_part(spark, fsx, f"file:{d}", paths)
    expected = fsx.length(part)
    good_sha = _sha256_of(spark, part)
    _write_manifest(fsx, f"file:{d}", paths, expected, good_sha)
    torn = os.path.join(d, _target_name(paths))
    # same length, wrong bytes — rewrite the staged part's bytes with
    # a deterministic scramble (valid length, invalid content)
    with open(part.removeprefix("file:"), "rb") as fh:
        data = fh.read()
    with open(torn, "wb") as fh:
        fh.write(bytes(b ^ 0x5A for b in data[: len(data) // 2]) + data[len(data) // 2:])

    rep = compact_files(
        spark,
        f"{root}/part=*/*.parquet",
        target_bytes=1 << 30,
        publish_mode="copy",
    ).collect()
    assert [r.action for r in rep] == ["replayed_publish"]
    assert spark.read.parquet(d).count() == total
    assert _sha256_of(spark, f"file:{torn}") == good_sha
    assert not any(
        ".sources" in f or f.startswith("_compact-stage-")
        for f in os.listdir(d)
    )


def test_compact_replay_cleans_orphan_stage_when_target_ok(spark, tmp_path):
    """Crash between publish and stage-delete, then replay with an
    intact target: the r10 ADVICE leak — the stage dir (a full hidden
    duplicate of the bin in copy mode) must be deleted on the
    target_ok path too, not orphaned forever once the manifest
    retires."""
    from kubernetes_logs_datalake_spark.sources.compact import (
        _Fs,
        _publish,
        _sha256_of,
        _stage_part,
        _write_manifest,
    )

    root = str(tmp_path / "lake")
    total = _write_lake(spark, root, n_parts=1, files_per_part=4)
    d = os.path.join(root, "part=0")
    paths = [f"file:{p}" for p in _data_files(d)]

    # hand-build: published target + manifest + LEFTOVER stage dir
    fsx = _Fs(spark, f"file:{d}")
    stage_dir, part = _stage_part(spark, fsx, f"file:{d}", paths)
    expected = fsx.length(part)
    sha = _sha256_of(spark, part)
    _write_manifest(fsx, f"file:{d}", paths, expected, sha)
    target = os.path.join(d, _target_name(paths))
    _publish(spark, fsx, part, f"file:{target}", expected, sha, "copy")
    assert any(f.startswith("_compact-stage-") for f in os.listdir(d))

    rep = compact_files(
        spark,
        f"{root}/part=*/*.parquet",
        target_bytes=1 << 30,
        publish_mode="copy",
    ).collect()
    assert [r.action for r in rep] == ["replayed_delete"]
    assert spark.read.parquet(d).count() == total
    assert not any(
        ".sources" in f or f.startswith("_compact-stage-")
        for f in os.listdir(d)
    )


def test_compact_pattern_without_separator_rejected(spark):
    """A separator-less pattern can't locate claim manifests; silently
    skipping phase 0 would bypass the replay-duplication protection
    (r10 ADVICE) — it must raise instead."""
    with pytest.raises(ValueError, match="directory component"):
        compact_files(spark, "orders.parquet", target_bytes=1 << 20)


def test_sha256_streaming_fallback_matches_binaryfile(spark, tmp_path):
    """Files at/past the binaryFile content cap stream through the JVM
    MessageDigest fallback (r10 ADVICE: a >=2 GiB bin used to crash
    the verify leg and wedge every replay at the same point).
    Exercised by lowering the threshold so a small file takes the
    streaming path; the digest must be bit-identical to hashlib and to
    the binaryFile leg — including a leading-zero digest's padding."""
    import hashlib

    from kubernetes_logs_datalake_spark.sources.compact import _sha256_of

    p = tmp_path / "blob.bin"
    data = bytes(range(256)) * 4097  # ~1 MiB, not buffer-aligned
    p.write_bytes(data)
    expected = hashlib.sha256(data).hexdigest()
    assert _sha256_of(spark, f"file:{p}") == expected
    assert _sha256_of(spark, f"file:{p}", binaryfile_max=1024) == expected
