"""Executing small-file compactor: plan → claim → rewrite bins → swap.

The planner (``sources.metadata.compaction_plan``) bins a file LISTING;
this module executes the rewrite the plan describes, with the
at-least-once discipline of SURVEY §7.5 (crash anywhere, re-run, and
the lake converges to the same state — the same contract the streaming
sink keeps):

* The target file name is a **pure function of the bin's source file
  list** (sha256 over the sorted source paths), so every re-run of the
  same plan derives the same target — replay never forks.
* Before any source file is deleted, the bin's membership is pinned by
  a **sidecar manifest** (``.compact-<hash>.sources`` — hidden, so no
  reader sees it): the sorted source list plus the published target's
  expected byte length. Planning EXCLUDES claimed files, so a crash in
  the middle of the source-delete loop can never shift the survivors
  into a fresh bin and rewrite rows that already live in the published
  target (the r8 replay-duplication hole: exclusive-cumsum bins are
  only deterministic while the listing is). Replay of a found manifest
  finishes exactly the claimed bin: republish if the target is absent
  or torn (length ≠ expected), then delete surviving sources, then
  retire the manifest.
* Per bin, the rewrite is a tiny state machine replayed idempotently:
    target absent,  sources present → stage, claim, publish, delete
    target present, sources present → crashed between publish and
                                      delete → claim, delete sources
    target present, sources absent  → bin already done → no-op
* The staged write goes to a ``_compact-…`` name in the SAME directory:
  Hadoop/Spark readers ignore ``_``/``.``-prefixed files, so a
  half-written stage is invisible. Publish is pluggable:
    - ``publish_mode="rename"`` — one ``FileSystem.rename`` (atomic on
      a real filesystem / HDFS).
    - ``publish_mode="copy"`` — object-store semantics (S3 has no
      rename): ``FileUtil.copy`` stage→target, verify the target's
      length against the manifest, then delete the stage. A torn
      target (crash mid-copy on a store without atomic PUT) fails the
      length check on replay and is re-published from the stage or
      re-staged from the still-present sources.
  Worst case in either mode, a reader between publish and source-delete
  sees a bin twice, never torn and never missing — at-least-once, like
  the ingest sink; a table format's commit log is what upgrades that to
  exactly-once (see sources/delta_lake.py for the contract).

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
import tempfile
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.sources.metadata import _local, glob_files


def compaction_bins(
    spark: SparkSession,
    pattern: str,
    target_bytes: int,
    claimed: set[str] | None = None,
) -> DataFrame:
    """Per-FILE bin assignment — the executable form of
    ``compaction_plan`` (which aggregates this to a report). Same
    binning rule: within each parent dir, pack files in path order by
    exclusive-cumsum DIV target; an oversized file closes its bin.
    Output: (dir, bin, path, length), deterministic under re-listing.

    Two exclusions keep replay bins byte-identical to a crashed run's
    (the cumsum makes every bin a function of its NEIGHBORS, so a file
    that re-enters or leaves the listing forks every downstream bin):

    * Files this compactor itself published
      (``compact-<hash>.parquet``) — a crashed run's target would land
      inside its own sources' bin and double the rows. Compact outputs
      are terminal for this compactor; re-compacting them is a
      different generation with its own plan.
    * Files named in ``claimed`` — sources pinned by a live manifest
      (crash happened after the claim); their bin is finished by the
      manifest replay, never by re-planning.
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
    if claimed:
        files = files.filter(~F.col("path").isin(sorted(claimed)))
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


def _bin_hash(paths: list[str]) -> str:
    return hashlib.sha256("\n".join(sorted(paths)).encode()).hexdigest()[:16]


def _target_name(paths: list[str]) -> str:
    return f"compact-{_bin_hash(paths)}.parquet"


def _manifest_name(paths: list[str]) -> str:
    return f".compact-{_bin_hash(paths)}.sources"


class _Fs:
    """Thin driver-side seam over the Hadoop FileSystem API — the one
    code path that works on file://, hdfs:// and s3a:// alike (same
    abstraction as ``maintenance._fs``). All operations here touch
    METADATA or single staged files; the data rewrite itself is the
    distributed Spark job in :func:`_rewrite_bin`.
    """

    def __init__(self, spark: SparkSession, root: str):
        from kubernetes_logs_datalake_spark.sources.maintenance import _fs

        self.jvm = spark.sparkContext._jvm
        self.conf = spark.sparkContext._jsc.hadoopConfiguration()
        self.fs, self.hpath, _ = _fs(spark, root)

    def exists(self, p: str) -> bool:
        return self.fs.exists(self.hpath(p))

    def length(self, p: str) -> int:
        return int(self.fs.getFileStatus(self.hpath(p)).getLen())

    def delete(self, p: str) -> None:
        self.fs.delete(self.hpath(p), True)

    def rename(self, src: str, dst: str) -> None:
        if not self.fs.rename(self.hpath(src), self.hpath(dst)):
            raise RuntimeError(f"rename failed: {src} -> {dst}")

    def copy(self, src: str, dst: str) -> None:
        # server-side/stream copy; on an object store this is the PUT
        self.jvm.org.apache.hadoop.fs.FileUtil.copy(
            self.fs, self.hpath(src), self.fs, self.hpath(dst),
            False, True, self.conf,
        )

    def glob(self, pattern: str) -> list[str]:
        statuses = self.fs.globStatus(self.hpath(pattern))
        if statuses is None:
            return []
        return sorted(str(s.getPath().toString()) for s in statuses)

    def read_small(self, p: str) -> bytes:
        stream = self.fs.open(self.hpath(p))
        try:
            return bytes(
                self.jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def write_small_atomic(self, p: str, data: bytes) -> None:
        """Stage to a local temp file, upload under a ``.tmp`` name
        (doesn't match the manifest glob, so a crashed upload is
        invisible), then rename into place."""
        tmp_remote = p + ".tmp"
        fd, local = tempfile.mkstemp(prefix="kld-manifest-")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(data)
            self.fs.copyFromLocalFile(
                True, True, self.hpath("file:" + local), self.hpath(tmp_remote)
            )
        finally:
            if os.path.exists(local):
                os.remove(local)
        if self.exists(p):
            self.delete(p)
        self.rename(tmp_remote, p)


# Spark's binaryFile source materializes the whole file into one JVM
# byte[], so it hard-fails at Int.MaxValue content; stay a safe margin
# under (JVM array headroom) and stream anything bigger.
_BINARYFILE_MAX = 2**31 - 2**20


def _sha256_of(
    spark: SparkSession, path: str, binaryfile_max: int = _BINARYFILE_MAX
) -> str:
    """Single-file sha256. Files under Spark's ~2 GiB binary-content
    limit go through the ``export_manifest`` recipe (binaryFile scan +
    ``sha2`` in codegen): hashed where they live, only the 64-char
    digest reaches the driver. Files AT or past the limit cannot use
    binaryFile (it materializes one JVM byte[], capped at
    Int.MaxValue, so the scan hard-fails — and a crashed verify leg
    used to wedge every replay of a >=2 GiB bin, r10 ADVICE): they
    stream through the driver JVM's Hadoop input stream into a
    ``MessageDigest`` in 8 MiB chunks. The bytes stay JVM-side (py4j
    carries only the buffer handle and the final digest), so the
    fallback runs at I/O speed; it is a one-node read, which is the
    honest floor for a serial hash of one oversized object — correct
    beats wedged. ``binaryfile_max`` is parameterized so tests exercise
    the streaming path on small files."""
    fsx = _Fs(spark, path)
    if fsx.length(path) < binaryfile_max:
        rows = (
            spark.read.format("binaryFile")
            .load(path)
            .select(F.sha2(F.col("content"), 256).alias("h"))
            .collect()
        )
        if len(rows) != 1:
            raise RuntimeError(
                f"sha256: expected exactly 1 file at {path}, got {len(rows)}"
            )
        return rows[0]["h"]
    jvm = fsx.jvm
    md = jvm.java.security.MessageDigest.getInstance("SHA-256")
    # the copy loop runs entirely JVM-side (DigestInputStream wraps the
    # Hadoop stream; transferTo drains it into a null sink) — py4j
    # byte[] arguments are pass-by-value, so a Python-driven
    # read-buffer loop would hash a stale copy (and ship every byte
    # through the gateway besides)
    stream = jvm.java.security.DigestInputStream(
        fsx.fs.open(fsx.hpath(path)), md
    )
    try:
        stream.transferTo(jvm.java.io.OutputStream.nullOutputStream())
    finally:
        stream.close()
    digest = md.digest()
    # hex via BigInteger (always on the classpath) — zero-padded to 64
    hx = jvm.java.math.BigInteger(1, digest).toString(16)
    return hx.rjust(64, "0")


def _write_manifest(
    fsx: _Fs, dir_: str, paths: list[str], expected_len: int,
    expected_sha: str,
) -> str:
    mpath = os.path.join(dir_, _manifest_name(paths))
    body = (
        f"{expected_len} {expected_sha}\n" + "\n".join(sorted(paths)) + "\n"
    )
    fsx.write_small_atomic(mpath, body.encode())
    return mpath


def _read_manifest(fsx: _Fs, mpath: str) -> tuple[int, str | None, list[str]]:
    """(expected_len, expected_sha | None, paths). The sha field landed
    in r10; a pre-r10 manifest (bare length) still replays, with the
    weaker length-only target check it was written under."""
    lines = fsx.read_small(mpath).decode().splitlines()
    head = lines[0].split()
    sha = head[1] if len(head) > 1 else None
    return int(head[0]), sha, [ln for ln in lines[1:] if ln]


def _stage_part(
    spark: SparkSession, fsx: _Fs, dir_: str, paths: list[str]
) -> tuple[str, str]:
    """One distributed read of exactly this bin's files, one output
    file, into a hidden ``_compact-stage-…`` dir. The shuffle-free
    coalesce(1) narrows the write, it does NOT re-sort — row order is
    concatenation in path order. Returns (stage_dir, part_path)."""
    stage_dir = os.path.join(dir_, f"_compact-stage-{_bin_hash(paths)}")
    fsx.delete(stage_dir)
    (
        spark.read.parquet(*sorted(paths))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_local(stage_dir))
    )
    parts = fsx.glob(os.path.join(stage_dir, "part-*.parquet"))
    if len(parts) != 1:
        raise RuntimeError(f"expected 1 staged part in {stage_dir}, got {parts}")
    return stage_dir, parts[0]


def _publish(
    spark: SparkSession,
    fsx: _Fs,
    part: str,
    target: str,
    expected_len: int,
    expected_sha: str,
    publish_mode: str,
) -> None:
    if publish_mode == "rename":
        fsx.rename(part, target)
    elif publish_mode == "copy":
        fsx.copy(part, target)
        got = fsx.length(target)
        if got != expected_len:
            raise RuntimeError(
                f"torn publish of {target}: {got} bytes != {expected_len}"
            )
        # content verify (r9 ADVICE-high follow-up): a torn PUT with a
        # coincidentally-correct length passed the length check; the
        # sha256 re-read closes it. One distributed read of the target
        # per publish — the price of not trusting the store's PUT.
        got_sha = _sha256_of(spark, target)
        if got_sha != expected_sha:
            raise RuntimeError(
                f"torn publish of {target}: sha256 {got_sha} != "
                f"{expected_sha} (length matched — content did not)"
            )
    else:
        raise ValueError(f"unknown publish_mode {publish_mode!r}")


def _finish_claim(
    fsx: _Fs, paths: list[str], existing: list[str], mpath: str
) -> None:
    """The post-publish half of every bin: delete claimed sources, then
    retire the manifest. Crash anywhere inside → the manifest survives,
    the claim replays, planning never sees the survivors."""
    for p in existing:
        fsx.delete(p)
    fsx.delete(mpath)


def _rewrite_bin(
    spark: SparkSession,
    fsx: _Fs,
    dir_: str,
    paths: list[str],
    publish_mode: str,
) -> str:
    """Execute one planned bin's state machine; returns the action."""
    target = os.path.join(dir_, _target_name(paths))
    existing = [p for p in paths if fsx.exists(p)]
    if fsx.exists(target):
        action = "replayed_delete" if existing else "already_done"
        # claim before the first source delete even on this path, where
        # a pre-manifest-era target exists but sources linger
        mpath = _write_manifest(
            fsx, dir_, paths, fsx.length(target), _sha256_of(spark, target)
        )
    else:
        if len(existing) < len(paths):
            # target missing AND some sources gone: a concurrent writer
            # broke the plan's snapshot — refuse rather than guess
            raise RuntimeError(
                f"bin in {dir_} lost {len(paths) - len(existing)} source "
                f"files without a published target; re-plan before rerun"
            )
        stage_dir, part = _stage_part(spark, fsx, dir_, paths)
        expected_len = fsx.length(part)
        expected_sha = _sha256_of(spark, part)
        mpath = _write_manifest(fsx, dir_, paths, expected_len, expected_sha)
        _publish(
            spark, fsx, part, target, expected_len, expected_sha,
            publish_mode,
        )
        fsx.delete(stage_dir)
        action = "rewritten"
    _finish_claim(fsx, paths, existing, mpath)
    return action


def _replay_claim(
    spark: SparkSession,
    fsx: _Fs,
    dir_: str,
    mpath: str,
    publish_mode: str,
) -> tuple[str, str, int, int]:
    """Finish an interrupted claimed bin found via its manifest.
    Returns (target, action, n_sources, bytes_remaining)."""
    expected_len, expected_sha, paths = _read_manifest(fsx, mpath)
    target = os.path.join(dir_, _target_name(paths))
    existing = [p for p in paths if fsx.exists(p)]
    bytes_left = sum(fsx.length(p) for p in existing)
    stage_dir = os.path.join(dir_, f"_compact-stage-{_bin_hash(paths)}")
    # content verify on replay: a torn target with a coincidentally
    # correct length (same-length corruption) must NOT count as ok
    target_ok = (
        fsx.exists(target)
        and fsx.length(target) == expected_len
        and (expected_sha is None or _sha256_of(spark, target) == expected_sha)
    )
    if target_ok:
        action = "replayed_delete" if existing else "already_done"
        # a crash between _publish and the stage delete leaves the
        # stage dir behind this path forever once the manifest retires
        # (r10 ADVICE): in copy mode it holds a full hidden duplicate
        # of the bin's bytes — clean it here too
        fsx.delete(stage_dir)
    else:
        if fsx.exists(target):  # torn copy-mode publish
            fsx.delete(target)
        parts = fsx.glob(os.path.join(stage_dir, "part-*.parquet"))
        if (
            parts
            and fsx.length(parts[0]) == expected_len
            and (
                expected_sha is None
                or _sha256_of(spark, parts[0]) == expected_sha
            )
        ):
            part = parts[0]  # publish crashed; the stage is intact
        else:
            if len(existing) < len(paths):
                raise RuntimeError(
                    f"claimed bin {mpath} has no valid target, a missing "
                    f"stage, and {len(paths) - len(existing)} missing "
                    f"sources; the lake was modified outside the compactor"
                )
            stage_dir, part = _stage_part(spark, fsx, dir_, paths)
            # a re-staged parquet can differ in byte length (writer
            # metadata); re-pin the claim to the bytes we will publish
            expected_len = fsx.length(part)
            expected_sha = _sha256_of(spark, part)
            _write_manifest(fsx, dir_, paths, expected_len, expected_sha)
        if expected_sha is None:
            # pre-r10 manifest replayed with an intact stage: pin the
            # content before publish so the verify leg still runs
            expected_sha = _sha256_of(spark, part)
        _publish(
            spark, fsx, part, target, expected_len, expected_sha,
            publish_mode,
        )
        fsx.delete(stage_dir)
        action = "replayed_publish"
    _finish_claim(fsx, paths, existing, mpath)
    return target, action, len(paths), bytes_left


def compact_files(
    spark: SparkSession,
    pattern: str,
    target_bytes: int,
    max_parallel_bins: int = 4,
    publish_mode: str = "rename",
) -> DataFrame:
    """Execute the compaction plan for ``pattern``: every multi-file
    bin is rewritten to one deterministically-named file and its
    sources removed; single-file bins are untouched. Idempotent — a
    crashed run re-converges on re-run (see module docstring) — and
    query-preserving: the compacted lake returns byte-identical results
    (order-insensitive; compaction concatenates, never drops/edits).

    Replays any interrupted claims (sidecar manifests) FIRST, excludes
    their sources from planning, then executes fresh bins.

    Returns the execution report: (dir, bin, n_source_files, bytes_in,
    target, action), action ∈ {rewritten, replayed_publish,
    replayed_delete, already_done, skip_single}; replayed claims carry
    bin = -1 (their membership comes from the manifest, not the plan).
    """
    # the manifest glob derives from the pattern's directory part; a
    # separator-less pattern would yield a nonsense glob, phase 0 would
    # silently find no claims, and the replay-duplication protection
    # would be quietly bypassed (r10 ADVICE) — refuse instead
    if "/" not in pattern:
        raise ValueError(
            f"pattern {pattern!r} has no directory component; pass "
            "'<dir>/<file-glob>' so claim manifests can be discovered"
        )
    fsx = _Fs(spark, pattern)
    report = []

    # phase 0: finish interrupted claims before planning
    dir_pattern = pattern.rsplit("/", 1)[0]
    claimed: set[str] = set()
    for mpath in fsx.glob(os.path.join(dir_pattern, ".compact-*.sources")):
        mdir = mpath.rsplit("/", 1)[0]
        _, _, cpaths = _read_manifest(fsx, mpath)
        claimed.update(cpaths)
        target, action, n_src, bytes_left = _replay_claim(
            spark, fsx, mdir, mpath, publish_mode
        )
        report.append((mdir, -1, n_src, bytes_left, target, action))

    # phase 1: plan over unclaimed files, execute fresh bins
    rows = compaction_bins(spark, pattern, target_bytes, claimed=claimed).collect()
    bins: dict[tuple[str, int], list] = {}
    for r in rows:
        bins.setdefault((r.dir, r.bin), []).append(r)

    def run_bin(key):
        dir_, b = key
        members = sorted(bins[key], key=lambda r: r.path)
        paths = [m.path for m in members]
        total = sum(m.length for m in members)
        if len(paths) == 1:
            action, target = "skip_single", None
        else:
            action = _rewrite_bin(spark, fsx, dir_, paths, publish_mode)
            target = os.path.join(dir_, _target_name(paths))
        return (dir_, b, len(paths), total, target, action)

    with ThreadPoolExecutor(max_workers=max_parallel_bins) as pool:
        report += list(pool.map(run_bin, sorted(bins)))

    return spark.createDataFrame(
        report,
        "dir string, bin long, n_source_files int, bytes_in long, "
        "target string, action string",
    ).orderBy("dir", "bin")
