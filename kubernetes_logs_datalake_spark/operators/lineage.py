"""Lineage truncation for iterative operators: local vs reliable.

Every iterative operator in this package (PageRank, label propagation,
HITS, k-core, connected components, the BPE merge loop, the SQ8 serving
cache) must truncate its per-round lineage or the plan grows without
bound. Two mechanisms exist, with opposite trade-offs:

- ``DataFrame.localCheckpoint()`` stores the blocks on the executors
  that computed them, WITHOUT replication. Cheap (no FS round-trip) and
  exactly right on ``local[*]`` or a static dedicated cluster — but on
  a 1000-executor cluster with dynamic allocation or spot/preemptible
  nodes, losing ANY executor that holds a block makes the truncated
  lineage unrecoverable and fails the whole iterative job
  mid-iteration. (Spark cannot recompute through a localCheckpoint:
  truncation is the point.)
- ``DataFrame.checkpoint()`` writes the blocks to the reliable
  checkpoint FS (HDFS/S3/the lake filesystem) and re-reads them. One
  extra write+read per truncation, but any executor can re-fetch lost
  partitions, so the job survives node loss — the required posture at
  the 100 TB design point.

:func:`truncate_lineage` is the single switch: ``checkpoint_dir=None``
(the default everywhere) keeps the sandbox/bench-fast localCheckpoint
path bit-identical to previous rounds; passing a directory routes the
truncation through the reliable checkpointer. Iterative operators
expose it as a ``checkpoint_dir=None, checkpoint_every=1`` pair —
``checkpoint_every=N`` takes the reliable path only every Nth round
(localCheckpoint between), bounding the FS overhead to 1/N of rounds
while capping recompute-after-loss at N-1 rounds of lineage.

Measured overhead at x10 scale is recorded in SCALE.md (expect ~one
parquet-sized write+read of the |state| frame per reliable round — the
price of surviving executor loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: applicationId -> base checkpoint dir CURRENTLY installed on that
#: SparkContext. ``setCheckpointDir`` is GLOBAL per-context state, so
#: the memo must track the latest installed dir, not a set of
#: ever-installed dirs: with a was-ever-installed set, interleaving two
#: dirs (a durable HDFS dir for a graph job, the local-disk
#: SPARK_GRAFT_CHECKPOINT_DIR for the SQ8 cache) would skip the
#: re-install and silently route the durable job's blocks to the
#: non-durable dir — defeating exactly the executor-loss protection the
#: caller asked for. Re-installing only on CHANGE still avoids the
#: one-UUID-subdir-per-set litter for the common single-dir case.
_INSTALLED: dict[str, str] = {}


def _ensure_checkpoint_dir(df: DataFrame, checkpoint_dir: str) -> None:
    spark = df.sparkSession
    app = spark.sparkContext.applicationId
    if _INSTALLED.get(app) == checkpoint_dir:
        return
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    _INSTALLED[app] = checkpoint_dir


def truncate_lineage(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    eager: bool = False,
) -> DataFrame:
    """Truncate ``df``'s lineage at an iteration boundary.

    With ``checkpoint_dir=None`` (default): ``localCheckpoint`` —
    executor-local blocks, zero FS traffic, NOT survivable under
    executor loss. With a directory: reliable ``checkpoint()`` to that
    FS — survivable, one write+read per call. See module docstring.

    RETENTION: Spark does not delete reliable checkpoint files by
    itself (``spark.cleaner.referenceTracking.cleanCheckpoints`` is off
    by default, and even on it is GC-driven best-effort), so an
    iterative run retains rounds/N copies of the |state| frame under
    ``checkpoint_dir`` until the APPLICATION cleans up. Deployments
    should point the dir at a path with an FS lifecycle rule (or TTL)
    and/or enable ``cleanCheckpoints``; budget rounds/N · |state| of
    transient checkpoint storage per job. This is the storage half of
    the overhead SCALE.md prices (the time half is the write+read per
    reliable round).
    """
    if not checkpoint_dir:
        return df.localCheckpoint(eager=eager)
    _ensure_checkpoint_dir(df, checkpoint_dir)
    return df.checkpoint(eager=eager)


def reliable_this_round(
    checkpoint_dir: str | None, round_idx: int, checkpoint_every: int
) -> str | None:
    """The ``checkpoint_dir`` to pass for round ``round_idx`` (0-based)
    under an every-N policy: the reliable dir on rounds N-1, 2N-1, ...,
    ``None`` (→ localCheckpoint) in between. With ``checkpoint_dir``
    unset, always ``None`` — the zero-overhead default path.

    ``checkpoint_every < 1`` WITH a dir set raises: silently taking
    the local path would mean the caller configured executor-loss
    survivability and didn't get it — discovered only when a spot-node
    loss kills the job the knob was set to protect (r12 review).
    """
    if not checkpoint_dir:
        return None
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1 when checkpoint_dir is set, "
            f"got {checkpoint_every}"
        )
    return checkpoint_dir if (round_idx + 1) % checkpoint_every == 0 else None
