"""Streaming ingestion into a stored IVF,SQ8 index — the lake-scale
ANN loop: a vector stream (new documents' embeddings) lands in the
cell-partitioned index via frozen-codebook appends, one
``foreachBatch`` epoch at a time.

Composition, not new machinery: each epoch calls
:func:`operators.vectors.ivf_sq8_index_append` (assign against the
manifest's codebook → append touched cell partitions → refresh touched
bounds → atomic manifest rename), so every property the batch append
pins carries over — serve-time encode means no stored-code
invalidation, and the torn protocol means a crash mid-epoch leaves a
refusing index, never a wrong one. Spark's ``foreachBatch`` gives
at-least-once epochs against the stream checkpoint; an epoch REPLAY
after a crash between the cells append and the manifest rename would
re-append the batch, so the job defaults to the append's
``skip_existing_ids`` guard (anti-join the epoch against the ids
already stored in its own cells — column- and partition-pruned), which
makes replays idempotent PER ID. That guard assumes ids are unique in
the source; a stream that re-keys rows still needs downstream dedup
(``dedup_exact`` on vec_id) — stated out loud rather than pretending
unconditional exactly-once.

Serving during ingestion: the manifest is ABSENT inside an epoch (the
invalidate→write→rename order), so a serving replica that re-resolves
the manifest per query refuses briefly instead of reading torn state.
Deployments that cannot tolerate the refusal window serve from a
published snapshot copy and flip a pointer — the
``sources/compact.py`` rename-publish idiom; at 100 TB the epoch's
append touches only the batch's cells either way.

Reference scope note: the reference engine has no vector surface; this
extends the LLM-data-pipeline side of the build brief (streaming +
ANN index lifecycle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class AnnIngestJob:
    """Continuous frozen-codebook ingestion into a stored IVF,SQ8
    index. ``source_fn(spark) -> streaming DataFrame`` must yield the
    index's (id_col, vec_col) schema; the index must already exist
    (:func:`ivf_sq8_index_build`) — the codebook is a BUILD artifact,
    never refit mid-stream (drift is watched by
    :func:`ivf_sq8_index_drift` and answered with a rebuild).

    At-least-once per epoch (foreachBatch + checkpoint); the default
    ``skip_existing_ids`` guard makes replays idempotent per id, see
    module docstring. ``assign_arrow`` flips the batch assignment to
    the Arrow path when the scan dominates the epoch."""

    index_dir: str
    checkpoint: str
    trigger_seconds: int = 30
    assign_arrow: bool = False
    #: anti-join each epoch against the ids already stored in its own
    #: cells (column- and partition-pruned), making at-least-once
    #: epoch REPLAYS idempotent per id — on by default here because
    #: foreachBatch is exactly the caller that replays
    skip_existing_ids: bool = True
    #: reliable-checkpoint dir for the append's lineage pins (distinct
    #: from ``checkpoint``, the STREAM's progress checkpoint): set it
    #: on clusters with preemptible executors so an executor loss
    #: mid-epoch recomputes instead of failing the epoch and leaving
    #: the index torn until the replay repairs it (ADVICE r13)
    reliable_checkpoint_dir: str | None = None
    #: per-epoch calibrated drift verdict (r14 verdict task #4): when
    #: True, each epoch runs :func:`operators.vectors.index_advisor`
    #: (the approx_percentile monitor — mergeable sketches, the
    #: every-epoch shape) against the PRE-append index state and
    #: records the advice in :attr:`advice` / forwards it to
    #: :attr:`on_advice`. Pre-append is load-bearing: after the append
    #: the batch's own rows sit in the touched cells and mask the
    #: emergent-mode signal entirely (base == batch → ratio 1.0).
    monitor_drift: bool = False
    drift_threshold: float = 1.3
    #: optional callback ``(epoch_id: int, advice: dict) -> None`` —
    #: the alerting seam (page on "emergent", ticket on
    #: "investigate"); exceptions in it are swallowed so a broken
    #: alert hook cannot fail the ingest epoch
    on_advice: object = None
    #: the advice log, newest last: ``[(epoch_id, advice_dict), ...]``
    advice: list = field(default_factory=list)
    #: zero-refusal serving (r15): when ``serve_root`` is set, every
    #: ``publish_every``-th NON-EMPTY epoch ends by publishing a
    #: snapshot + pointer flip (:func:`vectors.ivf_sq8_index_publish`)
    #: — serving replicas resolve ``serve_root`` and never see the
    #: live index's mid-epoch refusal window
    serve_root: str | None = None
    publish_every: int = 1
    _query: object = field(default=None, repr=False)
    _epochs_since_publish: int = field(default=0, repr=False)

    def start(self, spark: SparkSession, source: DataFrame):
        from kubernetes_logs_datalake_spark.operators.vectors import (
            index_advisor, ivf_sq8_index_append, ivf_sq8_index_publish,
            ivf_sq8_index_repair,
        )

        index_dir = self.index_dir
        assign_arrow = self.assign_arrow
        skip_existing = self.skip_existing_ids
        reliable_dir = self.reliable_checkpoint_dir
        monitor = self.monitor_drift
        threshold = self.drift_threshold
        on_advice = self.on_advice
        advice_log = self.advice

        def append_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if monitor and batch_df.limit(1).count() > 0:
                # the advisor reads the manifest, so a torn index
                # (crash inside a previous epoch's manifest window)
                # must self-heal FIRST — same repair the append would
                # run; doing it here keeps the advice pre-append
                ivf_sq8_index_repair(batch_df.sparkSession, index_dir)
                verdict = index_advisor(
                    batch_df, index_dir, threshold=threshold
                )
                advice_log.append((int(epoch_id), verdict))
                if on_advice is not None:
                    try:
                        on_advice(int(epoch_id), verdict)
                    except Exception:  # noqa: BLE001 — alerting seam
                        pass
            # a torn index self-heals inside the append via
            # ivf_sq8_index_repair — the replayed epoch then completes
            # against the restored manifest instead of raising forever
            n = ivf_sq8_index_append(
                batch_df, index_dir, assign_arrow=assign_arrow,
                skip_existing_ids=skip_existing,
                checkpoint_dir=reliable_dir,
            )
            if self.serve_root is not None and n > 0:
                # publish AFTER the append's manifest commit, so the
                # snapshot is always a complete post-epoch state; a
                # crash between commit and publish just means serving
                # replicas stay one epoch behind until the next flip
                self._epochs_since_publish += 1
                if self._epochs_since_publish >= max(
                    1, int(self.publish_every)
                ):
                    ivf_sq8_index_publish(
                        batch_df.sparkSession, index_dir,
                        self.serve_root,
                    )
                    self._epochs_since_publish = 0

        self._query = (
            source.writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(processingTime=f"{self.trigger_seconds} seconds")
            .start()
        )
        return self._query

    def process_available(self) -> None:
        self._query.processAllAvailable()

    def stop_gracefully(self) -> None:
        """Finish the in-flight epoch, then stop — an interrupt
        mid-epoch is survivable (torn protocol) but costs a rebuild
        of nothing and a refused serve until the epoch replays."""
        if self._query is not None:
            self._query.processAllAvailable()
            self._query.stop()
            self._query.awaitTermination(30)
