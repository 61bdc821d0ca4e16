"""r14 verdict task #4: the calibrated drift rule wired into the
streaming lifecycle as CODE — `operators.vectors.index_advisor` maps
the monitor's ratio onto the SCALE.md r14 two-mode analysis, and
`AnnIngestJob(monitor_drift=True)` emits the verdict per epoch.

The three regimes exercised here mirror the calibration harness
(`tools/drift_calibration.py`): an in-distribution batch (band
≈1.0±0.03 on the organic corpora), a TRANSLATION batch (finite ratio
past the 1.3 trigger — serves fine frozen), and an EMERGENT tight
component landing in a degenerate cell (ratio = ∞ — funnel territory,
not an automatic rebuild).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


DIM = 8
FAR = [50.0] * DIM


def _blob_rows(rng, n, center, std, id_start):
    pts = rng.normal(0.0, std, (n, DIM)) + np.asarray(center)
    return [
        (id_start + i, [float(v) for v in p]) for i, p in enumerate(pts)
    ]


@pytest.fixture()
def advisor_index(spark, tmp_path):
    """A stored IVF,SQ8 index over three populated blobs plus ONE
    singleton cell whose only member IS its centroid (base p95 = 0 —
    the degenerate geometry the emergent mode needs, exactly how the
    calibration corpus produced ∞)."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build,
    )

    rng = np.random.default_rng(42)
    blob_centers = [[0.0] * DIM, [6.0] + [0.0] * (DIM - 1),
                    [0.0, 6.0] + [0.0] * (DIM - 2)]
    rows = []
    for bi, c in enumerate(blob_centers):
        rows += _blob_rows(rng, 60, c, 1.0, 1000 * (bi + 1))
    rows.append((9999, FAR))  # the singleton, exactly at its centroid
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    idx = str(tmp_path / "advisor_idx")
    ivf_sq8_index_build(
        corpus, "vec_id", "embedding", idx, dim=DIM,
        centers=blob_centers + [FAR],
    )
    return idx, blob_centers, rng


def test_index_advisor_three_regimes(spark, advisor_index):
    """Direct advisor pins: the verdict/mode/recommendation mapping
    for all three calibrated regimes, on the approx (every-epoch)
    monitor path."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        index_advisor,
    )

    idx, blob_centers, rng = advisor_index

    in_dist = spark.createDataFrame(
        _blob_rows(rng, 40, blob_centers[0], 1.0, 50_000),
        "vec_id long, embedding array<double>",
    )
    a = index_advisor(in_dist, idx)
    assert a["verdict"] == "in_band" and a["mode"] == "in-distribution"
    assert a["drift_ratio"] <= a["threshold"] == 1.3
    assert "frozen-codebook serving ok" in a["recommendation"]

    shifted = spark.createDataFrame(
        _blob_rows(
            rng, 40, [c + 8.0 for c in blob_centers[0]], 1.0, 60_000
        ),
        "vec_id long, embedding array<double>",
    )
    b = index_advisor(shifted, idx)
    assert b["verdict"] == "investigate" and b["mode"] == "translation"
    assert 1.3 < b["drift_ratio"] < float("inf")
    assert "rebuild at convenience" in b["recommendation"]

    emergent = spark.createDataFrame(
        _blob_rows(rng, 20, [f + 0.1 for f in FAR], 0.05, 70_000),
        "vec_id long, embedding array<double>",
    )
    c = index_advisor(emergent, idx)
    assert c["verdict"] == "emergent" and c["mode"] == "emergent-component"
    assert c["drift_ratio"] == float("inf")
    assert "sq8_cell_refine_topk" in c["recommendation"]
    assert c["base_p95"] == 0.0  # the degenerate-cell geometry, pinned


def test_ann_ingest_job_emits_calibrated_advice(
    spark, advisor_index, tmp_path
):
    """The lifecycle wiring: three epochs (in-dist, translation,
    emergent) through AnnIngestJob(monitor_drift=True) — one advice
    entry per epoch, verdicts in order, measured PRE-append (the
    emergent epoch's ∞ would read 1.0 post-append), and the on_advice
    alerting seam invoked with the same dicts; a broken hook must not
    fail the epoch."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_verify,
    )
    from kubernetes_logs_datalake_spark.streaming.ann_ingest import (
        AnnIngestJob,
    )

    idx, blob_centers, rng = advisor_index
    n0 = ivf_sq8_index_verify(spark, idx)["n_rows"]

    batches = [
        _blob_rows(rng, 40, blob_centers[0], 1.0, 50_000),
        _blob_rows(rng, 40, [c + 8.0 for c in blob_centers[0]], 1.0,
                   60_000),
        _blob_rows(rng, 20, [f + 0.1 for f in FAR], 0.05, 70_000),
    ]

    seen = []

    def hook(epoch_id, advice):
        seen.append((epoch_id, advice["verdict"]))
        raise RuntimeError("broken alert hook")  # must be swallowed

    inbox = str(tmp_path / "inbox")
    job = AnnIngestJob(
        index_dir=idx, checkpoint=str(tmp_path / "ckpt"),
        trigger_seconds=1, monitor_drift=True, on_advice=hook,
    )
    # write batch files one epoch at a time so the verdict order is
    # deterministic (and each advisor run sees the prior epochs
    # landed); the first file must exist before the stream is defined
    first = spark.createDataFrame(
        batches[0], "vec_id long, embedding array<double>"
    )
    first.coalesce(1).write.mode("append").parquet(inbox)
    source = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(inbox)
    )
    q = job.start(spark, source)
    try:
        q.processAllAvailable()
        for rows in batches[1:]:
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).coalesce(1).write.mode("append").parquet(inbox)
            q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    verdicts = [a["verdict"] for _e, a in job.advice]
    assert verdicts == ["in_band", "investigate", "emergent"], job.advice
    # the emergent epoch's ∞ proves the advisor ran PRE-append
    assert job.advice[2][1]["drift_ratio"] == float("inf")
    # alerting seam saw the same stream, and its raise didn't kill
    # any epoch: every batch actually landed
    assert seen == [(e, a["verdict"]) for e, a in job.advice]
    n1 = ivf_sq8_index_verify(spark, idx)["n_rows"]
    assert n1 == n0 + sum(len(b) for b in batches)
