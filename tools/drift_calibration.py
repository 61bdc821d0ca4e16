#!/usr/bin/env python
"""Calibrate the ivf_sq8_index_drift rebuild threshold on the ORGANIC
scale corpora (r13 verdict task #5 — the shipped >3 shifted-cloud
number was fixture-scale only).

Method, per corpus (/tmp/spark_graft_scale_x{c}, tools/scale_check.py
builds them):

1. Build an IVF,SQ8 index from an 80 % history split (hash split —
   deterministic).
2. IN-DISTRIBUTION BAND: 8 disjoint holdout slices → drift_ratio each.
   The band (min..max) is the monitor's natural variation; a useful
   threshold must sit clearly above it.
3. SHIFT CURVE: the holdout cloud translated by s·σ (per-dim corpus
   std, s ∈ SHIFTS) → drift_ratio (exact AND approx_percentile — the
   at-scale variant this round adds) per s.
4. QUALITY TIE-IN: for each shift, append the shifted batch under the
   FROZEN codebook vs REBUILD on the union, then serve an 8-query
   panel drawn from the batch and score recall@10 against a numpy
   exact ground truth over the union. The recall GAP
   (rebuilt − frozen) as a function of drift_ratio is the calibration:
   the rebuild threshold is where the gap becomes material, not a
   hand-picked constant.

Prints one JSON line per corpus; numbers land in SCALE.md r14.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kubernetes_logs_datalake_spark import get_spark  # noqa: E402

DIM = entrymod.EMBEDDING_DIM
SHIFTS = [0.25, 0.5, 1.0, 2.0, 4.0]
PANEL = 8
QUALITY_SHIFTS = {0.5, 1.0, 2.0, 4.0}
K = 10
PROBE = 4


def _exact_topk_ids(union_mat, union_ids, qvec, k):
    import numpy as np

    norms = np.linalg.norm(union_mat, axis=1)
    qn = float(np.linalg.norm(qvec))
    cos = (union_mat @ qvec) / (norms * qn)
    order = np.lexsort((union_ids, -cos))
    return [int(union_ids[i]) for i in order[:k]]


def _serve_ids(spark, idx, qvec, k):
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search,
    )

    rows = ivf_sq8_index_search(
        spark, idx, [float(v) for v in qvec], topk=k, n_probe=PROBE
    ).collect()
    return [int(r[0]) for r in rows]


def _recall(spark, idx, queries, union_mat, union_ids) -> float:
    hits = tot = 0
    for q in queries:
        exact = set(_exact_topk_ids(union_mat, union_ids, q, K))
        got = set(_serve_ids(spark, idx, q, K))
        hits += len(exact & got)
        tot += K
    return round(hits / tot, 4)


def calibrate(spark, src: str, with_quality: bool) -> dict:
    import numpy as np
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, ivf_sq8_index_drift, kmeans_fit,
    )

    emb = (
        spark.read.parquet(f"{src}/embeddings.parquet")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
    )
    hist = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(5)) != 0)
    hold = emb.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(5)) == 0
    ).localCheckpoint()
    n_hist = hist.count()
    cells, fit_mod = entrymod._sqrt_cells(n_hist)
    centers, _ = kmeans_fit(
        hist, "vec_id", "embedding", k=cells, iters=3,
        fit_sample_mod=fit_mod,
    )
    work = tempfile.mkdtemp(prefix="drift-cal-")
    idx = os.path.join(work, "idx")
    ivf_sq8_index_build(
        hist, "vec_id", "embedding", idx, dim=DIM, centers=centers
    )

    out: dict = {"corpus": src, "n_hist": n_hist,
                 "n_hold": hold.count(), "cells": cells}

    # 2. in-distribution band over 8 disjoint holdout slices
    band = []
    for i in range(8):
        sl = hold.filter(F.pmod(F.xxhash64("vec_id"), F.lit(64)) == i * 8)
        if sl.limit(1).count() == 0:
            continue
        band.append(ivf_sq8_index_drift(sl, idx)["drift_ratio"])
    out["in_dist_band"] = {
        "min": min(band), "max": max(band),
        "mean": round(sum(band) / len(band), 4), "n": len(band),
    }

    # 3 + 4. shift curve (exact + approx) with the quality tie-in
    hold_rows = hold.collect()
    hold_ids = np.asarray([int(r[0]) for r in hold_rows])
    hold_mat = np.asarray(
        [np.asarray(r[1], dtype=np.float64) for r in hold_rows]
    )
    hist_rows = hist.collect()
    hist_ids = np.asarray([int(r[0]) for r in hist_rows])
    hist_mat = np.asarray(
        [np.asarray(r[1], dtype=np.float64) for r in hist_rows]
    )
    sigma = hist_mat.std(axis=0)
    rng = np.random.default_rng(5)
    direction = rng.normal(0.0, 1.0, DIM)
    direction /= np.linalg.norm(direction)

    curve = []
    for s in SHIFTS:
        shift_vec = s * sigma * direction
        # store as float32 (the index cells' layout — an appended
        # double column would tear the parquet schema) and score the
        # ground truth on the same widened-float32 values the index
        # actually serves
        shifted = (hold_mat + shift_vec[None, :]).astype(
            np.float32
        ).astype(np.float64)
        sids = hold_ids + 10_000_000
        batch = spark.createDataFrame(
            [(int(i), [float(v) for v in row])
             for i, row in zip(sids, shifted)],
            "vec_id: long, embedding: array<float>",
        ).localCheckpoint()
        point = {
            "shift_sigma": s,
            "drift_exact": ivf_sq8_index_drift(batch, idx)["drift_ratio"],
            "drift_approx": ivf_sq8_index_drift(
                batch, idx, approx=True
            )["drift_ratio"],
        }
        if with_quality and s in QUALITY_SHIFTS:
            point.update(_frozen_vs_rebuilt(
                spark, work, f"shift_{s}", hist, batch, centers, cells,
                fit_mod,
                np.vstack([hist_mat, shifted]),
                np.concatenate([hist_ids, sids]),
                shifted[::max(1, len(shifted) // PANEL)][:PANEL],
            ))
        curve.append(point)
    out["curve"] = curve

    # 5. EMERGENT-COMPONENT drift — the mode where a rebuild actually
    # pays: a tight NEW cluster crammed into a few old cells inflates
    # those cells' SQ8 bounds (the r12 effective-bits collapse), so
    # the frozen index scores the new neighborhood on a coarsened
    # grid while a rebuild gives it dedicated cells + tight bounds.
    # A pure translation (above) never shows this — its members stay
    # as spread as the corpus — which is exactly why the calibration
    # needs both modes.
    if with_quality:
        rng2 = np.random.default_rng(9)
        center = hist_mat.mean(axis=0) + 2.0 * sigma * direction
        tight = 0.25 * float(sigma.mean())
        newc = (
            center[None, :] + rng2.normal(0.0, tight, (2000, DIM))
        ).astype(np.float32).astype(np.float64)
        nids = np.arange(20_000_000, 20_000_000 + len(newc))
        nbatch = spark.createDataFrame(
            [(int(i), [float(v) for v in row])
             for i, row in zip(nids, newc)],
            "vec_id: long, embedding: array<float>",
        ).localCheckpoint()
        emergent = {
            "drift_exact": ivf_sq8_index_drift(nbatch, idx)["drift_ratio"],
            "drift_approx": ivf_sq8_index_drift(
                nbatch, idx, approx=True
            )["drift_ratio"],
        }
        emergent.update(_frozen_vs_rebuilt(
            spark, work, "emergent", hist, nbatch, centers, cells,
            fit_mod,
            np.vstack([hist_mat, newc]),
            np.concatenate([hist_ids, nids]),
            newc[::max(1, len(newc) // PANEL)][:PANEL],
        ))
        out["emergent"] = emergent
    shutil.rmtree(work, ignore_errors=True)
    return out


def _frozen_vs_rebuilt(
    spark, work, tag, hist, batch, centers, cells, fit_mod,
    union_mat, union_ids, queries,
) -> dict:
    """recall@10 of the frozen-codebook post-append state vs a full
    rebuild, on a panel drawn from the batch. 'Frozen' is built in one
    pass as the union assigned under the OLD centers — the append path
    reaches the identical cells+bounds, just incrementally."""
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_build, kmeans_fit,
    )

    union_df = hist.unionByName(batch).localCheckpoint()
    frozen = os.path.join(work, f"frozen_{tag}")
    ivf_sq8_index_build(
        union_df, "vec_id", "embedding", frozen, dim=DIM, centers=centers
    )
    rf = _recall(spark, frozen, queries, union_mat, union_ids)
    rebuilt = os.path.join(work, f"rebuilt_{tag}")
    c2, _ = kmeans_fit(
        union_df, "vec_id", "embedding", k=cells, iters=3,
        fit_sample_mod=fit_mod,
    )
    ivf_sq8_index_build(
        union_df, "vec_id", "embedding", rebuilt, dim=DIM, centers=c2
    )
    rr = _recall(spark, rebuilt, queries, union_mat, union_ids)
    return {
        "recall_frozen": rf,
        "recall_rebuilt": rr,
        "recall_gap": round(rr - rf, 4),
    }


def main() -> None:
    copies = [int(c) for c in sys.argv[1:]] or [10, 20]
    spark = get_spark("drift-calibration")
    for c in copies:
        src = f"/tmp/spark_graft_scale_x{c}"
        if not os.path.exists(f"{src}/_COMPLETE"):
            print(json.dumps({"corpus": src, "error": "not built"}))
            continue
        # quality tie-in on x10 (the full append/rebuild/serve loop per
        # shift); x20 contributes the ratio curve only
        print(json.dumps(calibrate(spark, src, with_quality=(c == 10))))


if __name__ == "__main__":
    main()
