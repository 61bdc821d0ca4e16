#!/usr/bin/env python
"""Measure the OPQ,IVF,SQ8 STORED lifecycle end-to-end at sf~1 (r14
verdict task #5): does the rotated composition's ops story hold, not
just its algebra?

Protocol (one session, the tools/ab_isolated.py discipline — warmed
reps, rep 1 discarded): on the organic ×N corpus, build TWO stored
indexes from the base half — A with the corpus-fitted PCA-balanced
rotation frozen into the manifest (the FAISS "OPQ..,IVF..,SQ8"
composition), B unrotated control — then drive the SAME 24
streaming-append epochs into both (rotation frozen with the codebooks:
the append rotates each batch through the stored R), run the
calibrated drift advisor at checkpoints, compact both, and time the
stored serve. Also times a full REBUILD of A at the final corpus, so
append-vs-rebuild is a measured ratio, and closes with an 8-query
recall@10 panel against numpy exact ground truth on the final corpus
(the r13 honesty: rotation does NOT recover SQ8 effective bits — the
panel keeps that claim measured at the composition level).

Output: one JSON line. Numbers land in SCALE.md r15.

Usage: python tools/lifecycle_rotated.py [copies] [n_epochs]
        (default 10 24)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kubernetes_logs_datalake_spark import get_spark  # noqa: E402

DIM = entrymod.EMBEDDING_DIM
REPS = 4  # rep 1 discarded (cold), median of the rest reported
PROBE = 4
K = 10
PANEL = 8


def _timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def _serve_ms(spark, idx, query) -> float:
    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search,
    )

    walls = []
    for _ in range(REPS):
        t0 = time.time()
        ivf_sq8_index_search(
            spark, idx, query, topk=K, n_probe=PROBE
        ).collect()
        walls.append(time.time() - t0)
    return round(statistics.median(walls[1:]) * 1000, 1)


def _recall_panel(spark, idx, corpus_rows, queries) -> float:
    """recall@K of the stored index vs numpy exact cosine over the
    final corpus, averaged over the query panel."""
    import numpy as np

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_search,
    )

    ids = np.array([r[0] for r in corpus_rows])
    X = np.array([r[1] for r in corpus_rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    hits = 0
    for q in queries:
        qn = np.asarray(q) / np.linalg.norm(q)
        truth = set(ids[np.argsort(-(Xn @ qn))[:K]].tolist())
        got = {
            int(r["vec_id"])
            for r in ivf_sq8_index_search(
                spark, idx, list(map(float, q)), topk=K, n_probe=PROBE
            ).collect()
        }
        hits += len(truth & got)
    return round(hits / (K * len(queries)), 4)


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    src = f"/tmp/spark_graft_scale_x{copies}"
    if not os.path.exists(f"{src}/_COMPLETE"):
        print(json.dumps({"corpus": src, "error": "not built"}))
        return

    from kubernetes_logs_datalake_spark.operators.rotation import (
        fit_pca_rotation,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import (
        index_advisor, ivf_sq8_index_append, ivf_sq8_index_build,
        ivf_sq8_index_compact, ivf_sq8_index_verify, kmeans_fit,
        kmeans_assign,
    )
    from kubernetes_logs_datalake_spark.operators.rotation import (
        rotate_vectors,
    )

    spark = get_spark("lifecycle-rotated")
    emb = (
        spark.read.parquet(f"{src}/embeddings.parquet")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
    )
    base = emb.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 0
    ).localCheckpoint()
    stream = emb.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 1
    ).localCheckpoint()
    n_base = base.count()
    cells, fit_mod = entrymod._sqrt_cells(n_base)

    R, fit_wall = _timed(
        lambda: fit_pca_rotation(
            base, "vec_id", "embedding", DIM,
            subspaces=4, sample_mod=fit_mod,
        )
    )

    work = tempfile.mkdtemp(prefix="lc-rot-")
    idx_a, idx_b = os.path.join(work, "rot"), os.path.join(work, "raw")

    def _build(idx, rot):
        kw = {"rotation": rot} if rot is not None else {}
        # PIN the rotated frame before the iterative fit: unpinned,
        # every k-means iteration re-runs the Arrow rotation through
        # lineage (measured 21.2 s vs 12.7 s pinned vs 13.4 s raw at
        # ×10 — pinned, the rotation is FREE at build; SCALE.md r15)
        corpus = (
            rotate_vectors(base, "embedding", rot).localCheckpoint()
            if rot else base
        )
        centers, _ = kmeans_fit(
            corpus, "vec_id", "embedding", k=cells, iters=3,
            fit_sample_mod=fit_mod,
        )
        return ivf_sq8_index_build(
            base, "vec_id", "embedding", idx, dim=DIM,
            centers=centers, **kw,
        )

    _, build_a = _timed(lambda: _build(idx_a, R))
    _, build_b = _timed(lambda: _build(idx_b, None))

    append_wall = {"rot": 0.0, "raw": 0.0}
    advice_log = []
    for ep in range(1, n_epochs + 1):
        sl = stream.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(n_epochs)) == ep - 1
        ).localCheckpoint()
        if ep % 8 == 0:
            # the per-epoch ops cost of WATCHING the index: the
            # calibrated advisor on the incoming slice, pre-append
            adv, adv_wall = _timed(lambda: index_advisor(sl, idx_a))
            advice_log.append({
                "epoch": ep, "verdict": adv["verdict"],
                "drift_ratio": adv["drift_ratio"],
                "advisor_wall_s": adv_wall,
            })
        for name, idx in (("rot", idx_a), ("raw", idx_b)):
            _, w = _timed(
                lambda: ivf_sq8_index_append(
                    sl, idx, skip_existing_ids=True
                )
            )
            append_wall[name] += w
    append_wall = {k: round(v, 2) for k, v in append_wall.items()}

    compact = {}
    for name, idx in (("rot", idx_a), ("raw", idx_b)):
        res, w = _timed(
            lambda: ivf_sq8_index_compact(
                spark, idx, max_files_per_cell=4
            )
        )
        compact[name] = {"wall_s": w, **{
            k: res[k] for k in ("compacted_cells", "files_before",
                                "files_after") if k in res
        }}

    rng = np.random.default_rng(11)
    queries = [rng.normal(0.0, 1.0, DIM) for _ in range(PANEL)]
    serve = {
        "rot_ms": _serve_ms(spark, idx_a, [float(v) for v in queries[0]]),
        "raw_ms": _serve_ms(spark, idx_b, [float(v) for v in queries[0]]),
    }

    # append-vs-rebuild: refit + rebuild the rotated index over the
    # FINAL corpus (what 24 epochs of appends avoided paying)
    final = base.unionByName(stream).localCheckpoint()

    def _rebuild():
        idx_c = os.path.join(work, "rebuild")
        corpus = rotate_vectors(final, "embedding", R).localCheckpoint()
        centers, _ = kmeans_fit(
            corpus, "vec_id", "embedding", k=cells, iters=3,
            fit_sample_mod=fit_mod,
        )
        return ivf_sq8_index_build(
            final, "vec_id", "embedding", idx_c, dim=DIM,
            centers=centers, rotation=R,
        )

    _, rebuild_wall = _timed(_rebuild)

    corpus_rows = [
        (int(r["vec_id"]), [float(v) for v in r["embedding"]])
        for r in final.collect()
    ]
    recall = {
        "rot": _recall_panel(spark, idx_a, corpus_rows, queries),
        "raw": _recall_panel(spark, idx_b, corpus_rows, queries),
    }
    n_rows = {
        "rot": ivf_sq8_index_verify(spark, idx_a)["n_rows"],
        "raw": ivf_sq8_index_verify(spark, idx_b)["n_rows"],
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "corpus": src, "n_base": n_base, "cells": cells,
        "n_epochs": n_epochs, "fit_rotation_s": fit_wall,
        "build_s": {"rot": build_a, "raw": build_b},
        "append_total_s": append_wall,
        "advice": advice_log,
        "compact": compact,
        "serve": serve,
        "rebuild_final_s": rebuild_wall,
        "recall_at_10": recall,
        "n_rows": n_rows,
    }))


if __name__ == "__main__":
    main()
