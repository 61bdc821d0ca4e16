#!/usr/bin/env python
"""Measure WHEN ivf_sq8_index_compact pays (r13 verdict task #6): the
operational rule a 100 TB deployment needs next to the
max_files_per_cell knob.

Protocol (one session, warmed reps — the tools/ab_isolated.py
discipline): build an IVF,SQ8 index from half the organic ×N corpus,
then drive EPOCHS streaming-append-style slices of the rest into it.
After every few epochs, time the stored-index serve (rep 1 discarded,
median of the rest) and record the cell-file census. Then compact,
time the compaction itself, and re-time the serve.

Output: one JSON line with the epoch → (files, serve_ms) curve and the
compaction cost/benefit — the file-count knee where per-file
open/footer overhead starts to dominate the probe scan is directly
readable from the curve.

Usage: python tools/compaction_economics.py [copies] [n_epochs]
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


def _time_serve(spark, idx, query) -> float:
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


def _file_census(spark, idx) -> dict:
    from kubernetes_logs_datalake_spark.operators.vectors import _index_fs

    fs = _index_fs(spark, idx)
    per_cell: dict[int, int] = {}
    for p in fs.glob(f"{idx}/cells/cluster=*/part-*"):
        cl = int(p.split("cluster=")[1].split("/")[0])
        per_cell[cl] = per_cell.get(cl, 0) + 1
    return {
        "files": sum(per_cell.values()),
        "max_per_cell": max(per_cell.values()),
    }


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    src = f"/tmp/spark_graft_scale_x{copies}"
    if not os.path.exists(f"{src}/_COMPLETE"):
        print(json.dumps({"corpus": src, "error": "not built"}))
        return

    from kubernetes_logs_datalake_spark.operators.vectors import (
        ivf_sq8_index_append, ivf_sq8_index_build, ivf_sq8_index_compact,
        kmeans_fit,
    )

    spark = get_spark("compaction-economics")
    emb = (
        spark.read.parquet(f"{src}/embeddings.parquet")
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "embedding")
    )
    base = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 0)
    stream = emb.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 1
    ).localCheckpoint()
    n_base = base.count()
    cells, fit_mod = entrymod._sqrt_cells(n_base)
    centers, _ = kmeans_fit(
        base, "vec_id", "embedding", k=cells, iters=3,
        fit_sample_mod=fit_mod,
    )
    work = tempfile.mkdtemp(prefix="cmp-econ-")
    idx = os.path.join(work, "idx")
    ivf_sq8_index_build(
        base, "vec_id", "embedding", idx, dim=DIM, centers=centers
    )
    rng = np.random.default_rng(11)
    query = [float(v) for v in rng.normal(0.0, 1.0, DIM)]

    curve = [{"epoch": 0, **_file_census(spark, idx),
              "serve_ms": _time_serve(spark, idx, query)}]
    for ep in range(1, n_epochs + 1):
        sl = stream.filter(
            F.pmod(F.xxhash64("vec_id"), F.lit(n_epochs)) == ep - 1
        )
        ivf_sq8_index_append(sl, idx, skip_existing_ids=True)
        if ep % 4 == 0 or ep == n_epochs:
            curve.append({"epoch": ep, **_file_census(spark, idx),
                          "serve_ms": _time_serve(spark, idx, query)})

    t0 = time.time()
    res = ivf_sq8_index_compact(spark, idx, max_files_per_cell=4)
    compact_wall = round(time.time() - t0, 2)
    after = {"epoch": f"{n_epochs}+compact", **_file_census(spark, idx),
             "serve_ms": _time_serve(spark, idx, query)}
    curve.append(after)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "corpus": src, "n_base": n_base, "cells": cells,
        "n_epochs": n_epochs, "curve": curve,
        "compact": {**res, "wall_s": compact_wall},
    }))


if __name__ == "__main__":
    main()
