#!/usr/bin/env python
"""A/B the OPQ-style rotation (operators/rotation.py) on the organic
scale corpora — the r12 verdict "what's missing #1" measurement.

Both shipped operators whose favorable regime is gated on subspace
geometry are scored on their own structural statistic, raw vs rotated:

- IMI product-cell join: occupancy (occupied/K² product cells),
  max-cell size vs the fair share, and Σ|cell|² (the pair-stage cost
  functional) after assigning through two half-space codebooks fit on
  the (rotated) corpus. The r12 collapse: 81/729 occupied on organic
  ×10 because component identity correlates the halves.
- per-cell SQ8: effective bits = mean over dims of
  log2(global range / cell range), weighted over cells by size —
  the sizing rule from SCALE.md r12 (1.76 bits on organic ×10). Bits
  clamped to [0, 8]: an 8-bit grid cannot spend more, and singleton
  cells (zero range) would otherwise read infinite.

Also times imi_knn_join end-to-end raw vs rotated (fits cached out on
both sides via explicit centers, the registry contract) so the
structural deltas are tied to a wall number.

Usage: python tools/rotation_ab.py [copies ...]   (default: 10 20)
Expects /tmp/spark_graft_scale_x{copies} (tools/scale_check.py builds).
Prints one JSON line per corpus.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kubernetes_logs_datalake_spark import get_spark

DIM = entrymod.EMBEDDING_DIM


def _imi_stats(spark, df, k1: int, fit_mod, label: str) -> dict:
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.similarity import (
        _imi_assign,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_fit

    h1 = DIM // 2
    half1 = df.select("vec_id", F.slice("embedding", 1, h1).alias("embedding"))
    half2 = df.select(
        "vec_id", F.slice("embedding", h1 + 1, DIM - h1).alias("embedding")
    )
    c1, _ = kmeans_fit(half1, "vec_id", "embedding", k=k1, iters=3,
                       fit_sample_mod=fit_mod)
    c2, _ = kmeans_fit(half2, "vec_id", "embedding", k=k1, iters=3,
                       fit_sample_mod=fit_mod)
    cells = (
        _imi_assign(df, "vec_id", "embedding", c1, c2, DIM)
        .groupBy("j1", "j2").count().collect()
    )
    sizes = [int(r["count"]) for r in cells]
    n = sum(sizes)
    fair = n / (k1 * k1)
    return {
        "occupied": len(sizes),
        "cells_total": k1 * k1,
        "max_cell": max(sizes),
        "max_over_fair": round(max(sizes) / fair, 1),
        "sum_c2_M": round(sum(s * s for s in sizes) / 1e6, 2),
        "centers": (c1, c2),
    }


def _sq8_effective_bits(spark, df, cells: int, fit_mod) -> dict:
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.vectors import (
        kmeans_assign, kmeans_fit,
    )

    centers, _ = kmeans_fit(df, "vec_id", "embedding", k=cells, iters=3,
                            fit_sample_mod=fit_mod)
    assigned = kmeans_assign(df, "vec_id", "embedding", centers)
    per = (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"),
             F.count("*").alias("cnt"))
        .collect()
    )
    gmn: dict[int, float] = {}
    gmx: dict[int, float] = {}
    for r in per:
        p = int(r["pos"])
        gmn[p] = min(gmn.get(p, float("inf")), float(r["mn"]))
        gmx[p] = max(gmx.get(p, float("-inf")), float(r["mx"]))
    by_cell: dict[int, list] = {}
    size: dict[int, int] = {}
    for r in per:
        c, p = int(r["cluster"]), int(r["pos"])
        g = gmx[p] - gmn[p]
        cr = float(r["mx"]) - float(r["mn"])
        bits = 8.0 if cr <= 0 else min(8.0, max(0.0, math.log2(g / cr)))
        by_cell.setdefault(c, []).append(bits)
        # cnt is rows*1 per (cluster,pos); same count each pos
        size[c] = int(r["cnt"])
    cell_bits = {c: sum(b) / len(b) for c, b in by_cell.items()}
    total = sum(size.values())
    wmean = sum(cell_bits[c] * size[c] for c in cell_bits) / total
    return {
        "effective_bits_wmean": round(wmean, 2),
        "effective_bits_max": round(max(cell_bits.values()), 2),
        "cells": cells,
    }


def _imi_join_wall(df, k1: int, centers, split_cap: int) -> float:
    from kubernetes_logs_datalake_spark.operators.similarity import (
        imi_knn_join,
    )

    t0 = time.time()
    imi_knn_join(
        df, "vec_id", "embedding", dim=DIM, k=3, cells_per_half=k1,
        iters=3, centers=centers, split_cap=split_cap,
    ).foreach(lambda r: None)
    return round(time.time() - t0, 2)


def main() -> None:
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.rotation import (
        fit_pca_rotation, random_rotation, rotate_vectors,
    )

    copies_list = [int(a) for a in sys.argv[1:]] or [10, 20]
    spark = get_spark("rotation-ab")
    for copies in copies_list:
        src = f"/tmp/spark_graft_scale_x{copies}"
        emb = (
            spark.read.parquet(f"{src}/embeddings.parquet")
            .filter(F.col("vec_id") != 0)
            .select("vec_id", "embedding")
        )
        raw = emb.localCheckpoint()
        n = raw.count()
        k1, fit_mod = entrymod._cbrt_cells(n)
        sq8_cells, sq8_mod = entrymod._sqrt_cells(n)
        cap = entrymod._imi_split_cap(n, k1)

        t0 = time.time()
        R_pca = fit_pca_rotation(raw, "vec_id", "embedding", DIM,
                                 subspaces=2, sample_mod=fit_mod)
        fit_s = round(time.time() - t0, 2)
        t0 = time.time()
        rot_pca = rotate_vectors(raw, "embedding", R_pca).localCheckpoint()
        rot_s = round(time.time() - t0, 2)
        rot_rand = rotate_vectors(
            raw, "embedding", random_rotation(DIM, seed=13)
        ).localCheckpoint()

        # same-session flat-IVF baseline (raw corpus only: Lloyd with
        # the md5-seeded init is rotation-EQUIVARIANT — rotated data
        # yields the rotated centroids and identical cell memberships
        # up to float noise — so flat's cost structure is unchanged by
        # any orthonormal rotation; only subspace methods move)
        from kubernetes_logs_datalake_spark.operators.similarity import (
            ivf_knn_join,
        )
        from kubernetes_logs_datalake_spark.operators.vectors import (
            kmeans_fit,
        )

        fc, _ = kmeans_fit(raw, "vec_id", "embedding", k=sq8_cells,
                           iters=3, fit_sample_mod=sq8_mod)
        t0 = time.time()
        ivf_knn_join(
            raw, "vec_id", "embedding", k=3, cells=sq8_cells, iters=3,
            centers=fc, split_cap=entrymod._cell_split_cap(sq8_cells),
        ).foreach(lambda r: None)
        flat_wall = round(time.time() - t0, 2)

        out = {"corpus": f"organic x{copies}", "n": n, "k1": k1,
               "split_cap": cap, "pca_fit_s": fit_s, "rotate_s": rot_s,
               "flat_ivf_join_wall_s": flat_wall, "variants": {}}
        for name, df in (("raw", raw), ("pca_balanced", rot_pca),
                         ("random", rot_rand)):
            imi = _imi_stats(spark, df, k1, fit_mod, name)
            centers = imi.pop("centers")
            wall = _imi_join_wall(df, k1, centers, cap)
            sq8 = _sq8_effective_bits(spark, df, sq8_cells, sq8_mod)
            out["variants"][name] = {
                "imi": imi, "imi_join_wall_s": wall, "sq8": sq8,
            }
        print(json.dumps(out))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
