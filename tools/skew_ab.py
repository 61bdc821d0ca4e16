#!/usr/bin/env python
"""Skew A/B for the bounded-cell split (r10 verdict directive 1's
"Done" evidence): on a planted-hot-cell corpus at a genuine scale step
(default 20k vectors, 30% in one tight blob captured by ONE coarse
cell), measure the cell-local pair stages WITH the split_cap guard vs
WITHOUT it — pair counts and wall-clock for semdedup's pair stage and
the IVF kNN join. The uniform driver fixture can never activate the
guard (max/fair-share ≤ 1.41 measured); this fixture is the skew shape
the guard exists for.

Usage: python tools/skew_ab.py [n_rows] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kubernetes_logs_datalake_spark import get_spark


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.semdedup import (
        semdedup_pairs,
    )
    from kubernetes_logs_datalake_spark.operators.cellsplit import (
        split_oversized_cells,
    )
    from kubernetes_logs_datalake_spark.operators.similarity import (
        ivf_knn_join,
    )
    from kubernetes_logs_datalake_spark.operators.vectors import kmeans_assign

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    dim = 64
    spark = get_spark("skew-ab")
    rng = np.random.default_rng(7)
    n_hot = int(0.3 * n)
    hot = rng.normal(0.9, 0.05, (n_hot, dim))
    cold = rng.uniform(0, 1, (n - n_hot, dim))
    x = np.vstack([hot, cold]).astype(np.float64)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(x)}
    )
    df = (
        spark.createDataFrame(pdf, "vec_id: long, embedding: array<double>")
        .repartition(32)
        .localCheckpoint()
    )
    # handcrafted coarse centers put the whole blob in cell 0 — the
    # worst case a data-dependent fit could produce on a clustered
    # corpus (a tight popular mode owning one centroid)
    from math import isqrt

    cells = max(8, isqrt(n))
    centers = [[0.9] * dim] + [
        [((37 * j) % 100) / 100.0, ((53 * j) % 100) / 100.0] * (dim // 2)
        for j in range(cells - 1)
    ]
    cap = 4 * cells
    assigned = kmeans_assign(df, "vec_id", "embedding", centers)
    assigned = assigned.localCheckpoint()
    sizes = assigned.groupBy("cluster").count()
    fattest = sizes.agg(F.max("count")).first()[0]

    out: dict = {
        "n": n, "cells": cells, "cap": cap, "fattest_cell": int(fattest),
    }

    def timed(label, thunk):
        t0 = time.time()
        v = thunk()
        out[label] = round(time.time() - t0, 2)
        return v

    # -- semdedup pair stage (threshold -1: count EVERY in-cell pair,
    #    the work the stage does before any filter) --
    unsplit = assigned.withColumn("cell", F.col("cluster").cast("string"))
    out["pairs_unsplit"] = int(
        timed(
            "sec_pairs_unsplit",
            lambda: semdedup_pairs(
                unsplit, "vec_id", "embedding", threshold=-1.0,
                cell_col="cell",
            ).count(),
        )
    )
    refined, splits = split_oversized_cells(
        assigned, "vec_id", "embedding", cap=cap
    )
    refined = refined.localCheckpoint()
    out["split_rounds"] = len(splits)
    out["pairs_split"] = int(
        timed(
            "sec_pairs_split",
            lambda: semdedup_pairs(
                refined, "vec_id", "embedding", threshold=-1.0,
                cell_col="cell",
            ).count(),
        )
    )
    post_max = refined.groupBy("cell").count().agg(F.max("count")).first()[0]
    out["post_split_fattest"] = int(post_max)

    # -- IVF kNN join wall, with vs without the guard --
    timed(
        "sec_join_unsplit",
        lambda: ivf_knn_join(
            df, "vec_id", "embedding", k=3, cells=cells, centers=centers
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "sec_join_split",
        lambda: ivf_knn_join(
            df, "vec_id", "embedding", k=3, cells=cells, centers=centers,
            split_cap=cap,
        ).write.format("noop").mode("overwrite").save(),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
