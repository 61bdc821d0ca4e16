#!/usr/bin/env python
"""Isolated A/B timing harness (the r8 jaccard-bisect recipe, made
reusable): run a named subset of registered queries in ONE fresh
session at a given sf dir, several reps each, and print one JSON line
per query with all rep timings. Used for the r10 directive-6 A/B of
``dedup_semantic`` and ``embedding_ivf_knn_join`` (before/after the
√n cells rule) without the 120-query bench's cache-pressure noise.

Usage: python tools/ab_isolated.py <label> <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), AB_REPS (3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kubernetes_logs_datalake_spark import get_spark


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "3"))
    spark = get_spark(app_name=f"ab-{label}")
    qs = entrymod.queries()
    clustered = None
    if any(n not in qs for n in names):
        # bench-fixture queries (the *_clustered family) live in
        # bench.py, not the registry — resolve them lazily so the
        # drift A/Bs the verdicts ask for can target them too
        import bench

        sf_num = float(sf.rstrip("/").rsplit("sf", 1)[-1])
        clustered = bench.clustered_queries(
            spark, bench.ensure_clustered_fixture(sf_num)
        )
    out = {"label": label, "sf": sf, "reps": reps, "queries": {}}
    for name in names:
        fn = qs.get(name) or (lambda s, d, _f=clustered[name]: _f())
        times = []
        for _ in range(reps):
            t0 = time.time()
            n = fn(spark, sf).count()
            times.append(round(time.time() - t0, 3))
        out["queries"][name] = {"rows": n, "times": times}
        print(json.dumps({name: times}), flush=True)
    print("AB_RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
