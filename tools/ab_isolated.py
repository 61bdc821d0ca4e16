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
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    label = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "3"))
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        # bench-fixture queries (the *_clustered family) live in
        # bench.py, not the registry — they need an sf<number> dir to
        # size their fixture; validate BOTH up front so a typo'd name
        # or a scale-fixture path fails with a clear message, not a
        # KeyError/ValueError mid-run (r11 ADVICE)
        import bench

        known_clustered = set(bench.CLUSTERED_QUERY_NAMES)
        bogus = [n for n in unknown if n not in known_clustered]
        if bogus:
            print(
                f"unknown query name(s): {bogus}\n"
                f"registered: {len(qs)} registry queries; "
                f"clustered (bench.py): {sorted(known_clustered)}",
                file=sys.stderr,
            )
            raise SystemExit(2)
        tail = sf.rstrip("/").rsplit("sf", 1)[-1]
        try:
            sf_num = float(tail)
        except ValueError:
            print(
                f"clustered queries {sorted(set(unknown))} need "
                f"SPARK_GRAFT_SF_DIR ending in sf<number> (to size their "
                f"fixture); got {sf!r}",
                file=sys.stderr,
            )
            raise SystemExit(2)
    spark = get_spark(app_name=f"ab-{label}")
    clustered = None
    if unknown:
        import bench

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
