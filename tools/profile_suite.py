#!/usr/bin/env python
"""Suite-wide decomposition profiler (r15 optimization round).

For every registered query (plus the clustered bench fixtures), in one
warmed session, measures SEPARATELY:

- ``build_s``  — wall time of ``queries()[name](spark, sf_dir)``: Python
  plan construction + any driver-side index work (k-means collects,
  codebook fits) the entry does before returning the DataFrame;
- ``exec_s``   — wall time of the noop write (analysis + optimization +
  execution of the returned plan);
- ``njobs``    — Spark jobs submitted during the exec action (from the
  status tracker's job-id delta), i.e. how many sequential driver
  round-trips the plan costs beyond the single action.

Two passes: pass 1 warms (JIT, codegen, parquet footers, the entry's
center/codebook caches) exactly like bench.py's warm-up; pass 2 is the
measured one. Prints one JSON line per query to stdout, sorted by
total descending, plus a summary footer.

Usage: python tools/profile_suite.py [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from kubernetes_logs_datalake_spark import get_spark  # noqa: E402


def main() -> None:
    only = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1
    spark = get_spark(
        "kld-profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entrymod.queries()
    try:
        extra = bench.clustered_queries(spark, bench.ensure_clustered_fixture(sf))
    except Exception as exc:  # noqa: BLE001
        print(f"clustered fixture unavailable: {exc}", file=sys.stderr)
        extra = {}
    names = bench.HEADLINE + sorted(extra)
    if only:
        names = [n for n in names if n in set(only)]

    tracker = spark.sparkContext.statusTracker()

    seq = [0]

    def run(name: str):
        t0 = time.time()
        df = extra[name]() if name in extra else qs[name](spark, sf_dir)
        t1 = time.time()
        seq[0] += 1
        group = f"prof-{name}-{seq[0]}"
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", group)
        try:
            df.write.format("noop").mode("overwrite").save()
        finally:
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        t2 = time.time()
        njobs = len(tracker.getJobIdsForGroup(group) or [])
        return t1 - t0, t2 - t1, njobs

    # pass 1: warm everything (same role as bench.py's warm-up pass)
    errors = {}
    for name in names:
        try:
            run(name)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
        gc.collect()
    # pass 2: measure
    rows = []
    for name in names:
        if name in errors:
            continue
        try:
            b, e, nj = run(name)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        rows.append({"name": name, "build_s": round(b, 3),
                     "exec_s": round(e, 3), "njobs": nj,
                     "total_s": round(b + e, 3)})
        gc.collect()
    rows.sort(key=lambda r: -r["total_s"])
    for r in rows:
        print(json.dumps(r))
    tot_b = sum(r["build_s"] for r in rows)
    tot_e = sum(r["exec_s"] for r in rows)
    print(json.dumps({
        "summary": True, "n": len(rows),
        "build_sum_s": round(tot_b, 1), "exec_sum_s": round(tot_e, 1),
        "total_s": round(tot_b + tot_e, 1),
        "jobs_total": sum(r["njobs"] for r in rows),
        "errors": errors,
    }))


if __name__ == "__main__":
    main()
