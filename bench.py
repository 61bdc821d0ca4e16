#!/usr/bin/env python
"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query materializes fully through the `noop` sink (forces complete
execution, no driver-side result transfer skewing the numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from kubernetes_logs_datalake_spark import get_spark

# Representative spread: scans+agg, multi-join, window, rollup,
# sessionize, dedup, text quality, similarity search, temporal joins.
# (The all-pairs jaccard/minhash operators are excluded here: the
# synthetic corpus's ~40-word vocabulary makes every document collide
# with every other, which benchmarks the generator, not the operator.
# dedup_embedding_lsh is excluded for the same reason — at the
# synthetic corpus's 0.35 operating threshold ~64% of all pairs are
# true candidates, so candidate volume measures the generator's
# uniformity, not the banding.)
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q10_returned_items",
    "brand_revenue_broadcast",
    "window_top_orders_per_customer",
    "window_running_total",
    "events_hourly_rollup",
    "events_sessions",
    "events_top_users",
    "dedup_exact",
    "text_quality",
    "ann_topk_bruteforce",
    "knn_join",
    "asof_purchase_click",
    "range_join_error_context",
]


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("kld-bench")
    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm-up pass over every query family: first execution pays JVM
    # JIT, codegen compilation and parquet footer caching — one-time
    # costs that would otherwise be attributed to whichever query runs
    # first (observed 14.7 -> 20 s suite variance round 1)
    for name in HEADLINE:
        run(name)

    # median of N repeats, plus spread, so round-over-round regressions
    # are attributable to plan changes rather than run jitter
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(REPEATS):
        for name in HEADLINE:
            samples[name].append(run(name))
    timings = {
        name: round(sorted(ts)[len(ts) // 2], 3) for name, ts in samples.items()
    }
    spread = {
        name: round(max(ts) - min(ts), 3) for name, ts in samples.items()
    }

    print(
        json.dumps(
            {
                "metric": "headline query suite wall-clock (median of "
                f"{REPEATS}, warmed)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
