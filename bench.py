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
# sessionize, dedup, text quality, similarity search. (The all-pairs
# jaccard/minhash operators are excluded here: the synthetic corpus's
# ~40-word vocabulary makes every document collide with every other,
# which benchmarks the generator, not the operator.)
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("kld-bench")
    qs = entrymod.queries()

    # warm the JVM/codegen once with the cheapest query
    qs["q6_revenue_forecast"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline query suite wall-clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
