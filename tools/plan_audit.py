#!/usr/bin/env python
"""Plan-shape audit: build every registered query's physical plan at
sf0.001 and record the metrics that matter at 100 TB — exchanges,
single-partition exchanges, scans, join strategies, Python eval nodes,
whole-stage codegen spans, TakeOrdered usage. One JSON line per run to
stdout (summary) + a full per-query map to PLAN_AUDIT.json.

This is the automated form of the per-round "explain and iterate until
it's the plan you'd want" discipline: diffs of PLAN_AUDIT.json between
rounds surface silent plan regressions (a lost broadcast, a new
single-partition exchange) that timing noise can hide.

Reading the summary: ``with_single_partition`` is not automatically a
defect — a query whose ANSWER is one row (global sum, scalar total,
funnel's wide aggregate, a histogram's min/max bounds) must finalize
its partial aggregation states on one partition, and those exchanges
carry BYTES of agg state, not data rows. The defect the plan gates ban
is a single-partition exchange feeding a WindowExec or sort over data
rows (see tests/test_plans.py::test_no_unpartitioned_window...); as of
round 6 every listed query is the scalar-total shape.

Usage: python tools/plan_audit.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from kubernetes_logs_datalake_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

METRICS = {
    "exchanges": "Exchange hashpartitioning",
    "single_partition": "Exchange SinglePartition",
    "range_exchanges": "Exchange rangepartitioning",
    "parquet_scans": "Scan parquet",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "sort_merge_joins": "SortMergeJoin",
    "nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian": "CartesianProduct",
    "hash_aggregates": "HashAggregate",
    "windows": "Window",
    "take_ordered": "TakeOrderedAndProject",
    "python_eval": "EvalPython",
    "codegen_spans": "WholeStageCodegen",
}


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("kld-plan-audit")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = {k: plan.count(tok) for k, tok in METRICS.items()}
            # driver-canon lint: the correctness gate's pandas canon
            # hashes scalar cells only — a top-level array/map/struct
            # column is a guaranteed red row even with correct values
            from pyspark.sql.types import ArrayType, MapType, StructType

            bad = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in df.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if bad:
                out[name]["unhashable_cols"] = bad
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json")
    with open(dest, "w") as fh:
        json.dump({"queries": out, "errors": errors}, fh, indent=1, sort_keys=True)
    summary = {
        "n_queries": len(out),
        "n_errors": len(errors),
        "with_python_eval": sorted(
            n for n, m in out.items() if m["python_eval"]
        ),
        "with_cartesian": sorted(n for n, m in out.items() if m["cartesian"]),
        "with_unhashable_output": sorted(
            n for n, m in out.items() if m.get("unhashable_cols")
        ),
        "with_single_partition": sorted(
            n for n, m in out.items() if m["single_partition"]
        ),
        "total_exchanges": sum(m["exchanges"] for m in out.values()),
        "written": dest,
    }
    print(json.dumps(summary))
    return 1 if errors or summary["with_unhashable_output"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
