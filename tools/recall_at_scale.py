#!/usr/bin/env python
"""Collect recall VALUES (not timings) of every ANN recall harness at a
scale-step fixture — the recall-vs-n table SCALE.md carries now that
the scale corpus is organic (r10 verdict item 4: replicated copies made
every harness read a degenerate 1.0; the seeded Gaussian-mixture
corpus gives the number a deployment actually sizes n_probe/refine_k
from).

Usage: python tools/recall_at_scale.py [copies] — expects the
/tmp/spark_graft_scale_x{copies} fixture (tools/scale_check.py builds
it); prints one JSON line {query: {recall, n_queries, ...}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from kubernetes_logs_datalake_spark import get_spark

HARNESSES = [
    "ann_recall_ivf_join",
    "ann_recall_ivf_join_probed",
    "ann_recall_ivf_join_adc",
    "ann_recall_mrl",
    "ann_recall_sq8",
    "ann_recall_ivfpq",
]


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dest = f"/tmp/spark_graft_scale_x{copies}"
    if not os.path.exists(os.path.join(dest, "_COMPLETE")):
        raise SystemExit(f"fixture missing: run tools/scale_check.py {copies}")
    spark = get_spark("recall-at-scale")
    qs = entrymod.queries()
    out: dict = {"copies": copies, "fixture": dest}
    for name in HARNESSES:
        try:
            row = qs[name](spark, dest).first().asDict()
            out[name] = {
                k: (round(float(v), 4) if isinstance(v, float) else int(v))
                for k, v in row.items()
            }
        except Exception as exc:  # noqa: BLE001 — record, continue
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
