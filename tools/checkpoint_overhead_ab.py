#!/usr/bin/env python
"""A/B the reliable-checkpoint knob's overhead at a scale fixture
(r11 verdict task #2's "quantify the price of surviving executor
loss"): run the two heaviest iterative operators — connected
components over an order→part edge graph and PageRank over the same
edges — with (a) the default localCheckpoint truncation, (b) reliable
checkpointing every round, (c) reliable every 3 rounds, and print one
JSON line with wall times and the output-identity check.

Usage: python tools/checkpoint_overhead_ab.py [copies]   (default 10,
expects /tmp/spark_graft_scale_x{copies}; tools/scale_check.py builds
it). The checkpoint FS is local disk here — on a cluster the write+read
goes to HDFS/S3, so treat the measured delta as a lower bound and the
ROUND COUNT × |state| as the transferable number.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark import get_spark
from kubernetes_logs_datalake_spark.operators.dedup import (
    connected_components,
)
from kubernetes_logs_datalake_spark.operators.graph import pagerank


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dest = f"/tmp/spark_graft_scale_x{copies}"
    if not os.path.exists(os.path.join(dest, "_COMPLETE")):
        raise SystemExit(f"fixture missing: run tools/scale_check.py {copies}")
    ckdir = f"/tmp/ck_ab_x{copies}"
    shutil.rmtree(ckdir, ignore_errors=True)
    spark = get_spark("checkpoint-ab")

    # one edge per 4th order: order→part bipartite graph — big enough
    # that per-round state costs real shuffle/IO (~400k nodes at x10),
    # small enough that 6 full runs fit an A/B budget
    edges = (
        spark.read.parquet(f"{dest}/lineitem.parquet")
        .filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 4 == 0))
        .select(
            F.col("l_orderkey").alias("id_a"),
            (F.col("l_partkey") + F.lit(10**12)).alias("id_b"),
        )
    )
    n_edges = edges.count()

    out: dict = {"copies": copies, "n_edges": n_edges, "cc": {}, "pagerank": {}}

    def run_cc(tag, **kw):
        t0 = time.time()
        res = connected_components(edges, max_iter=30, **kw)
        chk = res.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(node, component))").alias("h"),
        ).first()
        out["cc"][tag] = {
            "sec": round(time.time() - t0, 2),
            "rows": int(chk["n"]),
            "hash": int(chk["h"]),
        }
        print(f"cc/{tag}: {out['cc'][tag]}", file=sys.stderr, flush=True)

    def run_pr(tag, **kw):
        t0 = time.time()
        res = pagerank(
            edges, "id_a", "id_b", iters=8, **kw
        )
        chk = res.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(node, cast(rank as string)))").alias("h"),
        ).first()
        out["pagerank"][tag] = {
            "sec": round(time.time() - t0, 2),
            "rows": int(chk["n"]),
            "hash": int(chk["h"]),
        }
        print(
            f"pagerank/{tag}: {out['pagerank'][tag]}",
            file=sys.stderr, flush=True,
        )

    for tag, kw in [
        ("local", {}),
        ("reliable_every1", {"checkpoint_dir": ckdir, "checkpoint_every": 1}),
        ("reliable_every3", {"checkpoint_dir": ckdir, "checkpoint_every": 3}),
    ]:
        run_cc(tag, **kw)
        run_pr(tag, **kw)

    out["identical"] = (
        len({v["hash"] for v in out["cc"].values()}) == 1
        and len({v["hash"] for v in out["pagerank"].values()}) == 1
    )
    shutil.rmtree(ckdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
