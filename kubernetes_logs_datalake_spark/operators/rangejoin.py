"""Bucketized range (interval) join.

``events a ⋈ events b ON a.key = b.key AND |a.ts - b.ts| <= Δ`` — the
"what happened near this event" join. A naive non-equi join degenerates
to a per-key cross product (Spark picks BroadcastNestedLoopJoin or a
cartesian per key). The scalable shape **bucketizes time**: assign each
left row to its Δ-bucket, replicate each right row into its bucket and
the two adjacent ones, equi-join on (key, bucket), then apply the exact
interval predicate. Cost: one 3x-replicated equi-join shuffle instead
of an O(n_key²) probe; the final filter is exact, so results equal the
naive join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time_ns import _floordiv


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delta: int,
) -> DataFrame:
    """All (left, right) pairs with equal ``on`` key and
    ``|left_ts - right_ts| <= max_delta`` (same time unit as the ts
    columns; ns longs here). Output: left columns + right columns
    (caller pre-aliases to avoid collisions)."""
    # exact long floor-division: `/` on longs is double and shifts bucket
    # ids past 2^53 (ns-since-epoch ~1.7e18), silently dropping pairs
    l = left.withColumn("_bucket", _floordiv(F.col(left_ts), max_delta))
    r = right.withColumn("_rbucket", _floordiv(F.col(right_ts), max_delta)).withColumn(
        "_bucket", F.explode(F.array(F.col("_rbucket") - 1, F.col("_rbucket"), F.col("_rbucket") + 1))
    )
    joined = l.join(r.drop("_rbucket"), [on, "_bucket"])
    exact = joined.filter(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= max_delta
    )
    return exact.drop("_bucket")
