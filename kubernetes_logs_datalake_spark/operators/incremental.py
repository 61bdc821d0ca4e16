"""Incremental aggregate maintenance: partial-agg states that merge.

Why in this engine: at 100 TB the nightly report cannot rescan the
lake. The standard fix is a MERGEABLE aggregate state — per group,
(count, sums) — maintained by folding in only the new partition's
state: ``state(old ∪ delta) = merge(state(old), state(delta))``. That
identity holds exactly for count/sum (and everything derivable from
them: mean, rate, revenue) when the sums are DECIMAL — float sums
would drift between the incremental and recompute paths, which is why
this module uses the repo's exact-reduce recipe.

Spark shape: building a state is one map-side-combined groupBy; the
merge is a unionByName + the SAME groupBy — no join, no window, no
driver traffic. The state table is O(groups), so maintenance cost is
proportional to the DELTA, never the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def partial_agg_state(
    df: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Build a mergeable aggregate state: per ``keys`` group, row count
    ``n`` plus an exact decimal sum per measure (``sum_<m>``)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for m in measures:
        aggs.append(F.sum(F.col(m).cast(_DEC)).cast(_DEC).alias(f"sum_{m}"))
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(
    a: DataFrame, b: DataFrame, keys: list[str]
) -> DataFrame:
    """Merge two states built by :func:`partial_agg_state` over the
    same keys/measures: groups present in either side survive, counts
    and sums add. Decimal addition is associative and commutative, so
    any merge order (old⊕delta, delta⊕old, a tree of shards) yields
    the bit-identical state a full recompute would."""
    measures = [c for c in a.columns if c.startswith("sum_")]
    merged = a.unionByName(b)
    aggs = [F.sum("n").cast("long").alias("n")]
    for c in measures:
        aggs.append(F.sum(F.col(c).cast(_DEC)).cast(_DEC).alias(c))
    return merged.groupBy(*keys).agg(*aggs)
