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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Corpus-snapshot diff by content hash: per status (added /
    removed / modified / unchanged), document and character counts —
    the data-versioning report behind "what changed between last
    week's corpus and this one" (retrain triggers, lineage audits,
    incremental-dedup planning).

    Both snapshots reduce to (id, md5(content), length) rows before the
    id-keyed full outer join — content bytes never ride the shuffle,
    only 32-hex digests. Char counts use the relevant side (added/
    modified → new, removed → unchanged-side semantics documented per
    column). One shuffle each side + the join; output ≤ 4 rows.
    """
    # presence is its own flag — NULL content must not read as a
    # missing ROW (md5(NULL) is NULL, so hash-nullness conflates the
    # two); hashes compare null-safely so two NULL-content sides are
    # "unchanged", NULL vs text is "modified"
    a = old.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_pa"),
        F.md5(F.col(content_col)).alias("_ha"),
        F.length(content_col).cast("long").alias("_la"),
    )
    b = new.select(
        F.col(id_col).alias("_id"),
        F.lit(True).alias("_pb"),
        F.md5(F.col(content_col)).alias("_hb"),
        F.length(content_col).cast("long").alias("_lb"),
    )
    j = a.join(b, "_id", "full_outer")
    status = (
        F.when(F.col("_pa").isNull(), F.lit("added"))
        .when(F.col("_pb").isNull(), F.lit("removed"))
        .when(F.col("_ha").eqNullSafe(F.col("_hb")), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    # chars column: the side that exists "after" the change — new for
    # added/modified/unchanged, old for removed (what was lost) — keyed
    # on row PRESENCE, so NULL content counts 0 chars on its own side
    # instead of falling through to the other side's length
    chars = F.when(
        F.col("_pb").isNotNull(), F.coalesce("_lb", F.lit(0))
    ).otherwise(F.coalesce("_la", F.lit(0)))
    return (
        j.select(status.alias("status"), chars.alias("_c"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_c").alias("n_chars"),
        )
        .orderBy("status")
    )
