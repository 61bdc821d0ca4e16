"""Distinct-count sketching that stays *oracle-exact*.

``approx_count_distinct`` (HyperLogLog) is the built-in answer, but its
estimate is implementation-defined — no other engine reproduces it, so
correctness checks degrade to rows-only. The K-minimum-values sketch
(Bar-Yossef et al. 2002) has the same one-pass / bounded-state shape,
yet every step is deterministic column algebra over md5, so Spark and
any ANSI engine produce bit-identical estimates — the property this
repo's oracle harness is built on.

Estimator: hash keys to uniform (0,1] via the first 8 md5 hex digits;
keep each group's k smallest distinct hashes; if the group has fewer
than k distinct keys the sketch IS the exact count, otherwise
estimate = (k-1) / h_(k).

At 100 TB: the heavy input first collapses to distinct (group, hash)
pairs with map-side partial aggregation, then a *partitioned* window
keeps k rows per group — Spark ≥3.5 rewrites rank-limit windows into
WindowGroupLimit, pruning to ≤k rows per partition before the shuffle,
so state per group is O(k) end to end (the sketch property), never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(16**8)  # 8 hex digits → uniform on [0, 2^32)


def uniform_hash(col) -> F.Column:
    """Deterministic uniform (0,1] hash of a key — engine-portable:
    md5 8-hex prefix scaled by 2^-32 (+2^-33 to stay nonzero), the same
    recipe in Spark (`conv`) and ANSI SQL (`('0x'||hex)::BIGINT`)."""
    c = F.col(col) if isinstance(col, str) else col
    prefix = F.substring(F.md5(c.cast("string")), 1, 8)
    return (F.conv(prefix, 16, 10).cast("long") + F.lit(0.5)) / F.lit(HASH_SPACE)


def kmv_distinct(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimate via the KMV sketch.

    Returns one row per group: (``*group_cols``, ``est_distinct``
    double). Exact (and flagged so) for groups with < k distinct keys.
    """
    h = uniform_hash(key_col).alias("_h")
    pairs = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    topk = pairs.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return topk.groupBy(*group_cols).agg(
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.round((F.lit(float(k - 1))) / F.max("_h"), 4))
        .alias("est_distinct")
    )


def kmv_oracle_sql(
    table: str, key_expr: str, group_cols: list[str], k: int = 256
) -> str:
    """ANSI-SQL mirror of :func:`kmv_distinct` for the DuckDB oracle —
    generated from the same (k, group, key) parameters as the Spark
    plan so the two cannot silently diverge."""
    groups = ", ".join(group_cols)
    return f"""
        WITH pairs AS (
            SELECT DISTINCT {groups},
                   (('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT
                    + 0.5) / {HASH_SPACE!r} AS _h
            FROM {table}
        ), topk AS (
            SELECT *, row_number() OVER (PARTITION BY {groups} ORDER BY _h) AS _rn
            FROM pairs
        )
        SELECT {groups},
               CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                    ELSE round({float(k - 1)!r} / max(_h), 4) END AS est_distinct
        FROM topk WHERE _rn <= {k} GROUP BY {groups}
    """
