"""Bucketed tables: co-located, shuffle-free joins at scale.

A 100 TB fact-to-fact join (orders ⋈ lineitem) shuffles both sides
every query unless the tables are pre-partitioned on the join key.
Hive-style bucketing does exactly that: each table is written into N
buckets by key hash (+ optional in-bucket sort); a join between two
tables bucketed the same way reads matching buckets pairwise — no
Exchange in the plan, and with sorted buckets no in-memory sort either.

The write costs one shuffle (paid once); every subsequent join on the
key is scan+merge. This is the batch analog of the ingest layer's
`partitionBy` co-location for log keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally in-bucket sorted)
    managed table. Bucketing requires ``saveAsTable`` (file-path writes
    cannot record bucket metadata)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def assert_no_shuffle_join(spark: SparkSession, left: str, right: str, on: str) -> str:
    """Join two same-bucketed tables and return the physical plan —
    callers assert no Exchange appears (used by tests; also a handy
    diagnostic on a real cluster)."""
    df = spark.table(left).join(spark.table(right), on)
    return df._jdf.queryExecution().executedPlan().toString()
