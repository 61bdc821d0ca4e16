"""Round-7 regression tests for the round-6 ADVICE findings, plus
tests for the round-7 operators added later in the round.

Each advice fix gets the failing case the advice described:
  - docs_quality_calibrated oracle: singleton source group must KEEP
    its only row on both engines (the operator always kept it; the
    oracle used to drop it).
  - jaccard_prefix_join: a threshold that rounds UP at 4 dp (2/3) must
    stay lossless vs the brute-force join.
  - table_profile: DATE columns get real extrema (epoch µs of midnight
    UTC), mirrored by the generated DuckDB oracle.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


# ------------------------------------------- calibrated-keep singleton


def test_quality_calibrated_singleton_source_parity(spark, tmp_path):
    """A source with exactly one document: the operator keeps it
    (percent_rank 0 would otherwise drop a source's only — by
    definition best — doc); the oracle must agree engine-for-engine."""
    rows = [
        (1, "alpha beta gamma delta", "en", "crawl", 22),
        (2, "epsilon zeta eta theta", "en", "crawl", 22),
        (3, "iota kappa lambda mu nu xi", "en", "crawl", 26),
        (4, "omicron pi rho sigma", "en", "crawl", 20),
        (5, "the lone curated document", "en", "curated", 25),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = entrymod._docs_quality_calibrated(spark, str(tmp_path)).collect()
    keep = {r.doc_id: r.keep for r in got}
    assert keep[5] is True  # singleton group always kept

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orows = con.execute(
        entrymod.oracle_sql()["docs_quality_calibrated"]
    ).fetchall()
    okeep = {r[0]: r[4] for r in orows}
    assert okeep[5] is True
    assert okeep == keep


# --------------------------------- lossless prefix bound at 2/3


def test_prefix_join_lossless_at_threshold_two_thirds(spark):
    """threshold=2/3 rounds UP at 4 dp (0.6667): the old basis-point
    round() shortened the prefix below the PPJoin bound and dropped
    the exactly-at-threshold pair. Constructed so doc A's lossless
    prefix is its first TWO canonical shingles while the rounded-up
    bound kept only one: A = {c,a,b} (c unique so rarest-first), B =
    {a,b}; |A∩B| = 2, |A∪B| = 3 → jaccard exactly 2/3."""
    from kubernetes_logs_datalake_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(1, "c a b"), (2, "a b")], "doc_id long, text string"
    )
    t = 2.0 / 3.0
    brute = {
        (r.id_a, r.id_b): round(r.jaccard, 4)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=t).collect()
    }
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_prefix_join(df, "doc_id", "text", n=1, threshold=t).collect()
    }
    assert brute == {(1, 2): round(t, 4)}
    assert fast == brute


def test_prefix_join_lossless_fuzz_thresholds(spark):
    """Sweep awkward thresholds (round-up and round-down at 4 dp) over
    a corpus with planted dup clusters: prefix join == brute force."""
    from kubernetes_logs_datalake_spark.operators.dedup import (
        jaccard_prefix_join,
        ngram_jaccard_pairs,
    )

    docs = []
    for i in range(24):
        base = f"w0 w1 w2 u{i} v{i}"
        docs.append((2 * i, base))
        if i % 4 == 0:
            docs.append((2 * i + 1, base + f" x{i}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in [1.0 / 3.0, 2.0 / 3.0, 5.0 / 6.0, 0.55555]:
        brute = {
            (r.id_a, r.id_b): round(r.jaccard, 4)
            for r in ngram_jaccard_pairs(
                df, "doc_id", "text", n=1, threshold=t
            ).collect()
        }
        fast = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_prefix_join(
                df, "doc_id", "text", n=1, threshold=t
            ).collect()
        }
        assert fast == brute, t


# ------------------------------------------------- DATE extrema


def test_table_profile_date_extrema(spark):
    from kubernetes_logs_datalake_spark.operators.profile import table_profile

    d = spark.createDataFrame(
        [(1, "2021-03-05"), (2, "2020-01-01"), (3, None)],
        "k long, ds string",
    ).select("k", F.col("ds").cast("date").alias("d"))
    prof = {r.column_name: r for r in table_profile(d).collect()}
    row = prof["d"]
    assert row.n_nulls == 1 and row.n_distinct == 2
    # midnight UTC epoch-µs of the min/max dates
    assert row.min_value == 1577836800.0 * 1e6
    assert row.max_value == 1614902400.0 * 1e6


def test_table_profile_date_oracle_parity(spark, tmp_path, monkeypatch):
    """End-to-end: profile orders with o_orderdate cast to a true DATE
    and check the generated DuckDB oracle (kind='date') matches."""
    from kubernetes_logs_datalake_spark.operators.profile import table_profile

    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("o_odate"))
    )
    o.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.column_name: (r.n_rows, r.n_nulls, r.n_distinct, r.min_value, r.max_value)
        for r in table_profile(o).collect()
    }
    monkeypatch.setattr(
        entrymod,
        "_ORDERS_PROFILE_COLS",
        [("o_orderkey", "num"), ("o_odate", "date")],
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(entrymod._ddb_table_profile_sql()).fetchall()
    }
    assert got == want
