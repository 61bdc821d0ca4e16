"""Cross-engine parity of the portable hash recipes every generated
oracle rests on: md5-prefix uniform hash, CMS/Bloom bucket positions,
the 60-bit base hash, and the A-ES/Gumbel uniform — computed by Spark
and DuckDB over the same adversarial inputs and compared bit-for-bit.
A drift in any of these recipes would silently break every hash
oracle at once; this test localizes the failure to the recipe."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.operators.dedup import portable_base_hash
from kubernetes_logs_datalake_spark.operators.sketch import (
    HASH_SPACE,
    cms_bucket,
    uniform_hash,
)

# adversarial keys: empty, unicode, long, numeric-looking, whitespace,
# hex-looking, near-collision prefixes
KEYS = [
    "", "a", "A", "0", "00", "-1", "1e10", " ", "  ", "\t",
    "hello world", "hello  world", "HELLO WORLD",
    "ünïcödé", "中文字符", "emoji 🙂 text", "a" * 1000,
    "0123456789abcdef", "deadbeef", "DEADBEEF",
    "key:with:colons", "3:salted", "null", "None", "NaN",
] + [f"k{i}" for i in range(50)]


def _spark_vals(spark, col_expr):
    df = spark.createDataFrame([(k,) for k in KEYS], "k string")
    return [r.v for r in df.select(col_expr.alias("v")).collect()]


def test_uniform_hash_matches_duckdb(spark):
    got = _spark_vals(spark, uniform_hash("k"))
    want = [
        duckdb.sql(
            "SELECT (('0x' || substring(md5(?), 1, 8))::BIGINT + 0.5) / ?",
            params=[k, float(HASH_SPACE)],
        ).fetchone()[0]
        for k in KEYS
    ]
    assert got == want


def test_cms_bucket_matches_duckdb(spark):
    for j, width in ((0, 64), (3, 1024)):
        got = _spark_vals(spark, cms_bucket("k", j, width))
        want = [
            duckdb.sql(
                f"SELECT ('0x' || substring(md5('{j}:' || ?), 1, 8))::BIGINT % {width}",
                params=[k],
            ).fetchone()[0]
            for k in KEYS
        ]
        assert got == want, (j, width)


def test_portable_base_hash_matches_duckdb(spark):
    got = _spark_vals(spark, portable_base_hash(F.col("k")))
    want = [
        duckdb.sql(
            "SELECT ('0x' || substring(md5(?), 1, 15))::BIGINT", params=[k]
        ).fetchone()[0]
        for k in KEYS
    ]
    assert got == want
