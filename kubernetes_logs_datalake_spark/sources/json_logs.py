"""JSON-lines log records → typed columnar table (SURVEY §2.1 S10).

The reference's compression hook feeds buffered JSON lines through the
Arrow JSON reader before compaction (reference
``apply-compact-compression.sh:42-46,97-101``); records look like::

    {"time":"2024-01-15T10:30:45.123456789Z","stream":"stdout",
     "logtag":"F","message":"hello","cluster":"test"}

Spark equivalent: ``from_json`` with the explicit 5-field schema (never
schema inference in production — one malformed line must not flip a
column type), then the ns kernel parses ``time``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kubernetes_logs_datalake_spark.functions.time_ns import cri_ts_to_ns, ns_to_timestamp

JSON_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("time", T.StringType()),
        T.StructField("stream", T.StringType()),
        T.StructField("logtag", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("cluster", T.StringType()),
    ]
)


def parse_json_log_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """One JSON record per line → canonical columns. Unparseable lines
    yield null fields (from_json's PERMISSIVE mode), mirroring the
    Arrow JSON reader's tolerance."""
    rec = F.from_json(F.col(line_col), JSON_RECORD_SCHEMA).alias("r")
    out = lines.select(rec).select("r.*")
    return (
        out.withColumn("time_ns", cri_ts_to_ns("time"))
        .withColumn("time", ns_to_timestamp("time_ns"))
        .select("time_ns", "time", "stream", "logtag", "message", "cluster")
    )
