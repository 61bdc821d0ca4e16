"""CRI container-log line parsing.

A CRI runtime writes one line per log record to
``/var/log/pods/<namespace>_<pod>_<pod_uid>/<container>/N.log``::

    2024-01-15T10:30:45.123456789Z stdout F hello world

The reference structures this with Fluent Bit's ``cri`` parser plus a
``Tag_Regex`` over the file path (reference
``k3d-example/fluentbit/fluent-bit.conf:11-14,23-24``). Here the same
semantics are a handful of ``regexp_extract`` projections — fully
JVM-side, codegen-friendly, and applied identically in batch and
Structured Streaming (the plan is the same; only the source differs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kubernetes_logs_datalake_spark.functions.time_ns import cri_ts_to_ns, ns_to_timestamp
from kubernetes_logs_datalake_spark.schema import CRI_LINE_REGEX

# Mirrors the reference Tag_Regex (fluent-bit.conf:12-14):
# /var/log/pods/(?<namespace_name>[^_/]+)_(?<pod_name>[^_/]+)_(?<pod_id>[^_/]+)/(?<container_name>[^/]+)/...
CRI_PATH_REGEX = r"/var/log/pods/([^_/]+)_([^_/]+)_([^_/]+)/([^/]+)/[^/]+$"

# Default guard against pathological lines (reference Skip_Long_Lines On
# with Buffer_Max_Size 2M, fluent-bit.conf:18-21).
DEFAULT_MAX_LINE_BYTES = 2 * 1024 * 1024


def path_dims(path: Column | str) -> dict[str, Column]:
    """Derive namespace/pod/container (and pod_uid) from a CRI log path."""
    c = F.col(path) if isinstance(path, str) else path
    return {
        "namespace": F.regexp_extract(c, CRI_PATH_REGEX, 1),
        "pod": F.regexp_extract(c, CRI_PATH_REGEX, 2),
        "pod_uid": F.regexp_extract(c, CRI_PATH_REGEX, 3),
        "container": F.regexp_extract(c, CRI_PATH_REGEX, 4),
    }


def parse_cri_lines(
    lines: DataFrame,
    *,
    line_col: str = "value",
    path_col: str | None = None,
    cluster: str = "",
    node: str = "",
    max_line_bytes: int = DEFAULT_MAX_LINE_BYTES,
    keep_unparsed: bool = False,
) -> DataFrame:
    """Structure raw CRI lines into the canonical log record.

    Produces ``time_ns, time, stream, logtag, message, cluster`` plus the
    path-derived ``namespace, pod, container`` (and ``node``) dimensions
    when ``path_col`` is given. Lines that do not match the CRI shape are
    dropped unless ``keep_unparsed`` (the reference's parser simply fails
    them out of the stream); over-long lines are always dropped
    (``Skip_Long_Lines``).
    """
    line = F.col(line_col)
    parsed = lines.filter(F.octet_length(line) <= max_line_bytes).select(
        "*",
        F.regexp_extract(line, CRI_LINE_REGEX, 1).alias("_ts"),
        F.regexp_extract(line, CRI_LINE_REGEX, 2).alias("stream"),
        F.regexp_extract(line, CRI_LINE_REGEX, 3).alias("logtag"),
        F.regexp_extract(line, CRI_LINE_REGEX, 4).alias("message"),
    )
    if not keep_unparsed:
        parsed = parsed.filter(F.col("stream") != "")
    out = parsed.withColumn("time_ns", cri_ts_to_ns("_ts")).withColumn(
        "time", ns_to_timestamp("time_ns")
    )
    out = out.withColumn("cluster", F.lit(cluster)).withColumn("node", F.lit(node))
    if path_col is not None:
        for name, col in path_dims(path_col).items():
            out = out.withColumn(name, col)
    keep = ["time_ns", "time", "stream", "logtag", "message", "cluster", "node"]
    if path_col is not None:
        keep += ["namespace", "pod", "container"]
    return out.select(*keep)
