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

from pyspark.sql import Column, DataFrame, Window
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
    else:
        # an unparsed row's content must survive in message (null time,
        # empty stream/logtag mark it unparsed) — keeping the row but
        # discarding its text would defeat the option's purpose
        parsed = parsed.withColumn(
            "message", F.when(F.col("stream") == "", line).otherwise(F.col("message"))
        )
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

def join_partial_lines(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("namespace", "pod", "container", "stream"),
    order_cols: tuple[str, ...] = ("time_ns",),
    logtag_col: str = "logtag",
    message_col: str = "message",
) -> DataFrame:
    """Reassemble CRI partial lines into logical records.

    Container runtimes split log lines longer than their line buffer
    (16 KiB for containerd) into ``P``-tagged chunks terminated by an
    ``F`` line; Fluent Bit's ``multiline.parser cri`` mode joins them
    (the reference's plain ``Parser cri`` keeps chunks as rows, which
    :func:`parse_cri_lines` mirrors — this operator is the optional
    reassembly pass on top).

    A logical record is a maximal ``P… F`` run within
    (key_cols, ordered by order_cols): the record id is the running
    count of ``F`` tags over strictly-preceding rows, so chunks share
    the id of their terminating ``F`` line. Output per record:
    key_cols, the first chunk's order columns, the concatenated
    ``message``, ``logtag`` ('F', or 'P' for an unterminated trailing
    run), and ``n_chunks``.

    Scale: the window and the groupBy cluster on the same ``key_cols``
    (the groupBy key is a superset, so the exchange introduced for the
    window satisfies the aggregation's clustering — ONE shuffle total),
    and those keys are exactly the lake's partition layout
    (namespace/pod/container), so per-key ordered runs are file-local.
    Chunk order inside a record is pinned with array_sort over
    (order_cols, message) structs — deterministic under ties.
    """
    is_f = (F.col(logtag_col) == "F").cast("long")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.col(c) for c in order_cols], message_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rec = (F.sum(is_f).over(w) - is_f).alias("_rec")
    chunk = F.struct(
        *[F.col(c) for c in order_cols],
        F.col(message_col).alias("_m"),
    )
    grouped = (
        df.select(*key_cols, rec, F.col(logtag_col), chunk.alias("_chunk"))
        .groupBy(*key_cols, "_rec")
        .agg(
            F.array_sort(F.collect_list("_chunk")).alias("_chunks"),
            F.max(is_f).alias("_terminated"),
        )
    )
    first = F.element_at(F.col("_chunks"), 1)
    return grouped.select(
        *key_cols,
        *[first[c].alias(c) for c in order_cols],
        F.array_join(
            F.transform(F.col("_chunks"), lambda s: s["_m"]), ""
        ).alias(message_col),
        F.when(F.col("_terminated") == 1, F.lit("F"))
        .otherwise(F.lit("P"))
        .alias(logtag_col),
        F.size(F.col("_chunks")).alias("n_chunks"),
    )


def cri_rejects(
    lines: DataFrame,
    *,
    line_col: str = "value",
    max_line_bytes: int = DEFAULT_MAX_LINE_BYTES,
) -> DataFrame:
    """Dead-letter view: exactly the rows :func:`parse_cri_lines`
    drops, each with a machine-readable reason — ``too_long`` (the
    Skip_Long_Lines guard) or ``unparsed`` (no CRI shape). Routing
    these to a quarantine sink instead of silently losing them is the
    ingest-quality contract a production pipeline adds on top of the
    reference's fail-out-of-stream behavior; by construction
    ``parse_cri_lines(df).count() + cri_rejects(df).count() ==
    df.count()`` (same regex, same guard — the partition invariant is
    pytest-asserted).

    Output: the input columns plus ``reject_reason``. Map-only."""
    line = F.col(line_col)
    reason = F.when(
        F.octet_length(line) > max_line_bytes, F.lit("too_long")
    ).when(
        F.regexp_extract(line, CRI_LINE_REGEX, 2) == "", F.lit("unparsed")
    )
    return (
        lines.withColumn("reject_reason", reason)
        .filter(F.col("reject_reason").isNotNull())
    )
