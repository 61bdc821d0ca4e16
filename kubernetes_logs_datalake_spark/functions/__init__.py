"""Column-level function library (all JVM-side built-ins; no Python UDFs
in any hot path)."""

from kubernetes_logs_datalake_spark.functions.time_ns import (  # noqa: F401
    cri_ts_to_ns,
    fmt_ns_iso,
    ns_to_timestamp,
    since_cutoff_predicate,
)
