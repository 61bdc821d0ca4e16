"""Sources and sinks: CRI log parsing, the partitioned log lake
(Parquet + Arrow IPC), and file-metadata introspection."""

from kubernetes_logs_datalake_spark.sources.cri import parse_cri_lines  # noqa: F401
from kubernetes_logs_datalake_spark.sources.logs import LogLake  # noqa: F401
