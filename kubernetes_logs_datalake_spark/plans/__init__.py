"""Query planning: PromQL-style selector parsing, the LogQuery builder
(the engine's y-logcli-equivalent logical plan), and output renderers."""

from kubernetes_logs_datalake_spark.plans.logquery import LogQuery  # noqa: F401
from kubernetes_logs_datalake_spark.plans.selector import parse_selector  # noqa: F401
