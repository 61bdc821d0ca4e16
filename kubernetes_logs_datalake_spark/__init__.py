"""PySpark-native analytics engine with the query and data-processing
capabilities of Yolean/kubernetes-logs-datalake.

A brand-new, Spark-first implementation (DataFrame/SQL/Catalyst/Structured
Streaming) of the reference's surface: streaming CRI log ingest to a
partitioned columnar lake (Parquet + Arrow IPC), a label-selector query
front end with partition pruning, nanosecond-exact timestamps, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference lacks.

Layout
------
- ``session``    tuned SparkSession builder
- ``schema``     canonical log schema + constants
- ``functions``  ns-time kernel, text analysis, vector math
- ``sources``    CRI parser, log-lake reader/writer, Arrow IPC, metadata
- ``plans``      selector parser, LogQuery builder, output renderers
- ``operators``  dedup, similarity search, rollups, multimodal
- ``streaming``  ingest job with flush policies
"""

__version__ = "0.1.0"

from kubernetes_logs_datalake_spark.session import get_spark  # noqa: F401
