"""Structured Streaming ingest of CRI container logs into the lake."""

from kubernetes_logs_datalake_spark.streaming.ingest import IngestJob  # noqa: F401
