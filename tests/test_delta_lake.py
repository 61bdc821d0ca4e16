"""Delta-format lake option: import-safety and gating contract.

This environment has no delta-spark (and no network to fetch its jars),
so the execution path cannot run here; the module documents the
parquet-LogLake + compact_lake substitution. These tests pin what CAN
be checked everywhere: the module imports cleanly, constructs, raises
a clear error on use without delta-spark, and the session builder
refuses rather than producing a half-configured session.
"""

from __future__ import annotations

import pytest

from kubernetes_logs_datalake_spark.sources.delta_lake import (
    DeltaLogLake,
    delta_available,
    delta_session_builder,
)


def _records(spark, n=20, tag="d"):
    from kubernetes_logs_datalake_spark.sources import parse_cri_lines

    raw = spark.createDataFrame(
        [
            (
                "/var/log/pods/qa_p_u/app/0.log",
                f"2024-01-15T10:30:{i:02d}.0Z stdout F {tag}-{i}",
            )
            for i in range(n)
        ],
        ["path", "value"],
    )
    return parse_cri_lines(raw, path_col="path", cluster="c")


def test_lake_roundtrip_and_compaction_contract(spark, tmp_path):
    """ONE storage contract, whichever table format is available: two
    appended batches stay fully readable before and after compaction.
    With delta-spark installed this runs DeltaLogLake + OPTIMIZE; in
    this sandbox (no delta-spark, no network for jars) it runs the
    module's documented substitution — parquet LogLake +
    streaming.ingest.compact_lake — so the delta surface's behavioral
    contract is exercised on every run rather than permanently skipped."""
    if delta_available():  # pragma: no cover - env-dependent
        lake = DeltaLogLake(str(tmp_path / "dlake"))
        lake.write_batch(_records(spark, 20, "a"))
        lake.write_batch(_records(spark, 10, "b"))
        assert lake.read(spark).count() == 30
        lake.compact(spark)
        assert lake.read(spark).count() == 30
    else:
        from kubernetes_logs_datalake_spark.sources.logs import LogLake
        from kubernetes_logs_datalake_spark.streaming.ingest import compact_lake

        root = str(tmp_path / "plake")
        lake = LogLake(root)
        lake.write_batch(_records(spark, 20, "a"))
        lake.write_batch(_records(spark, 10, "b"))
        assert lake.read(spark).count() == 30
        compact_lake(spark, root, min_files=2)
        assert lake.read(spark).count() == 30


def test_delta_unavailable_is_import_safe():
    """Even without delta-spark the module imports and the lake object
    constructs; only use raises, with a clear message."""
    lake = DeltaLogLake("/tmp/never")
    if not delta_available():  # pragma: no cover - env-dependent
        with pytest.raises(ImportError, match="delta-spark"):
            lake.read(None)
        with pytest.raises(ImportError, match="delta-spark"):
            lake.compact(None)


def test_delta_session_builder_gates_clearly():
    if delta_available():  # pragma: no cover - env-dependent
        pytest.skip("delta-spark installed; builder path exercised elsewhere")
    from pyspark.sql import SparkSession

    with pytest.raises(ImportError, match="delta-spark"):
        delta_session_builder(SparkSession.builder)


def test_delta_lake_mirrors_parquet_lake_surface():
    """The documented substitution is mechanical: every public method of
    DeltaLogLake has a parquet-path equivalent with compatible intent.
    Pin the surface so a refactor can't silently break the mapping."""
    from kubernetes_logs_datalake_spark.sources.logs import LogLake

    assert {"write_batch", "read", "read_stream"} <= set(dir(LogLake))
    assert {"write_batch", "read", "read_stream", "compact", "vacuum"} <= set(
        dir(DeltaLogLake)
    )
