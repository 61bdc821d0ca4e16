"""Delta-format lake option: full round-trip + OPTIMIZE when
delta-spark is installed; import-safety and clear gating when not."""

from __future__ import annotations

import pytest

from kubernetes_logs_datalake_spark.sources.delta_lake import (
    DeltaLogLake,
    delta_available,
)

needs_delta = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed in this env"
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


@needs_delta
def test_delta_roundtrip_and_optimize(spark, tmp_path):
    lake = DeltaLogLake(str(tmp_path / "dlake"))
    lake.write_batch(_records(spark, 20, "a"))
    lake.write_batch(_records(spark, 10, "b"))
    df = lake.read(spark)
    assert df.count() == 30
    lake.compact(spark)
    assert lake.read(spark).count() == 30


def test_delta_unavailable_is_import_safe():
    """Even without delta-spark the module imports and the lake object
    constructs; only use raises, with a clear message."""
    lake = DeltaLogLake("/tmp/never")
    if not delta_available():  # pragma: no cover - env-dependent
        with pytest.raises(ImportError, match="delta-spark"):
            lake.read(None)
