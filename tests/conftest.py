from __future__ import annotations

import pytest

from kubernetes_logs_datalake_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kld-tests", shuffle_partitions=8)
    yield s
