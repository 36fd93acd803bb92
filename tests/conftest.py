from __future__ import annotations

import pytest

from transaq_clickhouse_exporter_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tce-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_t2() -> str:
    return SF_T2
