from __future__ import annotations

import pytest

from pandas_streaming_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"  # unit/differential scale (fast)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pss-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
