from __future__ import annotations

import pytest

from data_ingestion_resolution_platform_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dirp_tests", parallelism=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
