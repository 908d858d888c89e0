from __future__ import annotations

import pytest

from gdal_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gdal_spark_tests", cores=8, shuffle_partitions=8)
    yield s
