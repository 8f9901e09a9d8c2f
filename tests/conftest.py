from __future__ import annotations

import pytest

from hands_on_iceberg_compression_spark.session import make_session

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = make_session(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
