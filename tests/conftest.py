from __future__ import annotations

import pytest

from hw_kafka_streams_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark
    # Do not stop: reuse across test modules in one process.


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
