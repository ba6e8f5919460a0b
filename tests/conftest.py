from __future__ import annotations

import os

import pytest

from kafka_streams_repartition_spark.session import get_spark

# Tests default to the smallest scale factor for speed; export
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to rehearse the
# driver's gate scale (VERDICT r1 item 4).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
