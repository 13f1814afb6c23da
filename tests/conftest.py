from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMALL = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from cascading_hbase_spark.session import get_session

    s = get_session("cascading-hbase-spark-tests")
    yield s
    s.stop()
