from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from europarl_crawler_spark import get_spark

    s = get_spark("europarl-crawler-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
