from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from openie_spark.session import get_spark

    s = get_spark(app_name="openie-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def rows(df):
    return [tuple(r) for r in df.collect()]
