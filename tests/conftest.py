import pytest


@pytest.fixture(scope="session")
def spark():
    from tzspark.engine import get_spark

    s = get_spark(app="tzspark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
