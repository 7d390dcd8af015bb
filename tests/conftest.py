import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Shared host calibration (tzspark/hostcal.py): MALLOC_* env exports for the
# JVM + Python workers (this VM stalls multi-second on first-touch faults of
# large fresh mmaps) plus mallopt(3) for THIS process. Must run before the
# JVM starts.
from tzspark import hostcal

hostcal.apply()


@pytest.fixture(scope="session")
def spark():
    from tzspark.engine import get_spark

    s = get_spark(app="tzspark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
