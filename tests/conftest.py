import os

import pytest

# See bench.py: this VM's kernel intermittently stalls multi-second on
# first-touch faults of large fresh mmaps; keep glibc reusing heap blocks so
# numpy/Arrow temporaries in workers hit already-faulted pages. Must be set
# before the JVM (and its Python workers) start.
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ...and the env vars cannot retune THIS process (glibc read them before
# Python started), so apply the same tunables via mallopt(3) for driver-side
# numpy work (cover compile, kNN table):
from tzspark._malloc import apply_malloc_tuning

apply_malloc_tuning()


@pytest.fixture(scope="session")
def spark():
    from tzspark.engine import get_spark

    s = get_spark(app="tzspark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
