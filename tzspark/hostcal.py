"""Host calibration shared by every measured entry point (bench.py,
tests/conftest.py, scripts/check_oracle.py, __spark_entry__.py).

This box has an intermittent host-pressure regime (BASELINE.md rounds 3-4):
first-touch page faults on fresh anonymous mmaps cost 50-600 µs/page instead
of ~1-5 µs, stalling any >128 KiB numpy/Arrow temporary for seconds. Three
countermeasures live here so no harness re-implements them differently:

1. ``apply()`` — export MALLOC_* for child processes (JVM, Python workers)
   AND mallopt(3) the current process (env vars can't retune a running
   glibc). Idempotent.
2. ``fault_probe()`` — the measured first-touch cost in µs per 4 KiB page;
   recorded beside every timing so "the box was noisy" is a checkable
   number, not an excuse.
3. ``wait_calm()`` — bounded wait for the stall window to pass, returning
   the final probe reading; harnesses gate their official numbers on it.
"""

from __future__ import annotations

import os
import time

# probe readings at or under this are the documented calm regime; above it
# the host is stalling and timings measure the host, not the engine
CALM_US_PER_PAGE = 10.0


def apply() -> bool:
    """Env defaults for children + mallopt for this process. Idempotent."""
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))
    from tzspark._malloc import apply_malloc_tuning

    return apply_malloc_tuning()


def fault_probe(size_mb: int = 32) -> float:
    """Measured first-touch cost of a FRESH anonymous mmap, in µs per 4k
    page — this box's dominant noise source. ~1-5 µs = calm, 50-600 µs =
    the documented stall regime."""
    import mmap

    import numpy as np

    mm = mmap.mmap(-1, size_mb << 20)
    buf = np.frombuffer(mm, dtype=np.uint8)
    t0 = time.time()
    buf[::4096] = 1  # one write per page: pure first-touch fault cost
    dt = time.time() - t0
    del buf
    mm.close()
    return round(dt / ((size_mb << 20) / 4096) * 1e6, 2)


def wait_calm(
    threshold_us: float = CALM_US_PER_PAGE,
    max_waits: int = 10,
    sleep_s: float = 30.0,
    size_mb: int = 32,
) -> tuple[float, int]:
    """Probe; while stalled, sleep (bounded) and re-probe. Returns
    (final_probe_us, n_waits). Bounded so callers never hang: if the
    window outlasts the budget the elevated reading is returned and the
    caller records it."""
    waits = 0
    probe = fault_probe(size_mb)
    while probe > threshold_us and waits < max_waits:
        time.sleep(sleep_s)
        waits += 1
        probe = fault_probe(size_mb)
    return probe, waits
