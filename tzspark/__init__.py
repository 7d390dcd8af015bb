"""tzspark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query semantics of evanoberholster/timezoneLookup
(/root/reference, Go, single-node mmap + R-tree) as a distributed
broadcast point-in-polygon join: driver-compiled compact cell cover,
broadcast to executors, probed by vectorized pandas/Arrow UDFs — no
per-row Python. See SURVEY.md for the full design mapping.
"""

__version__ = "0.1.0"
