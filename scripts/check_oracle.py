"""Mimic the driver's correctness gate: run each queries()[name] in Spark and
the matching oracle_sql()[name] in DuckDB at sf0.01; compare row count,
column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod  # applies tzspark.hostcal on import
from tzspark import hostcal

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    if len(df) == 0:
        return "EMPTY"
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Same calm preamble as bench.py (VERDICT r4 item 6): a correctness run
    # started inside a stall window can take 5-15x longer per query and trip
    # external timeouts; wait (bounded) for calm and record the reading.
    probe, waits = hostcal.wait_calm(threshold_us=40.0, max_waits=6)
    print(f"host fault probe: {probe} us/page after {waits} calm-waits")

    from tzspark.engine import get_spark

    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    fails = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            fails.append(name)
            continue
        if name not in osql:
            print(f"ok   {name}: rows-only, {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: DUCKDB ERROR {type(ex).__name__}: {str(ex)[:300]}")
            fails.append(name)
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        elif canon(sdf) != canon(ddf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            if "value-hash mismatch" in problems and len(sdf) == len(ddf):
                s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
                d = ddf[sorted(ddf.columns)].sort_values(sorted(ddf.columns)).reset_index(drop=True)
                neq = (s.astype(str) != d.astype(str)).any(axis=1)
                print("  spark:", s[neq].head(3).to_dict("records"))
                print("  duck :", d[neq].head(3).to_dict("records"))
            fails.append(name)
        else:
            print(f"PASS {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL PASS")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
