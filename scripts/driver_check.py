"""Mini replica of the driver's correctness harness: run named queries()
entries at sf0.01 and compare row count + sorted-column value hash against
oracle_sql() via DuckDB. Usage: python scripts/driver_check.py q39 q40 ..."""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF = "/root/testdata/sf0.01"


def value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(v) for v in r) for r in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.blake2b(digest_size=16)
    for r in rows:
        h.update("\x1f".join(r).encode())
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as e
    from tzspark.engine import get_spark

    prefixes = sys.argv[1:]
    spark = get_spark(app="driver-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    bad = 0
    for name in sorted(qs):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        sdf = qs[name](spark, SF).toPandas()
        if name not in osql:
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        ddf = con.sql(osql[name]).df()
        hs, hd = value_hash(sdf.astype(str)), value_hash(ddf.astype(str))
        ok = len(sdf) == len(ddf) and hs == hd
        bad += not ok
        print(f"{name}: rows {len(sdf)}/{len(ddf)} hash_match={hs == hd}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
