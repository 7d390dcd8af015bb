"""Isolate substring_dedup_200k (bench fixture), min-of-N reps."""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tzspark import hostcal

hostcal.apply()

from pyspark.sql import functions as F

from tzspark.engine import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(reps=4):
    probe, waits = hostcal.wait_calm(threshold_us=15.0, max_waits=8)
    print(f"fault probe {probe} after {waits} waits", flush=True)
    spark = get_spark(app="iso-substr", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    from tzspark.queries_text import substring_dup_spans

    n_docs = 200_000
    tok = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda j: F.when(
            (F.col("id") % 10 == 0) & (j >= 5) & (j <= 20),
            F.concat(
                F.lit("s"),
                ((F.col("id") / 100).cast("long") * 100 + j).cast("string"),
            ),
        ).otherwise(
            F.concat(
                F.lit("w"), F.col("id").cast("string"),
                F.lit("x"), j.cast("string"),
            )
        ),
    )
    docs = spark.range(0, n_docs, 1, max(CPUS * 2, 16)).select(
        F.col("id").alias("doc_id"), F.array_join(tok, " ").alias("text")
    )

    def row():
        return substring_dup_spans(docs, 8).groupBy().agg(
            F.count("*").alias("n_spans"),
            F.sum("span_tokens").alias("s_tokens"),
        )

    print("result:", row().collect(), flush=True)
    spark.catalog.clearCache()
    best = float("inf")
    for i in range(reps):
        t0 = time.time()
        row().count()
        dt = time.time() - t0
        spark.catalog.clearCache()
        best = min(best, dt)
        print(f"rep{i}: {dt:.2f}s (probe {hostcal.fault_probe(8)})", flush=True)
    print(f"BEST substring_dedup_200k: {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
