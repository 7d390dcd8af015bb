"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "throughput_rows_sec": ...}

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32).

The image table (BASELINE.json input_hint shape, 10^9-row shape scaled down
to $SPARK_GRAFT_BENCH_ROWS, default 1M) is synthesized once and cached as
parquet under .bench_cache/ — queries then READ PARQUET, so timings measure
the engine, not fixture generation.

Scaling evidence (north_rule, sandbox form — no real cluster): run
  python bench.py --scaling
to execute the flagship pipeline at local[8] and local[32] in separate
processes on the SAME cached input and print throughput at both plus
efficiency = (thr32/thr8)/4. Single-run child mode: --single-run CPUS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

# Shared host calibration (tzspark/hostcal.py): MALLOC_* env exports for the
# JVM + Python workers, mallopt(3) for THIS process, and the fault-probe /
# calm-wait primitives this box's stall regime demands (BASELINE.md r3-r4).
from tzspark import hostcal
from tzspark.hostcal import CALM_US_PER_PAGE, fault_probe

hostcal.apply()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))
CACHE = os.path.join(_REPO, ".bench_cache")


def _sf_tag() -> str:
    return os.path.basename(SF_DIR.rstrip("/")) + f"_{N_ROWS}"


def images_path() -> str:
    return os.path.join(CACHE, f"images_{_sf_tag()}.parquet")


def ensure_images(spark) -> str:
    """Synthesize + cache the image table once (deterministic in row index)."""
    path = images_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from tzspark.datasets import images_df

        images_df(spark, N_ROWS, partitions=max(CPUS * 2, 16)).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def ensure_points(spark, images) -> str:
    """Extract + cache the (image_id, lat, lng) point table once, so the
    distance-join headline times the JOIN, not the GPS extraction (which
    pipeline_lookup already times)."""
    path = os.path.join(CACHE, f"points_{_sf_tag()}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F

        from tzspark.engine import extract_gps_udf, gps_header_col

        g = images.withColumn(
            "g", extract_gps_udf()(gps_header_col(F.col("bytes")))
        )
        g.where(F.col("g.gps_ok")).select(
            "image_id", F.col("g.lat").alias("lat"), F.col("g.lng").alias("lng")
        ).write.mode("overwrite").parquet(path)
    return path


SQ8_ROWS = int(os.environ.get("SPARK_GRAFT_SQ8_ROWS", "1000000"))


def ensure_sq8(spark):
    """Synthesize SQ8_ROWS x 64 embeddings, train per-dim stats (one Spark
    pass), encode to packed-binary codes, cache codes parquet + stats.
    Returns (codes_path, mins, spans, probes[8 x 64 float64])."""
    import numpy as np

    from tzspark.datasets import embeddings_df, synth_embeddings
    from tzspark.queries_text import sq8_encode_arrow, sq8_stats_np

    path = os.path.join(CACHE, f"sq8codes_{SQ8_ROWS}.parquet")
    stats = os.path.join(CACHE, f"sq8stats_{SQ8_ROWS}.npz")
    if not (os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(stats)):
        e = embeddings_df(spark, SQ8_ROWS, partitions=max(CPUS * 2, 16))
        mins, spans = sq8_stats_np(e)
        sq8_encode_arrow(e, mins, spans).write.mode("overwrite").parquet(path)
        np.savez(stats, mins=mins, spans=spans)
    z = np.load(stats)
    probes = synth_embeddings(np.arange(8), 64).astype(np.float64)
    return path, z["mins"], z["spans"], probes


def ensure_pq(spark):
    """Train a 256-centroid PQ codebook on the first 2048 vectors (the
    standard sampled-train shape), encode SQ8_ROWS x 64 embeddings to
    packed 8-byte codes, cache codes parquet + codebook. Returns
    (codes_path, cent[8 x 256 x 8], probes[8 x 64 float64])."""
    import numpy as np

    from tzspark.datasets import embeddings_df, synth_embeddings
    from tzspark.queries_text import pq_encode_arrow, pq_train_np

    path = os.path.join(CACHE, f"pqcodes_{SQ8_ROWS}.parquet")
    cb = os.path.join(CACHE, f"pqcent_{SQ8_ROWS}.npy")
    if not (os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(cb)):
        e = embeddings_df(spark, SQ8_ROWS, partitions=max(CPUS * 2, 16))
        cent = pq_train_np(e, sample_n=2048, m=8, n_cent=256)
        pq_encode_arrow(e, cent).write.mode("overwrite").parquet(path)
        np.save(cb, cent)
    probes = synth_embeddings(np.arange(8), 64).astype(np.float64)
    return path, np.load(cb), probes


def run_pipeline(spark, images):
    """The flagship lookup: extract -> cell encode -> broadcast cover probe
    (resolve + kNN one pass) -> tzid broadcast join -> per-zone rollup."""
    from tzspark.engine import assign_timezones, broadcast_cover, zone_dim_df
    from tzspark.zones import make_zones

    zones = make_zones(n_coast=20000)
    idx_b, _ = broadcast_cover(spark, zones)
    dim = zone_dim_df(spark, zones)
    assigned = assign_timezones(images, idx_b, dim)
    from pyspark.sql import functions as F

    return assigned.groupBy("zone_id", "tzid").agg(
        F.count("*").alias("n_images"),
        F.sum(F.col("via_knn").cast("long")).alias("n_via_knn"),
    )


def headline_queries(spark, images):
    """name -> thunk returning a DataFrame to fully materialize."""
    from pyspark.sql import functions as F

    from tzspark.engine import (
        assign_timezones,
        broadcast_cover,
        salted_tile_counts,
        tile_rollup_fused,
        zone_dim_df,
    )
    from tzspark.queries_geo import (
        q05_knn_fallback,
        q11_resolve_cover,
        q39_resolve_join,
    )
    from tzspark.queries_text import q14_ngram_jaccard, q21_ann_bruteforce
    from tzspark.zones import make_world_zones, make_zones

    zones = make_zones(n_coast=20000)
    idx_b, _ = broadcast_cover(spark, zones)
    dim = zone_dim_df(spark, zones)

    # reference-operating-point zone set (1,200 tzids / 24k polygons / 4.8M
    # vertices — README.md:9 scale); compile is cached by content hash so the
    # bench times the LOOKUP, not the one-off build (compile time is pinned
    # separately in tests/test_world_scale.py and BASELINE.md)
    from tzspark.api import TimezoneLookup

    tl_world = TimezoneLookup(
        make_world_zones(), cache_dir=os.path.join(CACHE, "covers")
    )
    idx_bw = spark.sparkContext.broadcast(tl_world.idx)
    dim_w = zone_dim_df(spark, tl_world.zones)

    def _assigned():
        return assign_timezones(images, idx_b, dim)

    def _world_lookup():
        from pyspark.sql import functions as F

        return assign_timezones(images, idx_bw, dim_w).groupBy("tzid").agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("via_knn").cast("long")).alias("n_via_knn"),
        )

    # the broadcast-FREE path at the same reference operating point: cover
    # persisted as parquet tables (one-off, content-hash cached), lookup is
    # cell-id equi-joins — the apples-to-apples row against
    # lookup_world_zones for the zone-sets-past-the-broadcast-budget regime
    def _world_lookup_join():
        from pyspark.sql import functions as F

        return tl_world.assign_join(
            spark, images, cache_dir=os.path.join(CACHE, "covers")
        ).groupBy("tzid").agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("via_knn").cast("long")).alias("n_via_knn"),
        )

    # MULTI-TENANT at world scale: two world-size zone sets unioned into one
    # tenant-keyed cover (covertable.union_tenants), resolved for a mixed
    # image stream in a single shuffle-partitioned job — the regime where
    # per-tenant broadcasts are impossible by construction (2x the world
    # cover could never broadcast). Cover DataFrames are built once here;
    # the thunk times the probe joins + rollup, matching how
    # world_lookup_join treats its cover as a prebuilt table.
    from tzspark.covertable import CoverTables, assign_images_via_join

    # bucketed on (tenant, ..., cell): the 2x-world cover (415 MB as plain
    # parquet) never re-exchanges — doubly important here since multi-tenant
    # is by definition the past-the-broadcast-budget regime
    mt_prefix = "covbmt2_" + tl_world._content_key()[:16]
    if not CoverTables.bucketed_exists(spark, mt_prefix):
        CoverTables.union_tenants(
            spark, {"a": tl_world.idx, "b": tl_world.idx}
        ).save_bucketed(spark, mt_prefix, n_buckets=max(CPUS, 32))
    cov_mt = CoverTables.load_bucketed(spark, mt_prefix)

    # BUCKETED cover layout: the same broadcast-free lookup with the cover
    # bucketed+sorted on its probe join keys — every probe then shuffles
    # ONLY the narrow points side; the ~208 MB cover never re-exchanges
    # (write-once, probe-many). The apples-to-apples row against
    # world_lookup_join isolates the cover-shuffle cost.
    bprefix = "covb_" + tl_world._content_key()[:16]
    if not CoverTables.bucketed_exists(spark, bprefix):
        tl_world.cover_tables(
            spark, os.path.join(CACHE, "covers")
        ).save_bucketed(spark, bprefix, n_buckets=max(CPUS, 32))
    cov_wb = CoverTables.load_bucketed(spark, bprefix)

    def _world_lookup_join_bucketed():
        return assign_images_via_join(images, cov_wb).groupBy("zone_id").agg(
            F.count("*").alias("n_images")
        )

    def _multi_tenant():
        t_images = images.withColumn(
            "tenant",
            F.when(F.crc32(F.col("image_id")) % 2 == 0, "a").otherwise("b"),
        )
        return assign_images_via_join(t_images, cov_mt).groupBy(
            "tenant", "zone_id"
        ).agg(F.count("*").alias("n_images"))

    from tzspark.engine import lookup_tile_onepass

    # distance self-join over the full image point set (geo near-dup,
    # "same spot" = within ~1.1 km). 80% of the points sit in 0.5-degree
    # hot blobs, so the radius/res pair governs the candidate volume:
    # r=0.05/res10 produced ~10^8 true pairs (196 s — the output itself,
    # not the join, was the cost); r=0.01/res12 keeps the same operator and
    # skew regime at ~25x fewer candidates
    pts = spark.read.parquet(ensure_points(spark, images))

    def _proximity():
        from tzspark.covertable import proximity_self_join

        return proximity_self_join(
            pts, "image_id", radius=0.01, res=12
        ).groupBy().agg(
            F.count("*").alias("n_pairs"), F.sum("dist2").alias("s")
        )

    # SQ8 vector search over 1M synthesized embeddings: packed-binary codes
    # (4x smaller than float32 — the storage path for 10^12-vector corpora)
    # scanned once, per-batch dequant + matmul, partition-local top-k
    codes_path, sq_mins, sq_spans, sq_probes = ensure_sq8(spark)
    codes = spark.read.parquet(codes_path)

    def _sq8_search():
        from tzspark.queries_text import sq8_topk_arrow

        return sq8_topk_arrow(codes, sq_mins, sq_spans, sq_probes, k=10)

    pq_path, pq_cent, pq_probes = ensure_pq(spark)
    pq_codes = spark.read.parquet(pq_path)

    def _pq_search():
        from tzspark.queries_text import pq_adc_topk_arrow

        return pq_adc_topk_arrow(pq_codes, pq_cent, pq_probes, k=10)

    def _patchify():
        # ViT patch extraction over the full 1M-image payload: one
        # mapInArrow fold; the agg forces every patch sum without shipping
        # the ~12M-row patch table to the driver
        from tzspark.imageops import patchify

        return (
            patchify(images, patch=8)
            .groupBy()
            .agg(
                F.count("*").alias("n_patches"),
                F.sum("sum_r").alias("s_r"),
                F.sum("sum_g").alias("s_g"),
                F.sum("sum_b").alias("s_b"),
            )
        )

    def _ahash():
        # perceptual-hash pass over the full payload + the exact-collision
        # collapse — the front half of the image dedup pipeline (q81)
        from tzspark.imageops import image_ahash

        return (
            image_ahash(images.select("image_id", "bytes"))
            .groupBy("b0", "b1", "b2", "b3")
            .agg(F.count("*").alias("n"), F.min("image_id").alias("rep"))
            .groupBy()
            .agg(F.count("*").alias("n_distinct"), F.sum("n").alias("n_imgs"))
        )

    def _sharpness():
        # q103's gradient-energy curation gate over the full 1M payload —
        # the heaviest per-pixel kernel (every neighbor pair touched), so
        # it bounds the Arrow decode+fold family from above
        from tzspark.imageops import image_gradient_energy
        from tzspark.queries_extra import _SHARP_T

        g = image_gradient_energy(images.select("image_id", "bytes"))
        return g.groupBy().agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("grad_sum") > F.lit(_SHARP_T) * F.col("n_edges"))
                .cast("long")
            ).alias("n_keep"),
        )

    # --- round-5 world-scale rows for the shuffle-heavy spatial designs
    # (VERDICT r4 item 7): overlay at 10^5 pairs, DBSCAN and co-location
    # at 10^6 points — the operators whose skew behavior matters at 100x.
    geo_rows = int(os.environ.get("SPARK_GRAFT_GEO_ROWS", "1000000"))

    def _overlay_100k():
        # G x G lattice of boxes + a half-pitch-shifted copy: every
        # interior B box overlaps exactly 4 A boxes -> ~4*G^2 = 102k pairs
        import numpy as np

        from tzspark.cells import Zone
        from tzspark.queries_geo import overlay_join_zones

        G, s = 160, 120.0 / 160
        za, zb = [], []
        f32 = np.float32
        for i in range(G):
            la0 = -60.0 + i * s
            for j in range(G):
                lg0 = -60.0 + j * s
                ring_lat = np.array([la0, la0, la0 + s, la0 + s], f32)
                ring_lng = np.array([lg0, lg0 + s, lg0 + s, lg0], f32)
                zid = i * G + j
                za.append(Zone(zid, f"A/{zid}", ring_lat, ring_lng))
                zb.append(
                    Zone(
                        1_000_000 + zid, f"B/{zid}",
                        ring_lat + f32(s / 2), ring_lng + f32(s / 2),
                    )
                )
        return (
            overlay_join_zones(spark, za, zb, grid_bits=6)
            .groupBy()
            .agg(F.count("*").alias("n_pairs"), F.sum("inter_area").alias("area"))
        )

    def _geo_pts(n, hot_frac_mod=0):
        # deterministic synthetic point stream (no RNG, partition-stable);
        # hot_frac_mod=k sends every k-th point to ONE location (urban-core
        # skew) so the blocked joins see a genuinely hot cell
        base = spark.range(0, n, 1, max(CPUS * 4, 32)).select(
            F.col("id").alias("event_id"),
            F.pmod(F.col("id") * 31, F.lit(5000)).alias("user_id"),
            F.timestamp_seconds(F.pmod(F.col("id") * 17, F.lit(86400))).alias("ts"),
            ((F.pmod(F.col("id") * 7919, F.lit(120000)) / 1000.0) - 60.0).alias("lat"),
            ((F.pmod(F.col("id") * 104729, F.lit(320000)) / 1000.0) - 160.0).alias("lng"),
        )
        if hot_frac_mod:
            hot = F.pmod(F.col("event_id"), F.lit(hot_frac_mod)) == 0
            base = base.select(
                "event_id", "user_id", "ts",
                F.when(hot, 12.3456 + F.col("event_id") / 1e9).otherwise(F.col("lat")).alias("lat"),
                F.when(hot, 45.6789 + F.col("event_id") / 1e9).otherwise(F.col("lng")).alias("lng"),
            )
        return base

    def _clustered_pts(n):
        # planted-cluster stream, deterministic: 60% of points form 10k
        # compact blobs (60 pts inside ~0.04 deg, centers on a 100x100
        # grid spaced 1.2x3.2 deg — far beyond eps, so components stay
        # cluster-sized), 40% background at ~0.08 expected eps-neighbors
        # (noise). This is the regime DBSCAN exists for; a uniform 1M-point
        # stream at eps=0.3 degenerates into ONE million-node component
        # whose CC is a pathology benchmark, not a clustering one.
        k = n * 6 // 10
        cid = (F.col("id") / 60).cast("long")
        clat = (F.pmod(cid, F.lit(100)) * 1.2 - 60.0) + 0.1
        clng = (F.pmod((cid / 100).cast("long"), F.lit(100)) * 3.2 - 160.0) + 0.1
        # blob spread ~= eps (not << eps): each point pairs with a NEIGHBOR
        # subset of its blob, not the whole blob — ~4x fewer eps-pairs than
        # a fully-clique blob, which keeps the row's rep cost inside the
        # bench budget while still core-labeling the planted mass
        olat = (F.pmod(F.col("id") * 7919, F.lit(100)) - 50) / 1000.0
        olng = (F.pmod(F.col("id") * 104729, F.lit(100)) - 50) / 1000.0
        blobs = spark.range(0, k, 1, max(CPUS * 4, 32)).select(
            F.col("id").alias("event_id"),
            (clat + olat).alias("lat"), (clng + olng).alias("lng"),
        )
        bg = spark.range(k, n, 1, max(CPUS * 2, 16)).select(
            F.col("id").alias("event_id"),
            ((F.pmod(F.col("id") * 7919, F.lit(120000)) / 1000.0) - 60.0).alias("lat"),
            ((F.pmod(F.col("id") * 104729, F.lit(320000)) / 1000.0) - 160.0).alias("lng"),
        )
        return blobs.unionAll(bg)

    def _dbscan_300k():
        # 300k planted points per rep: the 1M form of the SAME row measures
        # 81-97 s/rep (the CC rounds over 600k core nodes dominate, not the
        # pair join) — validated twice at 1M (roles 601498/545 core/border,
        # BASELINE.md round 5) but too heavy for a min-of-3 recurring bench;
        # 300k keeps the identical operator shape inside the rep budget
        from tzspark.covertable import geo_dbscan

        return (
            geo_dbscan(
                _clustered_pts(min(geo_rows, 300_000)), "event_id",
                eps=0.05, min_pts=4, res=10,
            )
            .groupBy("role")
            .agg(F.count("*").alias("n"), F.sum("cluster_id").alias("s"))
        )

    def _coloc_1m():
        from tzspark.covertable import colocation_pairs

        return (
            colocation_pairs(
                _geo_pts(geo_rows, hot_frac_mod=50), "event_id", "user_id", "ts",
                radius=0.1, window_s=600, res=10,
            )
            .groupBy()
            .agg(F.count("*").alias("n_pairs"), F.round(F.avg("dist2"), 6).alias("avg_d2"))
        )

    def _substring_dedup():
        # the text-dedup family's scale row: 200k synthetic docs x 40
        # tokens (6.6M shingle postings through the q101 pipeline); every
        # 10th doc carries a 16-token span shared within its 100-doc block
        # (planted ground truth: exactly 20k duplicated spans, 320k span
        # tokens), the rest of the token stream is doc-unique so only real
        # spans survive the >= 2-distinct-docs postings mark
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
                # doc-unique background token (id and j both in the name):
                # no cross-doc shingle can repeat outside the planted
                # spans, so the ground truth is exact — 20k spans of 16
                F.concat(
                    F.lit("w"), F.col("id").cast("string"),
                    F.lit("x"), j.cast("string"),
                )
            ),
        )
        docs = spark.range(0, n_docs, 1, max(CPUS * 2, 16)).select(
            F.col("id").alias("doc_id"), F.array_join(tok, " ").alias("text")
        )
        return substring_dup_spans(docs, 8).groupBy().agg(
            F.count("*").alias("n_spans"),
            F.sum("span_tokens").alias("s_tokens"),
        )

    def _resample_1m():
        # the q105 shuffle shape at 1M fixes / 5k users: ONE user Exchange
        # feeds the LEAD window, then the hour-grid Generate explodes
        # output-proportionally — the window+explode family's scale row
        from pyspark.sql import Window as W

        H = 3_600_000_000
        p = _geo_pts(geo_rows).withColumn(
            "t0",
            F.timestamp_diff(
                "MICROSECOND",
                F.to_timestamp(F.lit("1970-01-01 00:00:00")),
                F.col("ts"),
            ),
        )
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        seg = p.select(
            "user_id", "t0", "lat", "lng",
            F.lead("t0").over(w).alias("t1"),
            F.lead("lat").over(w).alias("lat1"),
            F.lead("lng").over(w).alias("lng1"),
        ).where(F.col("t1").isNotNull())
        first = (F.col("t0") - F.col("t0") % H + H).cast("long")
        last = (F.col("t1") - F.col("t1") % H).cast("long")
        g = (
            seg.withColumn(
                "grid",
                F.when(first <= last,
                       F.sequence(first, last, F.lit(H).cast("long")))
                .otherwise(F.array().cast("array<long>")),
            )
            .select(
                "user_id", "t0", "t1", "lat", "lng", "lat1", "lng1",
                F.explode("grid").alias("tg"),
            )
            .withColumn(
                "frac",
                (F.col("tg") - F.col("t0")).cast("double")
                / (F.col("t1") - F.col("t0")).cast("double"),
            )
        )
        return g.groupBy().agg(
            F.count("*").alias("n_samples"),
            F.round(F.sum(F.col("lat") + F.col("frac") * (F.col("lat1") - F.col("lat"))), 4).alias("s_lat"),
        )

    return {
        "sq8_search_1m": _sq8_search,
        "pq_search_1m": _pq_search,
        "patchify_1m": _patchify,
        "image_ahash_dedup_1m": _ahash,
        "image_sharpness_1m": _sharpness,
        "proximity_pairs": _proximity,
        "overlay_pairs_100k": _overlay_100k,
        "geo_dbscan_300k": _dbscan_300k,
        "colocation_1m": _coloc_1m,
        "trajectory_resample_1m": _resample_1m,
        "substring_dedup_200k": _substring_dedup,
        "pipeline_lookup": lambda: run_pipeline(spark, images),
        "lookup_world_zones": _world_lookup,
        "world_lookup_join": _world_lookup_join,
        "world_lookup_join_bucketed": _world_lookup_join_bucketed,
        "multi_tenant_world": _multi_tenant,
        "onepass_lookup_tile": lambda: lookup_tile_onepass(images, idx_b),
        "tile_rollup": lambda: tile_rollup_fused(images),
        "salted_tile_counts": lambda: salted_tile_counts(_assigned()),
        "resolve_cover_events": lambda: q11_resolve_cover(spark, SF_DIR),
        "resolve_join_events": lambda: q39_resolve_join(spark, SF_DIR),
        "knn_fallback_events": lambda: q05_knn_fallback(spark, SF_DIR),
        "ngram_jaccard_docs": lambda: q14_ngram_jaccard(spark, SF_DIR),
        "ann_bruteforce": lambda: q21_ann_bruteforce(spark, SF_DIR),
    }


def materialize(df) -> int:
    """Force full execution without collecting data to the driver."""
    return df.count()


def world_small_kernel_ratio(n: int = 200_000, reps: int = 3) -> dict:
    """Measured world(24k zones)-vs-small(2k-ring) resolve-kernel ratio,
    recorded in the artifact so drift is visible round over round even
    while tests/test_world_scale.py's regression gate (4x) passes — the
    intrinsic calm-box ratio is 3.0-3.2x (44% of uniform world probes hit
    coastline boundary cells; BASELINE.md round 4). Min-of-reps on both
    sides, measured back-to-back so a stall window cannot hit one side
    only. Covers come from the content-hash cache (built by the headline
    queries), so this times the kernel, not a compile."""
    import numpy as np

    from tzspark.api import TimezoneLookup
    from tzspark.cells import resolve_points
    from tzspark.zones import make_world_zones, make_zones

    cache = os.path.join(CACHE, "covers")
    small = TimezoneLookup(make_zones(n_coast=4000), cache_dir=cache).idx
    world = TimezoneLookup(make_world_zones(), cache_dir=cache).idx
    rng = np.random.default_rng(17)
    lat_w = rng.uniform(-60, 60, n).astype(np.float32)
    lng_w = rng.uniform(-180, 180, n).astype(np.float32)
    lat_s = rng.uniform(-8, 44, n).astype(np.float32)
    lng_s = rng.uniform(-8, 44, n).astype(np.float32)
    best_s = best_w = 0.0
    for _ in range(reps):  # interleaved: stalls hit both sides or neither
        t0 = time.time()
        resolve_points(small, lat_s, lng_s)
        best_s = max(best_s, n / (time.time() - t0))
        t0 = time.time()
        resolve_points(world, lat_w, lng_w)
        best_w = max(best_w, n / (time.time() - t0))
    return {
        "small_rows_sec": round(best_s, 1),
        "world_rows_sec": round(best_w, 1),
        "ratio": round(best_s / best_w, 3),
        "fault_us": fault_probe(8),
    }


def bench_main():
    from tzspark.engine import get_spark

    spark = get_spark(app="tzspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    ensure_images(spark)
    images = spark.read.parquet(images_path())

    # warm-up: spawn python workers, distribute broadcasts, JIT codegen —
    # steady-state timings are what a long-running cluster job sees.
    # Measured: a fresh JVM needs ~4 executions of EACH Python-exchange
    # codepath (ArrowEvalPython vs PythonMapInArrow JIT independently:
    # 81s -> 8.3s -> 3.7s on the identical mapInArrow query) before C2
    # settles, so every headline query warms once + pipeline thrice.
    qs = headline_queries(spark, images)
    for _ in range(3):
        materialize(run_pipeline(spark, images))
    for name, thunk in qs.items():
        materialize(thunk())

    # Calm-wait: the box's stall regime (BASELINE.md round 4) comes and goes
    # on minute scales; an artifact taken at 900 us/page measures the host,
    # not the engine (observed: identical code 3-16x slower). Wait for a
    # calm window, bounded so the driver never hangs; the recorded probe
    # values let any reader see whether the wait succeeded.
    fault_us_before, calm_waits = hostcal.wait_calm(threshold_us=40.0)

    def timed_reps(thunk, max_rep, max_spent, min_rep=3):
        # min-of-reps: the box's stall noise is strictly additive and
        # one-sided, so min is the consistent estimator (same policy as the
        # --scaling runs; see BASELINE.md round 4). Cheap queries get 5
        # reps; a per-query time budget keeps the expensive world-scale
        # ones at 3 so the whole bench stays bounded — EXCEPT while reps
        # are still settling: a cold codepath pays Python-worker spawn, C2
        # JIT, and first-touch faults over its first several executions
        # (measured 36 -> 11.6 -> 6.9 s on the world join in an otherwise
        # calm session), and a long-running cluster job lives at the
        # settled rate. Stop only after TWO consecutive small (<20%)
        # improvements: the settle curve is not monotone in relative gain
        # (measured 55.8 -> 20.6 -> 15.9 -> 6.2 -> 5.6 -> 3.39 s — a 10%
        # rep FOLLOWED by a 39% one; a single-miss rule froze 5.6), with
        # the world-scale queries given more room (8 reps / 120 s) since
        # they are exactly the ones with a deep knee.
        best, spent, rep, stale = float("inf"), 0.0, 0, 0
        while True:
            t0 = time.time()
            materialize(thunk())
            dt = time.time() - t0
            stale = stale + 1 if dt >= 0.8 * best else 0
            best, spent, rep = min(best, dt), spent + dt, rep + 1
            # join-path thunks persist narrow frames scoped to THIS rep's
            # DataFrames — they are never reused across reps, so drop them
            # instead of letting storage accumulate over the session
            spark.catalog.clearCache()
            if rep < min_rep or (rep < 5 and spent < 30.0 and min_rep >= 3):
                continue
            if rep < max_rep and spent < max_spent and stale < 2:
                continue
            break
        return best

    timings = {}
    fault_by_query = {}
    # Per-query calm gate (VERDICT r4 item 2): a stall window that lands
    # MID-suite poisons only the queries it overlaps, and the global
    # before/after probes can't see it. After each query's reps, probe; if
    # the host was stalling, wait for calm (bounded) and re-rep, keeping the
    # min across rounds (noise is strictly additive). A global retry budget
    # keeps the whole bench bounded for the driver.
    retry_wall_budget = float(os.environ.get("SPARK_GRAFT_RETRY_BUDGET_S", "900"))
    retry_spent = 0.0
    for name, thunk in qs.items():
        max_rep, max_spent = (8, 120.0) if ("world" in name or "tenant" in name) else (6, 75.0)
        best = timed_reps(thunk, max_rep, max_spent)
        # per-query host-state evidence: pins each number to the host state
        # it was taken under (~1 us = calm, 50-600 us = stall regime)
        probe = fault_probe(8)
        retries = 0
        while probe > CALM_US_PER_PAGE and retries < 2 and retry_spent < retry_wall_budget:
            t_r = time.time()
            probe, _w = hostcal.wait_calm(max_waits=5)
            # re-measure warm + settled: 3 reps / 45 s suffice post-knee
            best = min(best, timed_reps(thunk, 3, 45.0, min_rep=2))
            probe = fault_probe(8)
            retries += 1
            retry_spent += time.time() - t_r
        timings[name] = round(best, 3)
        fault_by_query[name] = probe

    total = round(sum(timings.values()), 3)
    thr = round(N_ROWS / timings["pipeline_lookup"], 1)
    # north_rule N-vs-4N evidence IN the artifact: the process-parallel
    # resolve kernel at 8 vs 32 workers (~15 s; no Spark) — the component
    # that multiplies across real executors. Full Spark-end-to-end scaling
    # runs live in `bench.py --scaling` + BASELINE.md's replication table.
    kscale = kernel_scaling()
    print(
        json.dumps(
            {
                "metric": "timezone-lookup join + tiling headline queries, wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "n_images": N_ROWS,
                "cpus": CPUS,
                "throughput_rows_sec": thr,
                "kernel_scaling": kscale,
                # host-state evidence: first-touch fault cost (us/4k page)
                # sampled before and after the timed loop; ~1 us = calm box,
                # 50-600 us = the documented stall regime (BASELINE.md r4)
                "fault_us_per_page": [fault_us_before, fault_probe()],
                "fault_us_by_query": fault_by_query,
                "calm_waits": calm_waits,
                # intrinsic world-vs-small kernel ratio (ADVICE r4: record
                # it so drift under the 4x test gate is visible here)
                "world_small_kernel": world_small_kernel_ratio(),
            }
        )
    )
    spark.stop()


# sized so the local[8] run takes ~1 min: this box swings 2-4x on sub-30s
# jobs, which would swamp an 8-vs-32 ratio (the fused/vectorized round-2
# kernels made the old sizes finish too fast to measure honestly)
SCALING_ROWS = int(os.environ.get("SPARK_GRAFT_SCALING_ROWS", "8000000"))
COMPUTE_ROWS = int(os.environ.get("SPARK_GRAFT_COMPUTE_ROWS", "96000000"))
WORLD_ROWS = int(os.environ.get("SPARK_GRAFT_WORLD_ROWS", "64000000"))
JOIN_ROWS = int(os.environ.get("SPARK_GRAFT_JOIN_ROWS", "16000000"))


def compute_job_df(spark, n_rows: int, n_parts: int = 256):
    """CPU-bound core operator: the broadcast PIP lookup join over
    coordinates derived by pure column arithmetic from spark.range — zero
    disk I/O, so single-box scaling reflects the operator, not the shared
    memory bus (on a real cluster, scan bandwidth scales with executors)."""
    from pyspark.sql import functions as F

    from tzspark.engine import assign_udf, broadcast_cover
    from tzspark.zones import make_zones

    zones = make_zones(n_coast=20000)
    idx_b, _ = broadcast_cover(spark, zones)
    pts = spark.range(0, n_rows, 1, n_parts).select(
        ((F.pmod(F.col("id") * 7919, F.lit(50000)) / 1000.0) - 6.0)
        .cast("float")
        .alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(50000)) / 1000.0) - 6.0)
        .cast("float")
        .alias("lng"),
    )
    a = pts.select(assign_udf(idx_b)(F.col("lat"), F.col("lng")).alias("a"))
    return a.groupBy("a.zone_id").count()


def single_compute_run(cpus: int):
    from tzspark.engine import get_spark

    spark = get_spark(
        app=f"tzspark-compute-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        # kernel chunks internally (cache-sized); bigger Arrow batches just
        # amortize per-batch serde overhead
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # fixed 500k-row tasks at every parallelism level: constant per-task
    # overhead fraction, so the ratio measures scaling, not amortization
    df = compute_job_df(spark, COMPUTE_ROWS, n_parts=max(COMPUTE_ROWS // 500_000, cpus))
    for _ in range(3):  # C2 JIT needs several passes over the Arrow codepath
        materialize(df)
    times = []
    for _ in range(5):
        t0 = time.time()
        materialize(df)
        times.append(time.time() - t0)
    dt = min(times)  # noise on this box is strictly ADDITIVE (one-sided
    # multi-second fault/steal stalls, BASELINE.md round 4), so min-of-5 is
    # the consistent estimator of machine capability; median gets dragged
    # by a single stalled rep
    print(json.dumps({"cpus": cpus, "sec": round(dt, 3),
                      "rows_sec": round(COMPUTE_ROWS / dt, 1),
                      "all_secs": [round(t, 3) for t in times]}))
    spark.stop()


def single_noop_run(cpus: int):
    """Child mode for --scaling: the IO/framework ceiling control — the same
    parquet scan + JVM->Python Arrow transfer of the payload column as the
    full pipeline, with a NO-OP Python stage (touches nothing). Whatever
    efficiency this measures is the best any payload-consuming job can do on
    this box; the pipeline's efficiency should be judged against it."""
    import pyarrow as pa
    from pyspark.sql import types as T

    from tzspark.engine import get_spark

    spark = get_spark(app=f"tzspark-noop-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    global N_ROWS
    N_ROWS = SCALING_ROWS
    ensure_images(spark)
    images = spark.read.parquet(images_path())
    schema = T.StructType([T.StructField("n", T.LongType())])

    def _noop(batches):
        for b in batches:
            yield pa.RecordBatch.from_pydict({"n": [len(b.column(0))]})

    def job():
        materialize(images.select("bytes").mapInArrow(_noop, schema).groupBy().sum("n"))

    for _ in range(3):
        job()
    times = []
    for _ in range(5):
        t0 = time.time()
        job()
        times.append(time.time() - t0)
    dt = min(times)  # min-of-5; see the estimator note above
    print(json.dumps({"cpus": cpus, "sec": round(dt, 3),
                      "rows_sec": round(N_ROWS / dt, 1),
                      "all_secs": [round(t, 3) for t in times]}))
    spark.stop()


def _kernel_worker(args):
    seed, n = args
    import numpy as np

    rng = np.random.default_rng(seed)
    lat = rng.uniform(-8, 44, n).astype(np.float32)
    lng = rng.uniform(-8, 44, n).astype(np.float32)
    t0 = time.time()
    from tzspark.cells import resolve_points

    for s in range(0, n, 50_000):
        resolve_points(_KIDX, lat[s : s + 50_000], lng[s : s + 50_000])
    return n / (time.time() - t0)


def _kernel_init():
    global _KIDX
    from tzspark.cells import compile_cover
    from tzspark.zones import make_zones

    _KIDX = compile_cover(make_zones(n_coast=20000))


def kernel_scaling():
    """Process-level scaling of the resolve kernel itself (no Spark): shows
    the operator's intrinsic scalability separate from the local-mode Python
    runner's fixed per-task costs."""
    import multiprocessing as mp

    out = {}
    for procs in (8, 32):
        with mp.Pool(procs, initializer=_kernel_init) as p:
            rates = p.map(_kernel_worker, [(i, 2_000_000) for i in range(procs)])
        out[procs] = {"procs": procs, "rows_sec": round(sum(rates), 1)}
    eff = (out[32]["rows_sec"] / out[8]["rows_sec"]) / 4.0
    return {"local8": out[8], "local32": out[32], "efficiency": round(eff, 3),
            "n_rows_per_proc": 2_000_000}


def single_world_run(cpus: int):
    """Child mode for --scaling: the lookup join against the REFERENCE-SCALE
    zone index (make_world_zones: 1,200 tzids / 24k polygons / 4.8M vertices,
    ~142 MB broadcast) — the N-vs-4N row where the big broadcast is part of
    the measured job (materialized to every python worker during warmup,
    exactly like a long-running cluster job's first task wave)."""
    from pyspark.sql import functions as F

    from tzspark.api import TimezoneLookup
    from tzspark.engine import assign_udf, get_spark
    from tzspark.zones import make_world_zones

    spark = get_spark(
        app=f"tzspark-world-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tl = TimezoneLookup(make_world_zones(), cache_dir=os.path.join(CACHE, "covers"))
    idx_b = spark.sparkContext.broadcast(tl.idx)
    n_rows = WORLD_ROWS
    pts = spark.range(0, n_rows, 1, max(n_rows // 500_000, cpus)).select(
        ((F.pmod(F.col("id") * 7919, F.lit(120000)) / 1000.0) - 60.0)
        .cast("float").alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(360000)) / 1000.0) - 180.0)
        .cast("float").alias("lng"),
    )
    df = pts.select(assign_udf(idx_b)(F.col("lat"), F.col("lng")).alias("a")).groupBy(
        "a.zone_id"
    ).count()
    for _ in range(3):
        materialize(df)
    times = []
    for _ in range(5):
        t0 = time.time()
        materialize(df)
        times.append(time.time() - t0)
    dt = min(times)  # min-of-5; see the estimator note above
    print(json.dumps({"cpus": cpus, "sec": round(dt, 3),
                      "rows_sec": round(n_rows / dt, 1),
                      "all_secs": [round(t, 3) for t in times]}))
    spark.stop()


def single_join_run(cpus: int):
    """Child mode for --scaling: the BROADCAST-FREE lookup (covertable
    assign_via_join) against the reference-scale cover persisted as parquet
    tables — the round-3 flagship path for zone sets past the broadcast
    budget. Unlike the broadcast rows this one SHUFFLES (cell-id equi-joins),
    so its single-box N-vs-4N ratio also carries the local shuffle service's
    fixed costs; on a real cluster the exchange is network-parallel."""
    from pyspark.sql import functions as F

    from tzspark.api import TimezoneLookup
    from tzspark.covertable import assign_via_join
    from tzspark.engine import get_spark
    from tzspark.zones import make_world_zones

    spark = get_spark(
        app=f"tzspark-join-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "65536"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tl = TimezoneLookup(make_world_zones(), cache_dir=os.path.join(CACHE, "covers"))
    cov = tl.cover_tables(spark, cache_dir=os.path.join(CACHE, "covers"))
    n_rows = JOIN_ROWS
    pts = spark.range(0, n_rows, 1, max(n_rows // 250_000, cpus)).select(
        F.col("id").alias("k"),
        ((F.pmod(F.col("id") * 7919, F.lit(120000)) / 1000.0) - 60.0)
        .cast("float").alias("lat"),
        ((F.pmod(F.col("id") * 104729, F.lit(360000)) / 1000.0) - 180.0)
        .cast("float").alias("lng"),
    )
    df = assign_via_join(pts, "k", cov).groupBy("zone_id").count()
    for _ in range(3):
        materialize(df)
    times = []
    for _ in range(5):
        t0 = time.time()
        materialize(df)
        times.append(time.time() - t0)
    dt = min(times)  # min-of-5; see the estimator note above
    print(json.dumps({"cpus": cpus, "sec": round(dt, 3),
                      "rows_sec": round(n_rows / dt, 1),
                      "all_secs": [round(t, 3) for t in times]}))
    spark.stop()


def single_run(cpus: int):
    """Child mode for --scaling: time the full engine — per-zone lookup
    rollup AND per-tile raster stats over the payload table, computed by the
    one-pass fused operator (engine.lookup_tile_onepass): one parquet scan,
    one JVM->Python payload transfer, one shuffle of tiny partials. The
    outputs equal the old two-job form (pytest-pinned); the single pass
    halves the shared scan/transfer traffic that binds a one-box N-vs-4N
    comparison."""
    global N_ROWS
    N_ROWS = SCALING_ROWS
    from tzspark.engine import broadcast_cover, get_spark, lookup_tile_onepass
    from tzspark.zones import make_zones

    spark = get_spark(app=f"tzspark-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    ensure_images(spark)
    images = spark.read.parquet(images_path())
    zones = make_zones(n_coast=20000)
    idx_b, _ = broadcast_cover(spark, zones)

    def job():
        materialize(lookup_tile_onepass(images, idx_b))

    for _ in range(3):  # worker spawn + C2 JIT per Python-exchange codepath
        job()
    times = []
    for _ in range(5):
        t0 = time.time()
        job()
        times.append(time.time() - t0)
    dt = min(times)  # min-of-5; see the estimator note above
    print(json.dumps({"cpus": cpus, "sec": round(dt, 3),
                      "rows_sec": round(N_ROWS / dt, 1),
                      "all_secs": [round(t, 3) for t in times]}))
    spark.stop()


def scaling_main():
    """N vs 4N parallelism on the same input (north_rule evidence).

    Two jobs: the CPU-bound core lookup join (zero disk I/O — what scales
    with executors on a real cluster) and the full payload pipeline
    (parquet scan + decode — on ONE box this shares the memory bus across
    all threads, which a multi-node cluster does not)."""
    result = {"metric": "scaling efficiency local[8] -> local[32] (N -> 4N)",
              "target": 0.8}
    # optional subset, e.g. SPARK_GRAFT_SCALING_MODES=full_pipeline,transfer_ceiling_noop
    only = os.environ.get("SPARK_GRAFT_SCALING_MODES")
    only = set(only.split(",")) if only else None
    if only is None or "resolve_kernel" in only:
        # intrinsic operator scaling (process-parallel kernel, no Spark runner)
        result["resolve_kernel"] = kernel_scaling()
    import shutil

    taskset = shutil.which("taskset")
    for mode, flag, rows in (
        ("lookup_compute", "--single-compute-run", COMPUTE_ROWS),
        ("lookup_world_index", "--single-world-run", WORLD_ROWS),
        ("lookup_join_broadcast_free", "--single-join-run", JOIN_ROWS),
        ("full_pipeline", "--single-run", SCALING_ROWS),
        ("transfer_ceiling_noop", "--single-noop-run", SCALING_ROWS),
    ):
        if only is not None and mode not in only:
            continue
        out = {}
        for cpus in (8, 32):
            cmd = [sys.executable, os.path.abspath(__file__), flag, str(cpus)]
            if taskset:  # pin so local[8] really means 8 CPUs for ALL procs
                cmd = [taskset, "-c", f"0-{cpus - 1}"] + cmd
            r = subprocess.run(cmd, capture_output=True, text=True, check=True)
            out[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
        eff = (out[32]["rows_sec"] / out[8]["rows_sec"]) / 4.0
        result[mode] = {
            "n_rows": rows,
            "local8": out[8],
            "local32": out[32],
            "efficiency": round(eff, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling_main()
    elif "--single-compute-run" in sys.argv:
        single_compute_run(int(sys.argv[sys.argv.index("--single-compute-run") + 1]))
    elif "--single-noop-run" in sys.argv:
        single_noop_run(int(sys.argv[sys.argv.index("--single-noop-run") + 1]))
    elif "--single-world-run" in sys.argv:
        single_world_run(int(sys.argv[sys.argv.index("--single-world-run") + 1]))
    elif "--single-join-run" in sys.argv:
        single_join_run(int(sys.argv[sys.argv.index("--single-join-run") + 1]))
    elif "--single-run" in sys.argv:
        single_run(int(sys.argv[sys.argv.index("--single-run") + 1]))
    else:
        bench_main()
