"""Non-SQL-expressible operators (rows-only driver checks + pytest goldens).

These exercise the image payload path and the full synthetic-zone engine —
exact ray-cast PIP over concave/holed/high-vertex polygons and image
decode/PSNR are not ANSI-SQL-expressible, so the driver records a rows-only
check and the value-level verification lives in tests/ against the committed
float32 oracle (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _images(spark, sf_dir):
    from .datasets import images_from_events

    return images_from_events(spark, sf_dir)


def q24_extract_gps(spark, sf_dir):
    """Vectorized EXIF-style GPS extraction from image bytes (input_hint:
    batch header parse via np.frombuffer, no per-row Python). Only the
    17-byte header prefix crosses the Arrow boundary (gps_header_col) —
    the repo's payload-crosses-once rule."""
    from .engine import extract_gps_udf, gps_header_col

    imgs = _images(spark, sf_dir)
    g = imgs.withColumn("g", extract_gps_udf()(gps_header_col(F.col("bytes"))))
    return g.select(
        "image_id",
        F.col("g.lat").alias("lat"),
        F.col("g.lng").alias("lng"),
        F.col("g.gps_ok").alias("gps_ok"),
    )


# --- DuckDB oracle for q24: reproduce the synthetic coordinate pipeline ------
#
# The image blobs are deterministic in events.event_id (datasets.synth_coords:
# splitmix64-hash streams -> hot/uniform/offshore mixture -> float32 header).
# The ENTIRE derivation is exact-expressible in ANSI-ish SQL: 64-bit wrapping
# arithmetic via HUGEINT mod 2^64, xor/shift on UBIGINT, IEEE doubles, and a
# final CAST AS FLOAT for the float32 header truncation. The Spark side reads
# the values back out of the binary header; value-hash equality proves the
# encode -> blob -> vectorized extract path end to end.

_M64 = 1 << 64


def _mulmod_sql(x: str, c: int) -> str:
    """(x * c) mod 2^64 without overflowing HUGEINT (int128): split x into
    32-bit halves so every intermediate stays < 2^96."""
    return (
        f"CAST(((CAST({x} AS HUGEINT) // 4294967296 * {c} % 4294967296) * 4294967296"
        f" + CAST({x} AS HUGEINT) % 4294967296 * {c}) % {_M64} AS UBIGINT)"
    )


def _sm64_stage_sql(col: str, stage: int) -> str:
    """One splitmix64 stage (matches datasets._splitmix64 op for op)."""
    if stage == 0:  # x += 0x9E3779B97F4A7C15 (mod 2^64)
        return f"CAST((CAST({col} AS HUGEINT) + {0x9E3779B97F4A7C15}) % {_M64} AS UBIGINT)"
    if stage == 1:
        return f"xor({col}, {col} >> 30)"
    if stage == 2:
        return _mulmod_sql(col, 0xBF58476D1CE4E5B9)
    if stage == 3:
        return f"xor({col}, {col} >> 27)"
    if stage == 4:
        return _mulmod_sql(col, 0x94D049BB133111EB)
    return f"xor({col}, {col} >> 31)"


def _q24_sql() -> str:
    streams = {"s": 1, "a": 2, "b": 3, "k": 4}  # sel, u1, u2, hot_k
    seed_cols = ", ".join(
        f"CAST((CAST(i AS HUGEINT) * 1315423911 + {st}) % {_M64} AS UBIGINT) AS x_{nm}"
        for nm, st in streams.items()
    )
    stages = []
    for stage in range(6):
        cols = ", ".join(
            f"{_sm64_stage_sql(f'x_{nm}', stage)} AS x_{nm}" for nm in streams
        )
        stages.append(f"st{stage} AS (SELECT i, {cols} FROM {'seed' if stage == 0 else f'st{stage-1}'})")
    u_cols = ", ".join(
        f"CAST(x_{nm} >> 11 AS DOUBLE) / 9007199254740992.0 AS u_{nm}" for nm in streams
    )
    hot = [(3.0, 3.0), (9.5, 15.5), (15.2, 27.3), (21.0, 9.0), (3.5, 33.0)]
    hot_lat = "CASE hk " + " ".join(f"WHEN {k} THEN {la}" for k, (la, _) in enumerate(hot)) + " END"
    hot_lng = "CASE hk " + " ".join(f"WHEN {k} THEN {lg}" for k, (_, lg) in enumerate(hot)) + " END"
    return f"""
WITH ev AS (SELECT event_id AS i FROM events),
seed AS (SELECT i, {seed_cols} FROM ev),
{", ".join(stages)},
u AS (SELECT i, {u_cols},
             LEAST(GREATEST(CAST(FLOOR(CAST(x_k >> 11 AS DOUBLE) / 9007199254740992.0 * 5) AS BIGINT), 0), 4) AS hk
      FROM st5),
c AS (SELECT i,
             CASE WHEN u_s < 0.80 THEN {hot_lat} + (u_a - 0.5) * 0.5
                  WHEN u_s < 0.95 THEN -6.0 + u_a * 48.0
                  WHEN u_b < 0.5 THEN 34.5 + u_a * 1.0
                  ELSE 24.5 + u_a * 1.0 END AS lat64,
             CASE WHEN u_s < 0.80 THEN {hot_lng} + (u_b - 0.5) * 0.5
                  ELSE -6.0 + u_b * 48.0 END AS lng64
      FROM u)
SELECT 'img' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,
       CAST(lat64 AS FLOAT) AS lat,
       CAST(lng64 AS FLOAT) AS lng,
       TRUE AS gps_ok
FROM c
"""


Q24_SQL = _q24_sql()


def q41_full_engine_boxes(spark, sf_dir):
    """The WHOLE fused lookup pipeline (engine.assign_timezones: header
    extract -> validity -> resolve -> kNN -> cell encode -> tzid broadcast
    join) under a value-level oracle. q24 proves the extract, q10/q11 the
    PIP kernels, q12 the kNN — this runs the single-Arrow-crossing
    lookup_udf END TO END against a DuckDB oracle composed from the same
    pieces (splitmix64 coord synthesis + f32 half-open containment argmin +
    clamp-distance kNN + cell arithmetic), over the 25 nation boxes where
    rectangle PIP is exactly SQL-expressible. Per-image output (not a
    rollup) so any row-level drift hash-fails."""
    from .engine import assign_timezones, zone_dim_df
    from .queries_geo import box_zones

    zones = box_zones(spark, sf_dir)
    from .cells import compile_cover

    idx = compile_cover(zones, base_res=3, max_res=7)
    idx_b = spark.sparkContext.broadcast(idx)
    dim = zone_dim_df(spark, zones)
    a = assign_timezones(_images(spark, sf_dir), idx_b, dim, max_res=7)
    return a.select(
        "image_id", "lat", "lng", "zone_id", "via_knn", "cell_id", "tzid"
    )


def q42_full_engine_boxes_join(spark, sf_dir):
    """q41's pipeline on the BROADCAST-FREE physical strategy: the facade's
    assign_join (GPS extract -> quarantine -> cover-as-table cell-id
    equi-joins -> kNN join -> tzid attach) must produce the exact same
    per-image rows — same composed DuckDB oracle as q41, so both physical
    strategies of the lookup are value-pinned end to end."""
    from .api import TimezoneLookup
    from .queries_geo import box_zones

    tl = TimezoneLookup(box_zones(spark, sf_dir), base_res=3, max_res=7)
    a = tl.assign_join(spark, _images(spark, sf_dir))
    return a.select(
        "image_id", "lat", "lng", "zone_id", "via_knn", "cell_id", "tzid"
    )


def _q41_sql() -> str:
    from .cells import cell_id_sql
    from .queries_geo import BOXES_SQL, _CONTAIN_F32

    # the containment/knn predicates are written against p.lat/p.lng; the
    # coords CTE yields FLOAT columns already, so CAST(p.lat AS FLOAT) is a
    # no-op there — kept identical to the proven Q10/Q12 text.
    return f"""
WITH coords AS (SELECT image_id, lat, lng FROM ({Q24_SQL})),
boxes AS ({BOXES_SQL}),
res AS (
  SELECT p.image_id, p.lat, p.lng,
         MIN(CASE WHEN {_CONTAIN_F32} THEN b.zone_id END) AS rz
  FROM coords p CROSS JOIN boxes b
  GROUP BY p.image_id, p.lat, p.lng
),
knn AS (
  SELECT p.image_id, b.zone_id,
         ROW_NUMBER() OVER (
           PARTITION BY p.image_id
           ORDER BY POWER(GREATEST(b.min_lat - CAST(p.lat AS FLOAT), CAST(p.lat AS FLOAT) - b.max_lat, 0), 2)
                  + POWER(GREATEST(b.min_lng - CAST(p.lng AS FLOAT), CAST(p.lng AS FLOAT) - b.max_lng, 0), 2),
                    b.zone_id) AS rn
  FROM res p CROSS JOIN boxes b WHERE p.rz IS NULL
),
final AS (
  SELECT r.image_id, r.lat, r.lng,
         CAST(COALESCE(r.rz, k.zone_id) AS INTEGER) AS zone_id,
         r.rz IS NULL AS via_knn
  FROM res r
  LEFT JOIN (SELECT image_id, zone_id FROM knn WHERE rn = 1) k USING (image_id)
)
SELECT f.image_id, f.lat, f.lng, f.zone_id, f.via_knn,
       {cell_id_sql('f.lat', 'f.lng', 7)} AS cell_id, b.tzid
FROM final f JOIN boxes b ON f.zone_id = b.zone_id
"""


Q41_SQL = _q41_sql()

EXTRA_ORACLES = {
    "q24_extract_gps": Q24_SQL,
    "q41_full_engine_boxes": Q41_SQL,
    "q42_full_engine_boxes_join": Q41_SQL,
}


def q25_psnr_invariant(spark, sf_dir):
    """Per-row payload invariant: decode every image, recompute pixels from
    the row index, report PSNR class. Output = per-fmt violation counts
    (expected: zero violations — lossless bit-equal, lossy >= 40 dB)."""
    from .imagecodec import decode_image, psnr, synth_pixels

    imgs = _images(spark, sf_dir).select("image_id", "bytes", "fmt")

    schema = T.StructType(
        [
            T.StructField("fmt", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_violations", T.LongType()),
            T.StructField("min_psnr", T.DoubleType()),
        ]
    )

    def _check(batches):
        for pdf in batches:
            recs = {}
            for iid, buf, fmt in zip(
                pdf["image_id"].tolist(), pdf["bytes"].tolist(), pdf["fmt"].tolist()
            ):
                i = int(iid[3:])
                _, _, dec = decode_image(bytes(buf))
                orig = synth_pixels(i, dec.shape[1], dec.shape[0])
                p = psnr(orig, dec)
                ok = (p == float("inf")) if fmt in ("raw", "rle") else (p >= 40.0)
                st = recs.setdefault(fmt, [0, 0, float("inf")])
                st[0] += 1
                st[1] += 0 if ok else 1
                st[2] = min(st[2], p if p != float("inf") else 1e9)
            yield pd.DataFrame(
                [
                    {"fmt": k, "n_rows": v[0], "n_violations": v[1], "min_psnr": v[2]}
                    for k, v in recs.items()
                ]
            )

    per_part = imgs.mapInPandas(_check, schema)
    return per_part.groupBy("fmt").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_violations").alias("n_violations"),
        F.round(F.min("min_psnr"), 2).alias("min_psnr"),
    )


def q26_tile_raster(spark, sf_dir):
    """Raster<->vector tiling: group decoded images by cell and compute
    stacked-raster stats via applyInPandas (north_star tiling operator)."""
    from .datasets import images_from_events
    from .engine import tile_rollup_fused

    return tile_rollup_fused(images_from_events(spark, sf_dir)).select(
        "cell_id",
        "n_images",
        "n_pixels",
        F.round("mean_luma", 4).alias("mean_luma"),
        F.round("mean_lat", 4).alias("mean_lat"),
        F.round("mean_lng", 4).alias("mean_lng"),
    )


def q27_full_engine_synthetic(spark, sf_dir):
    """The flagship lookup against the full synthetic zone set (concave,
    holes both decoder-quirk ways, 20k-vertex coastline, oceans, kNN strip):
    per-tzid assignment counts. Value-checked in tests vs the float32 oracle."""
    from .datasets import images_from_events
    from .engine import assign_timezones, broadcast_cover, zone_dim_df
    from .zones import make_zones

    zones = make_zones(n_coast=8000)
    idx_b, _ = broadcast_cover(spark, zones)
    dim = zone_dim_df(spark, zones)
    assigned = assign_timezones(images_from_events(spark, sf_dir), idx_b, dim)
    return (
        assigned.groupBy("tzid")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("via_knn").cast("long")).alias("n_via_knn"),
        )
        .orderBy("tzid")
    )


def q29_image_features(spark, sf_dir):
    """Multimodal feature extraction (decode -> stats + phash verify),
    partition-local, failure-routed. Rows-only: value check in pytest."""
    from .imageops import image_features

    f = image_features(_images(spark, sf_dir))
    return f.select(
        "image_id",
        "w",
        "h",
        F.round("mean_r", 4).alias("mean_r"),
        F.round("mean_luma", 4).alias("mean_luma"),
        "phash_ok",
        "decode_failed",
    )


def q30_resize(spark, sf_dir):
    """Nearest-neighbor resize to 8x8 with GPS header preserved; output is
    the re-extracted GPS of the resized blob (proves the header survives)."""
    from .engine import extract_gps_udf, gps_header_col
    from .imageops import resize_images

    r = resize_images(_images(spark, sf_dir), 8, 8)
    g = r.withColumn("g", extract_gps_udf()(gps_header_col(F.col("bytes"))))
    return g.select(
        "image_id", "w", "h",
        F.col("g.lat").alias("lat"), F.col("g.lng").alias("lng"),
        F.col("g.gps_ok").alias("gps_ok"),
    )


def q31_stream_assign(spark, sf_dir):
    """The lookup pipeline executed as a Structured Streaming query
    (Trigger.AvailableNow, memory sink) — must equal the batch answer.
    Rows-only here; batch==stream equality is pinned in tests/test_streaming."""
    import tempfile

    from .engine import broadcast_cover, zone_dim_df
    from .streaming import read_image_stream, run_available_now, stream_assign
    from .zones import make_zones

    tmp = tempfile.mkdtemp(prefix="tzq31_")
    _images(spark, sf_dir).write.mode("overwrite").parquet(f"{tmp}/images")
    zones = make_zones(n_coast=2000)
    idx_b, _ = broadcast_cover(spark, zones)
    dim = zone_dim_df(spark, zones)
    stream = read_image_stream(spark, f"{tmp}/images", per_trigger_files=8)
    assigned = stream_assign(stream, idx_b, dim).select(
        "image_id", "zone_id", "tzid", "via_knn"
    )
    run_available_now(assigned, f"{tmp}/ckpt", "q31_out")
    return spark.table("q31_out")


EXTRA_QUERIES = {
    "q24_extract_gps": q24_extract_gps,
    "q41_full_engine_boxes": q41_full_engine_boxes,
    "q42_full_engine_boxes_join": q42_full_engine_boxes_join,
    "q25_psnr_invariant": q25_psnr_invariant,
    "q26_tile_raster": q26_tile_raster,
    "q27_full_engine_synthetic": q27_full_engine_synthetic,
    "q29_image_features": q29_image_features,
    "q30_resize": q30_resize,
    "q31_stream_assign": q31_stream_assign,
}
