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
    "q25_psnr_invariant": q25_psnr_invariant,
    "q26_tile_raster": q26_tile_raster,
    "q27_full_engine_synthetic": q27_full_engine_synthetic,
    "q29_image_features": q29_image_features,
    "q30_resize": q30_resize,
    "q31_stream_assign": q31_stream_assign,
}
