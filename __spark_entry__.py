"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: tzspark/ — see SURVEY.md. Geo queries derive points from `events`
and rectangular zones from `nation` (FIXTURES.md §4); q10-q12 run the real
float32 PIP / cell-cover / kNN kernels inside pandas UDFs against pure-SQL
oracles. Text/similarity queries cover the training-data operator families
over `documents` / `embeddings`. The image queries (q24-q30) are oracle-
checked too: the synthetic pixels and the codec are pure arithmetic in the
row index, so decoded channel sums / PSNR / tile raster stats are exactly
SQL-expressible (COVERAGE.md "pixel-synthesis SQL oracles"). All 100
queries carry a value-level DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# executors' python workers must import tzspark too
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
# Shared host calibration (tzspark/hostcal.py): MALLOC_* env exports so the
# JVM + every Python worker avoid this VM's pathological first-touch fault
# stalls on large fresh mmaps, plus mallopt(3) for THIS process (env vars
# can't retune a running glibc). Only effective if this module is imported
# before the JVM starts, which is how the driver and the oracle-check
# harness both load it.
from tzspark import hostcal

hostcal.apply()

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: synthesize the image+caption
    table from `events` (EXIF-style GPS in the blob), then run the full
    engine — vectorized GPS extract -> cell encode -> broadcast compiled-
    cover PIP resolve -> kNN fallback -> tzid attach (broadcast hash join) ->
    per-zone rollup."""
    from tzspark.datasets import images_from_events
    from tzspark.engine import assign_timezones, broadcast_cover, zone_dim_df
    from tzspark.shipping import ensure_shipped
    from tzspark.zones import make_zones

    ensure_shipped(spark)  # --py-files equivalent for pre-created sessions
    sf_dir = "/root/testdata/sf0.001"
    zones = make_zones(n_coast=8000)
    idx_b, _stats = broadcast_cover(spark, zones)
    dim = zone_dim_df(spark, zones)
    imgs = images_from_events(spark, sf_dir)
    assigned = assign_timezones(imgs, idx_b, dim)
    return (
        assigned.groupBy("zone_id", "tzid")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("via_knn").cast("long")).alias("n_via_knn"),
            F.round(F.avg("lat"), 4).alias("avg_lat"),
            F.round(F.avg("lng"), 4).alias("avg_lng"),
        )
        .orderBy("zone_id")
    )


# Round-6 sampling rotation (VERDICT r5 item 4): the driver's correctness
# gate records the FIRST 50 entries of queries() per round. The 59 names
# with no CORRECTNESS_r05 row lead this round, stalest first — the 9 names
# whose newest driver row is round 3, then the round-4-resting names — so
# after r6 every query has a row in r5 ∪ r6. Every query is still present
# and oracle-checked; only the iteration order changes.
_ROUND6_FIRST = [
    # newest driver row = round 3:
    "q42_full_engine_boxes_join", "q44_dedup_canonical", "q45_asof_join",
    "q46_sessionize", "q47_tfidf_topterms", "q48_pii_scrub",
    "q49_stratified_sample", "q50_chunk_documents", "q51_sequence_pack",
    # newest driver row = round 4 (50 names; the first 41 of these fill the
    # driver's 50-name window, the rest follow immediately after):
    "q01_validity_filter", "q02_cell_encode", "q03_bbox_join",
    "q04_deterministic_match", "q05_knn_fallback", "q06_tile_counts",
    "q07_salted_agg", "q08_zone_bounds", "q09_zone_table_build",
    "q10_pip_exact_kernel", "q11_resolve_cover", "q12_knn_engine",
    "q28_frame_sample", "q36_pricing_summary", "q39_resolve_join",
    "q40_knn_join", "q43_zone_update_resolve", "q52_multi_tenant_resolve",
    "q53_radius_join", "q54_proximity_pairs", "q57_geo_dbscan",
    "q58_user_displacement", "q59_hll_tile_users", "q62_pagerank",
    "q64_zone_geometry", "q65_zone_transitions", "q66_focal_tile_stats",
    "q67_clip_conservation", "q68_idw_interpolation", "q70_tile_pyramid",
    "q72_colocation", "q73_haversine_displacement", "q74_weighted_sample",
    "q75_zone_dwell", "q76_tile_top_users", "q77_knn_points_join",
    "q78_repetition_signals", "q79_geohash", "q80_zorder_layout",
    "q85_mix_interleave", "q86_countmin_tokens", "q88_zone_value_quantiles",
    "q89_versioned_resolve", "q90_bm25_rank", "q91_stream_window_counts",
    "q93_stream_dedup", "q95_overlay_join", "q96_mobility_entropy",
    "q98_decontaminate", "q99_od_flow_matrix",
]

# Round-5 rotation list, kept for reference (CORRECTNESS_r05.json recorded
# exactly these 50 names).
_ROUND5_FIRST = [
    "q55_sq8_encode", "q56_sq8_search", "q60_pq_adc_search", "q61_ivfpq_search",
    "q63_snapshot_time_travel", "q69_image_ahash_neardup", "q71_zonal_image_stats",
    "q81_image_dedup_canonical", "q82_local_time_rollup", "q83_zone_quota_sample",
    "q84_patchify", "q87_flip_patchify", "q92_snapshot_merge",
    "q94_image_quality_filter", "q97_cluster_metadata", "q100_tile_shard_pack",
    "q30_resize", "q31_stream_assign",
    # new in round 5, never driver-recorded either:
    "q101_substring_dedup", "q102_semdedup",
    "q103_image_sharpness", "q104_zone_dissolve",
    "q105_trajectory_resample", "q106_boundary_distance",
    "q107_scene_cuts", "q108_unigram_surprisal", "q109_daylight_consistency",
    # the 23 highest-value of the names recorded only in round 3 (the nine
    # displaced r3-only names, q42 and q44-q51, keep their r3 green rows):
    "q13_dedup_exact", "q14_ngram_jaccard", "q15_minhash_lsh", "q16_simhash",
    "q17_lang_id", "q18_quality_score", "q19_token_count", "q20_doc_fingerprint",
    "q21_ann_bruteforce", "q22_ann_lsh_bucket", "q23_embed_near_dup",
    "q24_extract_gps", "q25_psnr_invariant", "q26_tile_raster",
    "q27_full_engine_synthetic", "q29_image_features", "q32_ivf_assign",
    "q33_ivf_search", "q34_simhash_near_dup", "q35_corpus_clean",
    "q37_near_dup_clusters", "q38_centroid_outliers", "q41_full_engine_boxes",
]


def _rotate(d: dict) -> dict:
    head = {k: d[k] for k in _ROUND6_FIRST if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.7)."""
    from tzspark.queries_extra import EXTRA_QUERIES
    from tzspark.queries_geo import GEO_QUERIES
    from tzspark.queries_text import TEXT_QUERIES

    def _shipped(fn):
        def wrapped(spark, sf_dir):
            from tzspark.shipping import ensure_shipped

            ensure_shipped(spark)
            return fn(spark, sf_dir)

        return wrapped

    out = {}
    for name, (fn, _sql) in {**GEO_QUERIES, **TEXT_QUERIES}.items():
        out[name] = _shipped(fn)
    for name, fn in EXTRA_QUERIES.items():
        out[name] = _shipped(fn)
    return _rotate(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query; non-SQL-expressible ops are omitted
    (image decode/PSNR, raster tiling, full synthetic-zone engine)."""
    from tzspark.queries_extra import EXTRA_ORACLES
    from tzspark.queries_geo import GEO_QUERIES
    from tzspark.queries_text import TEXT_QUERIES

    out = {name: sql for name, (_fn, sql) in {**GEO_QUERIES, **TEXT_QUERIES}.items()}
    out.update(EXTRA_ORACLES)
    return _rotate(out)
