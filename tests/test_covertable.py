"""Cover-as-table resolve (covertable.py): the broadcast-free join path must
equal the broadcast kernels exactly — resolve, kNN, and the full facade
assignment — including on the reference-scale world zone set."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tzspark.cells import compile_cover, knn_fallback, resolve_points
from tzspark.covertable import (
    CoverTables,
    assign_via_join,
    knn_via_join,
    resolve_via_join,
)
from tzspark.engine import assign_udf, knn_only_udf, resolve_only_udf
from tzspark.queries_geo import box_zones, pts_df

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def box_cover(spark):
    zones = box_zones(spark, SF)
    idx = compile_cover(zones, base_res=3, max_res=7)
    return idx, CoverTables.from_index(spark, idx)


def _pd(df, cols):
    return df.select(*cols).toPandas().set_index(cols[0]).sort_index()


def test_resolve_join_equals_broadcast(spark, box_cover):
    idx, cov = box_cover
    p = pts_df(spark, SF)
    bidx = spark.sparkContext.broadcast(idx)
    want = _pd(
        p.select("event_id",
                 resolve_only_udf(bidx)(F.col("lat"), F.col("lng")).alias("zone_id")),
        ["event_id", "zone_id"],
    )
    got = _pd(resolve_via_join(p, "event_id", cov), ["event_id", "zone_id"])
    assert (want["zone_id"] == got["zone_id"]).all()
    assert (got["zone_id"] == -1).any()  # both regimes exercised
    assert (got["zone_id"] >= 0).any()


def test_assign_join_equals_broadcast(spark, box_cover):
    idx, cov = box_cover
    p = pts_df(spark, SF)
    bidx = spark.sparkContext.broadcast(idx)
    want = _pd(
        p.select("event_id", assign_udf(bidx)(F.col("lat"), F.col("lng")).alias("a"))
        .select("event_id", "a.zone_id", "a.via_knn"),
        ["event_id", "zone_id", "via_knn"],
    )
    got = _pd(assign_via_join(p, "event_id", cov), ["event_id", "zone_id", "via_knn"])
    assert (want["zone_id"] == got["zone_id"]).all()
    assert (want["via_knn"] == got["via_knn"]).all()


def test_save_load_roundtrip(spark, box_cover, tmp_path):
    idx, cov = box_cover
    path = str(tmp_path / "cover")
    cov.save(path)
    cov2 = CoverTables.load(spark, path)
    assert (cov2.base_res, cov2.max_res, cov2.knn_res) == (
        cov.base_res, cov.max_res, cov.knn_res,
    )
    p = pts_df(spark, SF).limit(2000)
    a = _pd(resolve_via_join(p, "event_id", cov), ["event_id", "zone_id"])
    b = _pd(resolve_via_join(p, "event_id", cov2), ["event_id", "zone_id"])
    assert (a["zone_id"] == b["zone_id"]).all()


def test_facade_assign_join_equals_assign(spark, tmp_path):
    """TimezoneLookup.assign_join == TimezoneLookup.assign on the image
    table (full pipeline: GPS extract -> quarantine -> join assign -> tzid),
    against the synthetic zone set incl. concave/hole/coast/ocean shapes."""
    from tzspark.api import TimezoneLookup
    from tzspark.datasets import images_from_events
    from tzspark.zones import make_zones

    tl = TimezoneLookup(make_zones(n_coast=2000))
    imgs = images_from_events(spark, SF)
    cols = ["image_id", "zone_id", "via_knn", "tzid", "cell_id"]
    want = _pd(tl.assign(spark, imgs), cols)
    got = _pd(tl.assign_join(spark, imgs, cache_dir=str(tmp_path)), cols)
    assert len(want) == len(got)
    for c in cols[1:]:
        assert (want[c] == got[c]).all(), c


def test_world_scale_join_parity(spark):
    """The join path on a reference-shaped world set (multi-thousand zones,
    index form with b_edge_idx) — equal to the broadcast kernels on random
    points across both matched and kNN regimes."""
    from tzspark.zones import make_world_zones

    idx = compile_cover(make_world_zones(n_tzids=160))  # 3,200 polygons
    cov = CoverTables.from_index(spark, idx)
    rng = np.random.default_rng(23)
    n = 20_000
    lat = rng.uniform(-60, 60, n).astype(np.float32)
    lng = rng.uniform(-180, 180, n).astype(np.float32)
    want = resolve_points(idx, lat, lng)
    un = want == -1
    want_knn = knn_fallback(idx, lat[un], lng[un])

    p = spark.createDataFrame(
        [(int(i), float(lat[i]), float(lng[i])) for i in range(n)],
        "pid long, lat float, lng float",
    )
    got = _pd(resolve_via_join(p, "pid", cov), ["pid", "zone_id"])
    np.testing.assert_array_equal(got["zone_id"].to_numpy(), want)

    unmatched = p.join(
        spark.createDataFrame([(int(i),) for i in np.flatnonzero(un)], "pid long"),
        "pid",
    )
    gk = _pd(knn_via_join(unmatched, "pid", cov), ["pid", "zone_id"])
    np.testing.assert_array_equal(gk["zone_id"].to_numpy(), want_knn)


def test_union_tenants_isolation(spark):
    """Multi-tenant cover: the same point resolves against ITS tenant's
    zone set only — a point inside tenant A's box is offshore (kNN) for
    tenant B, and each tenant's answer equals its own single-tenant
    broadcast kernel."""
    from tzspark.cells import Zone
    from tzspark.geom import F32

    za = [Zone(0, "A/Box", np.array([0, 0, 10, 10], F32),
               np.array([0, 10, 10, 0], F32))]
    zb = [Zone(0, "B/Box", np.array([40, 40, 50, 50], F32),
               np.array([40, 50, 50, 40], F32))]
    ia = compile_cover(za, base_res=3, max_res=7)
    ib = compile_cover(zb, base_res=3, max_res=7)
    cov = CoverTables.union_tenants(spark, {"a": ia, "b": ib})
    assert cov.keys == ("tenant",)

    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4],
                "lat": np.array([5.0, 5.0, 45.0, 45.0], np.float32),
                "lng": np.array([5.0, 5.0, 45.0, 45.0], np.float32),
                "tenant": ["a", "b", "a", "b"],
            }
        )
    )
    got = {
        r["k"]: (r["zone_id"], r["via_knn"])
        for r in assign_via_join(pts, "k", cov, persist=False).collect()
    }
    # (5,5): inside A's box; offshore for B -> kNN still lands on B's only zone
    assert got[1] == (0, False)
    assert got[2] == (0, True)
    # (45,45): mirror image
    assert got[3] == (0, True)
    assert got[4] == (0, False)

    # per-tenant equality vs the single-tenant kernels
    la = np.array([5.0, 45.0], np.float32)
    lg = np.array([5.0, 45.0], np.float32)
    assert resolve_points(ia, la, lg).tolist() == [0, -1]
    assert knn_fallback(ib, la[:1], lg[:1]).tolist() == [0]


def test_radius_join_equals_bruteforce(spark):
    """radius_join (grid-blocked distance-bounded join) must return exactly
    the brute-force pair set at several radii and block resolutions,
    including r=0 (bbox containment/touch), a radius larger than a cell,
    and rectangles clamped at the domain edge."""
    from tzspark.covertable import radius_join

    rng = np.random.default_rng(23)
    n_pts, n_zones = 400, 30
    lat = rng.uniform(-89.9, 89.9, n_pts).astype(np.float32)
    lng = rng.uniform(-179.9, 179.9, n_pts).astype(np.float32)
    la0 = rng.uniform(-88, 80, n_zones)
    lg0 = rng.uniform(-178, 160, n_zones)
    la1 = la0 + rng.uniform(0.5, 15, n_zones)
    lg1 = lg0 + rng.uniform(0.5, 15, n_zones)

    p = spark.createDataFrame(
        [(int(i), float(lat[i]), float(lng[i])) for i in range(n_pts)],
        "k long, lat double, lng double",
    )
    z = spark.createDataFrame(
        [
            (int(j), float(la0[j]), float(lg0[j]), float(la1[j]), float(lg1[j]))
            for j in range(n_zones)
        ],
        "zone_id long, min_lat double, min_lng double, max_lat double, max_lng double",
    )

    la64 = lat.astype(np.float64)[:, None]
    lg64 = lng.astype(np.float64)[:, None]
    dlat = np.maximum(np.maximum(la0[None] - la64, la64 - la1[None]), 0.0)
    dlng = np.maximum(np.maximum(lg0[None] - lg64, lg64 - lg1[None]), 0.0)
    d2 = dlat * dlat + dlng * dlng

    for radius, res in [(0.0, 5), (2.5, 6), (8.0, 4), (8.0, 7)]:
        got = {
            (r["k"], r["zone_id"])
            for r in radius_join(p, "k", z, radius=radius, res=res).collect()
        }
        want = {
            (int(i), int(j))
            for i, j in zip(*np.nonzero(d2 <= radius * radius))
        }
        assert got == want, (radius, res, len(got), len(want))


def test_proximity_self_join_equals_bruteforce(spark):
    """proximity_self_join must return exactly the brute-force pair set —
    including coincident points (dist 0), pairs straddling cell borders,
    and radii larger than a cell."""
    from tzspark.covertable import proximity_self_join

    rng = np.random.default_rng(29)
    n = 300
    lat = rng.uniform(-89.9, 89.9, n).astype(np.float32)
    lng = rng.uniform(-179.9, 179.9, n).astype(np.float32)
    # force clusters + exact duplicates so the interesting cases exist
    lat[50:80] = lat[20] + rng.uniform(-1, 1, 30).astype(np.float32)
    lng[50:80] = lng[20] + rng.uniform(-1, 1, 30).astype(np.float32)
    lat[90] , lng[90] = lat[91], lng[91]

    p = spark.createDataFrame(
        [(int(i), float(lat[i]), float(lng[i])) for i in range(n)],
        "k long, lat double, lng double",
    )
    la = lat.astype(np.float64)
    lg = lng.astype(np.float64)
    d2 = (la[:, None] - la[None]) ** 2 + (lg[:, None] - lg[None]) ** 2

    for radius, res in [(0.5, 8), (2.0, 6), (2.0, 9)]:
        got = {
            (r["id_a"], r["id_b"])
            for r in proximity_self_join(p, "k", radius=radius, res=res).collect()
        }
        ii, jj = np.nonzero(d2 <= radius * radius)
        want = {(int(i), int(j)) for i, j in zip(ii, jj) if i < j}
        assert got == want, (radius, res, len(got), len(want))


def test_point_pairs_within_equals_bruteforce(spark):
    """Two-set radius join (IDW's pair source): cell-blocked result ==
    brute-force cross join, carry column intact."""
    import numpy as np
    from pyspark.sql import functions as F

    from tzspark.covertable import point_pairs_within

    rng = np.random.default_rng(7)
    n_l, n_r = 40, 300
    lpts = [(i, float(lat), float(lng)) for i, (lat, lng) in enumerate(
        zip(rng.uniform(-20, 20, n_l), rng.uniform(-20, 20, n_l)))]
    rpts = [(1000 + i, float(lat), float(lng), float(v)) for i, (lat, lng, v) in
            enumerate(zip(rng.uniform(-20, 20, n_r), rng.uniform(-20, 20, n_r),
                          rng.normal(size=n_r)))]
    L = spark.createDataFrame(lpts, "pid long, lat double, lng double")
    R = spark.createDataFrame(rpts, "sid long, lat double, lng double, value double")

    for radius, res in ((1.5, 8), (4.0, 5), (0.0, 7)):
        got = {
            (r["pid"], r["sid"]): (r["dist2"], r["value"])
            for r in point_pairs_within(
                L, "pid", R, "sid", radius=radius, res=res, carry_cols=["value"]
            ).collect()
        }
        la = np.float32([p[1] for p in lpts]).astype(np.float64)
        lg = np.float32([p[2] for p in lpts]).astype(np.float64)
        ra = np.float32([p[1] for p in rpts]).astype(np.float64)
        rg = np.float32([p[2] for p in rpts]).astype(np.float64)
        d2 = (la[:, None] - ra[None, :]) ** 2 + (lg[:, None] - rg[None, :]) ** 2
        want = {
            (lpts[i][0], rpts[j][0]): (d2[i, j], rpts[j][3])
            for i, j in zip(*np.nonzero(d2 <= radius * radius))
        }
        assert set(got) == set(want), (radius, res)
        for k, (gd, gv) in got.items():
            assert abs(gd - want[k][0]) < 1e-12 and gv == want[k][1]


def test_colocation_pairs_equals_bruteforce(spark):
    """Spatiotemporal co-location: the (cell, time-bucket)-blocked self-join
    must return exactly the brute-force pair set — including pairs that
    straddle a time-bucket boundary (t and t+W in adjacent buckets), pairs
    exactly W apart (inclusive edge), same-user pairs excluded, and radii
    larger than a cell."""
    import datetime as dt

    from tzspark.covertable import colocation_pairs

    rng = np.random.default_rng(31)
    n = 200
    W = 600  # seconds
    lat = rng.uniform(-60, 60, n).astype(np.float32)
    lng = rng.uniform(-170, 170, n).astype(np.float32)
    # cluster half the points so spatial matches exist
    lat[100:] = lat[:100] + rng.uniform(-1, 1, 100).astype(np.float32)
    lng[100:] = lng[:100] + rng.uniform(-1, 1, 100).astype(np.float32)
    users = rng.integers(0, 12, n)
    t0 = dt.datetime(2024, 1, 1)
    # seconds stream crossing many W-buckets; plant exact-W and boundary pairs
    secs = np.sort(rng.integers(0, 6 * W, n))
    secs[3] = W - 1
    secs[4] = W + 1          # straddles the first bucket edge
    secs[10] = 2 * W
    secs[11] = 3 * W         # exactly W apart, inclusive
    users[3], users[4], users[10], users[11] = 1, 2, 3, 4
    lat[4], lng[4] = lat[3], lng[3]
    lat[11], lng[11] = lat[10] + np.float32(0.1), lng[10]

    rows = [
        (int(i), int(users[i]), t0 + dt.timedelta(seconds=int(secs[i])),
         float(lat[i]), float(lng[i]))
        for i in range(n)
    ]
    p = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lat double, lng double"
    )
    la, lg = lat.astype(np.float64), lng.astype(np.float64)
    d2 = (la[:, None] - la[None]) ** 2 + (lg[:, None] - lg[None]) ** 2
    dtm = np.abs(secs[:, None] - secs[None])

    for radius, res in [(1.5, 4), (1.5, 7), (30.0, 3)]:
        got = {
            (r["id_a"], r["id_b"])
            for r in colocation_pairs(
                p, "event_id", "user_id", "ts", radius=radius,
                window_s=W, res=res,
            ).collect()
        }
        ii, jj = np.nonzero(
            (d2 <= radius * radius) & (dtm <= W)
            & (users[:, None] != users[None])
        )
        want = {(int(i), int(j)) for i, j in zip(ii, jj) if i < j}
        assert got == want, (radius, res, len(got), len(want))
        if radius >= 1.5:
            assert (3, 4) in want and (10, 11) in want  # planted cases live
