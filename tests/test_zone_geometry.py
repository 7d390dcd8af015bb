"""zone_geometry (q64): the JVM-side array-fold shoelace/perimeter/centroid
pinned against an independent numpy recompute over the same f32 rings."""

import numpy as np

from tzspark.engine import zone_table_df
from tzspark.queries_geo import zone_geometry
from tzspark.zones import make_zones


def _numpy_ring_stats(z):
    x = np.asarray(z.ring_lng, np.float64)
    y = np.asarray(z.ring_lat, np.float64)
    xa, ya = np.roll(x, 1), np.roll(y, 1)  # closing edge first (ring_edges)
    cross = xa * y - x * ya
    area = 0.5 * cross.sum()
    perimeter = np.sqrt((y - ya) ** 2 + (x - xa) ** 2).sum()
    if area == 0.0:
        return area, perimeter, None, None
    clat = ((ya + y) * cross).sum() / (6 * area)
    clng = ((xa + x) * cross).sum() / (6 * area)
    return area, perimeter, clat, clng


def test_zone_geometry_matches_numpy(spark):
    zones = make_zones(n_coast=500)
    rows = {
        r["zone_id"]: r
        for r in zone_geometry(zone_table_df(spark, zones)).collect()
    }
    assert set(rows) == {z.zone_id for z in zones}
    saw_degenerate = False
    for z in zones:
        area, per, clat, clng = _numpy_ring_stats(z)
        r = rows[z.zone_id]
        assert r["n_vertices"] == len(z.ring_lat)
        assert abs(r["area_signed"] - area) < 2e-6, z.tzid
        assert abs(r["perimeter"] - per) < 2e-6, z.tzid
        if clat is None:
            saw_degenerate = True
            assert r["centroid_lat"] is None and r["centroid_lng"] is None
        else:
            assert abs(r["centroid_lat"] - clat) < 1e-5, z.tzid
            assert abs(r["centroid_lng"] - clng) < 1e-5, z.tzid
            # area centroid of a simple ring lies inside its bbox
            if z.tzid.startswith(("Etc/Ocean", "Test/Zone")):
                assert z.bbox[0] <= clat <= z.bbox[2]
                assert z.bbox[1] <= clng <= z.bbox[3]
    # the <3-vertex quirk ring exercises the NULL-centroid branch
    assert saw_degenerate


def test_zone_geometry_exact_rectangles(spark):
    """Axis-aligned ocean rectangles have exactly |area| = w*h and
    perimeter = 2(w+h) (f32-exact corners, f64 arithmetic)."""
    zones = [z for z in make_zones(n_coast=500) if z.tzid.startswith("Etc/Ocean")]
    assert zones
    rows = zone_geometry(zone_table_df(spark, zones)).collect()
    by_id = {z.zone_id: z for z in zones}
    for r in rows:
        z = by_id[r["zone_id"]]
        h = float(z.bbox[2]) - float(z.bbox[0])
        w = float(z.bbox[3]) - float(z.bbox[1])
        assert abs(abs(r["area_signed"]) - w * h) < 1e-9
        assert abs(r["perimeter"] - 2 * (w + h)) < 1e-9
