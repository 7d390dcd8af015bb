"""Douglas-Peucker simplification: hand-pinned splits, the eps guarantee,
monotonicity, ring validity, and the distributed form == driver form."""

import numpy as np
import pytest

from tzspark.simplify import (
    dp_keep_mask,
    simplify_ring,
    simplify_zone_table,
    simplify_zones,
)
from tzspark.zones import make_zones


def _chain_dist(lat, lng, s_lat, s_lng):
    """Max distance from every original vertex to the simplified chain."""
    from tzspark.simplify import _perp_dist2

    worst = 0.0
    for la, lg in zip(lat, lng):
        best = min(
            _perp_dist2(
                np.array([la]), np.array([lg]),
                s_lat[i], s_lng[i], s_lat[i + 1], s_lng[i + 1],
            )[0]
            for i in range(len(s_lat) - 1)
        )
        worst = max(worst, best)
    return np.sqrt(worst)


def test_dp_hand_example():
    # classic: a near-line with one big bump; eps between bump and jitter
    lat = np.array([0.0, 0.01, 2.0, -0.01, 0.0])
    lng = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    # baseline dist of the bump = 2.0; after the split the jitter points sit
    # ~0.70/0.71 from their diagonals -> eps=1.0 drops them, keeps the bump
    keep = dp_keep_mask(lat, lng, eps=1.0)
    assert keep.tolist() == [True, False, True, False, True]
    # tighter eps keeps the jitter too
    assert dp_keep_mask(lat, lng, eps=0.001).all()


def test_dp_eps_guarantee_and_monotone():
    rng = np.random.default_rng(3)
    lng = np.linspace(0, 10, 400)
    lat = np.cumsum(rng.normal(0, 0.05, 400))
    prev = None
    for eps in (0.01, 0.05, 0.2, 1.0):
        keep = dp_keep_mask(lat, lng, eps)
        s_lat, s_lng = lat[keep], lng[keep]
        assert keep[0] and keep[-1]
        assert _chain_dist(lat, lng, s_lat, s_lng) <= eps + 1e-12
        if prev is not None:
            assert keep.sum() <= prev  # larger eps never keeps more
        prev = keep.sum()


def test_simplify_ring_stays_valid():
    # a tiny triangle under a huge eps must stay >= 3 vertices
    la, lg = simplify_ring(
        np.array([0.0, 0.001, 0.0, -0.001]),
        np.array([0.0, 0.001, 0.002, 0.001]),
        eps=10.0,
    )
    assert len(la) >= 3


def test_simplify_zones_resolve_against_simplified_oracle():
    """Simplified zones are a VALID zone table: the compiled-cover probe
    over them equals the golden oracle over the same simplified rings."""
    from tzspark.cells import compile_cover, knn_fallback, resolve_points
    from tzspark.zones import oracle_assign

    zones = simplify_zones(make_zones(n_coast=3000), eps=0.05)
    n0 = sum(len(z.ring_lat) for z in make_zones(n_coast=3000))
    n1 = sum(len(z.ring_lat) for z in zones)
    assert n1 < n0  # it actually simplified
    idx = compile_cover(zones)
    rng = np.random.default_rng(7)
    lat = rng.uniform(-10, 46, 4000).astype(np.float32)
    lng = rng.uniform(-10, 46, 4000).astype(np.float32)
    got = resolve_points(idx, lat, lng)
    un = got == -1
    got[un] = knn_fallback(idx, lat[un], lng[un])
    np.testing.assert_array_equal(got, oracle_assign(zones, lat, lng))


def test_simplify_zone_table_equals_driver_form(spark):
    from tzspark.engine import zone_table_df

    zones = make_zones(n_coast=1500)
    df = simplify_zone_table(zone_table_df(spark, zones), eps=0.05)
    got = {r["zone_id"]: r for r in df.collect()}
    want = simplify_zones(zones, eps=0.05)
    assert len(got) == len(want)
    for z in want:
        g = got[z.zone_id]
        assert g["tzid"] == z.tzid
        assert g["n_after"] == len(z.ring_lat) <= g["n_before"]
        np.testing.assert_array_equal(
            np.array(g["ring_lat"], dtype=np.float32), z.ring_lat
        )
        np.testing.assert_array_equal(
            np.array(g["ring_lng"], dtype=np.float32), z.ring_lng
        )


def test_spike_ring_fallback_keeps_positive_area():
    """A spike ring (anchor and the two farthest vertices collinear) under
    a huge eps must not collapse to a zero-area 'triangle': the fallback
    swaps in the max-perpendicular-distance vertex."""
    from tzspark.geom import ring_area_signed
    from tzspark.simplify import simplify_ring

    # vertices 0, 2, 3 are collinear on y=0 and farthest from the anchor;
    # vertex 1 is the only off-axis point (tiny area)
    lat = np.array([0.0, 0.05, 0.0, 0.0, 0.0])
    lng = np.array([0.0, 5.0, 10.0, 8.0, 2.0])
    sla, slg = simplify_ring(lat, lng, eps=100.0)
    assert len(sla) >= 3
    assert abs(ring_area_signed(sla, slg)) > 0.0


def test_all_collinear_ring_fallback_does_not_crash():
    from tzspark.simplify import simplify_ring

    lat = np.zeros(6)
    lng = np.arange(6, dtype=np.float64)
    sla, slg = simplify_ring(lat, lng, eps=100.0)
    assert len(sla) >= 3  # no valid triangle exists; degenerate in = degenerate out
