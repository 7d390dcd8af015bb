"""Cell grid + compact cover: resolve_points must agree with the independent
golden oracle (full PIP over every zone) on fixtures and random points."""

import numpy as np
import pytest

from tzspark.cells import (
    cell_id,
    cell_id_parent,
    compile_cover,
    knn_fallback,
    resolve_points,
)
from tzspark.geom import F32
from tzspark.zones import (
    fixture_points,
    make_zones,
    oracle_assign,
    oracle_knn,
    oracle_resolve,
)


@pytest.fixture(scope="module")
def zones():
    return make_zones(n_coast=4000)


@pytest.fixture(scope="module")
def idx(zones):
    return compile_cover(zones, base_res=4, max_res=9)


def test_cell_id_arithmetic():
    lat = np.array([-90, 0, 89.999, 90], dtype=F32)
    lng = np.array([-180, 0, 179.999, 180], dtype=F32)
    c = cell_id(lat, lng, 3)
    n = 8
    assert c[0] == 0
    assert c[1] == (4 * n + 4)
    assert c[3] == n * n - 1  # clamped at the +90/+180 corner


def test_cell_parent_consistency():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-90, 90, 1000).astype(F32)
    lng = rng.uniform(-180, 180, 1000).astype(F32)
    hi = cell_id(lat, lng, 9)
    for r in (4, 6, 8):
        np.testing.assert_array_equal(
            cell_id_parent(hi, 9, r), cell_id(lat, lng, r)
        )


def test_cover_stats_sane(idx):
    s = idx.stats
    assert s["zones"] == 34
    assert s["boundary_cells"] > 0
    assert sum(s["interior_cells"].values()) > 0
    # edge pruning must actually prune on the coastline zone
    assert s["mean_edges_per_candidate"] < s["edges"] / 4


def test_fixture_points_resolve(zones, idx):
    pts = fixture_points()
    lat = np.array([p[0] for p in pts], F32)
    lng = np.array([p[1] for p in pts], F32)
    want, matched = oracle_resolve(zones, lat, lng)
    got = resolve_points(idx, lat, lng)
    for k, (plat, plng, tag) in enumerate(pts):
        assert got[k] == want[k], f"{tag}: got {got[k]} want {want[k]}"
    # sanity on specific semantics
    tagmap = {p[2]: k for k, p in enumerate(pts)}
    zid_by_id = {z.zone_id: z.tzid for z in zones}
    assert zid_by_id[int(got[tagmap["holeA_in_hole"]])] == "Test/HoleA"
    assert got[tagmap["holeB_in_hole_outside"]] == -1  # parity: hole is out
    assert got[tagmap["knn_strip_north"]] == -1
    assert zid_by_id[int(got[tagmap["coast_inside"]])] == "Test/Coast"
    assert got[tagmap["coast_seaward"]] == -1


def test_random_points_resolve_matches_oracle(zones, idx):
    rng = np.random.default_rng(7)
    lat = rng.uniform(-8, 44, 5000).astype(F32)
    lng = rng.uniform(-8, 44, 5000).astype(F32)
    want, _ = oracle_resolve(zones, lat, lng)
    got = resolve_points(idx, lat, lng)
    np.testing.assert_array_equal(got, want)


def test_knn_matches_oracle(zones, idx):
    rng = np.random.default_rng(11)
    lat = rng.uniform(24, 26, 500).astype(F32)  # uncovered strip
    lng = rng.uniform(-6, 42, 500).astype(F32)
    got = knn_fallback(idx, lat, lng)
    want = oracle_knn(zones, lat, lng)
    np.testing.assert_array_equal(got, want)


def test_full_assignment_no_unmatched(zones, idx):
    rng = np.random.default_rng(13)
    lat = rng.uniform(-8, 44, 2000).astype(F32)
    lng = rng.uniform(-8, 44, 2000).astype(F32)
    zid = resolve_points(idx, lat, lng)
    un = zid == -1
    zid[un] = knn_fallback(idx, lat[un], lng[un])
    want = oracle_assign(zones, lat, lng)
    np.testing.assert_array_equal(zid, want)
    assert (zid >= 0).all()
