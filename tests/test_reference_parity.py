"""Parity with the reference's AS-WRITTEN Search semantics.

The reference's Search (timezone.go:58-78 + geo/latlng.go:65-80) is
traversal-order dependent: every R-tree candidate whose MBR contains the
point is tested in traversal order; a CONTAINING candidate sets the name and
continues; a NON-containing candidate aborts the whole scan, returning
whatever name was set so far ("" if none). The engine instead defines
argmin(zone_id) over containing zones (documented deviation, SURVEY.md §5.1).

This test emulates the as-written protocol under EVERY candidate ordering
(the R-tree order is just one of them) and checks the two agree exactly on
the class of points the fixtures use — points whose MBR-candidate set
contains exactly one zone, or whose candidates all share one tzid — which is
the set where the as-written result is order-independent and well-defined.
"""

import itertools

import numpy as np
import pytest

from tzspark.cells import compile_cover, resolve_points
from tzspark.geom import F32, contains_scalar
from tzspark.zones import fixture_points, make_zones


def as_written_search(zones, lat, lng, order):
    """Line-faithful emulation of the reference callback protocol."""
    lat32, lng32 = F32(lat), F32(lng)
    name = ""
    for z in order:
        b = z.bbox
        # degenerate-rect MBR intersection (geo/latlng.go:34-36, rtree leaf
        # test geo/rtree.go:233-241): point-in-MBR with inclusive bounds
        if not (b[0] <= lat32 <= b[2] and b[1] <= lng32 <= b[3]):
            continue
        if contains_scalar(z.ring_lat, z.ring_lng, lat32, lng32):
            name = z.tzid  # set and continue (timezone.go:69-74)
        else:
            return name  # abort on first miss (geo/latlng.go:65-67)
    return name


@pytest.fixture(scope="module")
def zones():
    return make_zones(n_coast=2000)


@pytest.fixture(scope="module")
def idx(zones):
    return compile_cover(zones)


def _candidates(zones, lat, lng):
    lat32, lng32 = F32(lat), F32(lng)
    return [
        z
        for z in zones
        if z.bbox[0] <= lat32 <= z.bbox[2] and z.bbox[1] <= lng32 <= z.bbox[3]
    ]


def test_as_written_agrees_on_fixture_class(zones, idx):
    checked = 0
    for lat, lng, tag in fixture_points():
        cands = _candidates(zones, lat, lng)
        tzids = {z.tzid for z in cands}
        if len(cands) > 1 and len(tzids) > 1:
            continue  # order-dependent class — engine semantics deviate by design
        # all orderings of the candidate set give the same as-written answer
        answers = {
            as_written_search(zones, lat, lng, perm)
            for perm in itertools.permutations(cands)
        }
        assert len(answers) == 1, tag
        want = answers.pop()
        got = resolve_points(idx, np.array([lat], F32), np.array([lng], F32))[0]
        got_name = "" if got == -1 else next(z.tzid for z in zones if z.zone_id == got)
        assert got_name == want, f"{tag}: engine {got_name!r} vs as-written {want!r}"
        checked += 1
    assert checked >= 10  # the fixture set exercises this class broadly


def test_engine_deviation_is_the_documented_one(zones, idx):
    """Where candidate sets span multiple tzids, the as-written answer is
    order-dependent; the engine's argmin(zone_id) must be ONE of the
    possible as-written answers whenever the point is actually contained."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-8, 44, 400).astype(F32)
    lng = rng.uniform(-8, 44, 400).astype(F32)
    got = resolve_points(idx, lat, lng)
    for k in range(len(lat)):
        cands = _candidates(zones, float(lat[k]), float(lng[k]))
        containing = [
            z for z in cands
            if contains_scalar(z.ring_lat, z.ring_lng, lat[k], lng[k])
        ]
        if containing:
            want_min = min(z.zone_id for z in containing)
            assert got[k] == want_min
            # and that answer is reachable as-written (containing-first order)
            first = next(z for z in containing if z.zone_id == want_min)
            order = [first] + [z for z in zones if z is not first]
            assert as_written_search(zones, float(lat[k]), float(lng[k]), order) == first.tzid
        else:
            assert got[k] == -1


def test_facade_as_written_protocol_option(zones):
    """search(protocol='as_written') must equal the line-faithful emulation
    under the documented ascending-zone_id candidate order, everywhere."""
    from tzspark.api import TimezoneLookup

    tl = TimezoneLookup(zones)
    ordered = sorted(zones, key=lambda z: z.zone_id)
    rng = np.random.default_rng(9)
    lat = rng.uniform(-8, 44, 300)
    lng = rng.uniform(-8, 44, 300)
    diverged = 0
    for k in range(300):
        want = as_written_search(zones, float(lat[k]), float(lng[k]), ordered)
        got = tl.search(float(lat[k]), float(lng[k]), protocol="as_written")
        assert got.name == want, (lat[k], lng[k])
        argmin = tl.search(float(lat[k]), float(lng[k]), knn=False)
        if argmin.name != want:
            diverged += 1
    # the two protocols genuinely differ on some points (abort-on-miss can
    # return '' where a later candidate contains) — the documented deviation
    assert diverged > 0
