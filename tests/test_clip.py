"""Sutherland-Hodgman rect clip (geom.clip_ring_rect): fragment geometry
and area conservation, no Spark needed."""

import numpy as np

from tzspark.geom import clip_ring_rect, clip_rings_rect_batch, ring_area_signed
from tzspark.zones import make_zones

F32 = np.float32


def _sq(y0, x0, y1, x1):
    return (
        np.array([y0, y0, y1, y1], F32),
        np.array([x0, x1, x1, x0], F32),
    )


def _grid_sum(y, x, lat_lo, lng_lo, lat_hi, lng_hi, step):
    tot = 0.0
    r = lat_lo
    while r < lat_hi:
        c = lng_lo
        while c < lng_hi:
            fy, fx = clip_ring_rect(y, x, r, c, r + step, c + step)
            tot += ring_area_signed(fy, fx)
            c += step
        r += step
    return tot


def test_rect_fully_inside_window():
    y, x = _sq(1, 1, 2, 2)
    fy, fx = clip_ring_rect(y, x, 0, 0, 10, 10)
    assert abs(ring_area_signed(fy, fx) - ring_area_signed(y, x)) < 1e-12


def test_rect_fully_outside_window():
    y, x = _sq(1, 1, 2, 2)
    fy, fx = clip_ring_rect(y, x, 5, 5, 6, 6)
    assert ring_area_signed(fy, fx) == 0.0


def test_window_inside_subject():
    y, x = _sq(0, 0, 10, 10)
    fy, fx = clip_ring_rect(y, x, 4, 4, 5, 5)
    assert abs(abs(ring_area_signed(fy, fx)) - 1.0) < 1e-12


def test_orientation_preserved():
    y, x = _sq(0, 0, 2, 2)  # one orientation
    yr, xr = y[::-1].copy(), x[::-1].copy()  # the other
    a1 = ring_area_signed(*clip_ring_rect(y, x, 0, 0, 1, 1))
    a2 = ring_area_signed(*clip_ring_rect(yr, xr, 0, 0, 1, 1))
    assert abs(a1 + a2) < 1e-12 and abs(abs(a1) - 1.0) < 1e-12


def test_degenerate_ring_clips_empty():
    y = np.array([0, 1], F32)
    x = np.array([0, 1], F32)
    fy, fx = clip_ring_rect(y, x, -10, -10, 10, 10)
    assert len(fy) == 0


def test_concave_multi_exit_conservation():
    """A comb-shaped ring exits and re-enters a window column twice; the
    S-H bridge edges must contribute zero net area."""
    # comb: 5 wide, teeth up at x in [0,1] and [2,3] and [4,5]
    y = np.array([0, 0, 3, 3, 1, 1, 3, 3, 1, 1, 3, 3], F32)
    x = np.array([0, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1, 0], F32)
    whole = ring_area_signed(y, x)
    assert abs(abs(whole) - 11.0) < 1e-9  # 5x1 base + 3 teeth of 2
    assert abs(_grid_sum(y, x, 0, 0, 3, 5, 1.0) - whole) < 1e-9
    # a window at tooth height sees the middle tooth whole and half of
    # each outer tooth: 0.5 + 1 + 0.5
    fy, fx = clip_ring_rect(y, x, 2, 0.5, 3, 4.5)
    assert abs(abs(ring_area_signed(fy, fx)) - 2.0) < 1e-9


def test_batch_clip_matches_scalar_random():
    """clip_rings_rect_batch (the q95 Arrow-batch kernel) agrees with the
    scalar clip_ring_rect pair-by-pair on random concave star rings and
    partially-overlapping windows — including empty / degenerate cases."""
    rng = np.random.default_rng(42)
    P = 300
    ys, xs, cnts, rects = [], [], [], []
    for _ in range(P):
        v = int(rng.integers(3, 24))
        th = np.sort(rng.uniform(0, 2 * np.pi, v))
        rad = rng.uniform(0.5, 5.0, v)
        cy, cx = rng.uniform(-50, 50), rng.uniform(-150, 150)
        ys.append((cy + rad * np.sin(th)).astype(F32).astype(np.float64))
        xs.append((cx + rad * np.cos(th)).astype(F32).astype(np.float64))
        cnts.append(v)
        a0 = cy + rng.uniform(-4, 2)
        b0 = cx + rng.uniform(-4, 2)
        rects.append((a0, b0, a0 + rng.uniform(0.5, 6), b0 + rng.uniform(0.5, 6)))
    vmax = max(cnts)
    ypad = np.zeros((P, vmax))
    xpad = np.zeros((P, vmax))
    for p in range(P):
        ypad[p, : cnts[p]] = ys[p]
        xpad[p, : cnts[p]] = xs[p]
    rects = np.array(rects)
    got = clip_rings_rect_batch(
        ypad, xpad, np.array(cnts), rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]
    )
    n_nonzero = 0
    for p in range(P):
        fy, fx = clip_ring_rect(
            ys[p].astype(F32), xs[p].astype(F32),
            rects[p, 0], rects[p, 1], rects[p, 2], rects[p, 3],
        )
        want = abs(ring_area_signed(fy, fx)) if len(fy) >= 3 else 0.0
        assert np.isclose(got[p], want, rtol=1e-12, atol=1e-14), p
        n_nonzero += want > 0
    assert n_nonzero > P // 2  # the fixture actually exercises overlap


def test_batch_clip_degenerate_counts():
    """Rings with <3 vertices clip to zero area (clip_ring_rect parity),
    and an all-degenerate batch doesn't crash the adaptive allocation."""
    y = np.array([[0, 0, 1, 1], [10, 10, 11, 0], [0, 1, 2, 0]], float)
    x = np.array([[0, 1, 1, 0], [10, 11, 11, 0], [0, 1, 0, 0]], float)
    got = clip_rings_rect_batch(
        y, x, np.array([4, 3, 2]),
        np.full(3, -1.0), np.full(3, -1.0), np.full(3, 5.0), np.full(3, 5.0),
    )
    assert np.allclose(got, [1.0, 0.0, 0.0])
    empty = clip_rings_rect_batch(
        y, x, np.array([2, 1, 0]),
        np.full(3, -1.0), np.full(3, -1.0), np.full(3, 5.0), np.full(3, 5.0),
    )
    assert np.allclose(empty, 0.0)
    assert clip_rings_rect_batch(
        np.zeros((0, 4)), np.zeros((0, 4)), np.zeros(0, np.int64),
        np.zeros(0), np.zeros(0), np.zeros(0), np.zeros(0),
    ).shape == (0,)


def test_zone_set_conservation():
    """Every simple synthetic zone's area is conserved across a cell grid
    (the q67 invariant, checked here without Spark)."""
    for z in make_zones(n_coast=300):
        if len(z.ring_lat) < 3 or z.tzid == "Test/HoleB":
            continue
        whole = ring_area_signed(z.ring_lat, z.ring_lng)
        lo_lat = np.floor(float(z.bbox[0]))
        lo_lng = np.floor(float(z.bbox[1]))
        hi_lat = float(z.bbox[2]) + 1
        hi_lng = float(z.bbox[3]) + 1
        got = _grid_sum(z.ring_lat, z.ring_lng, lo_lat, lo_lng, hi_lat, hi_lng, 2.0)
        assert abs(got - whole) < 1e-7, z.tzid
