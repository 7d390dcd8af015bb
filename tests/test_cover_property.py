"""Property-based cover soundness: for ARBITRARY polygon sets, the compiled
cover's resolve (interior shortcut + pruned-edge boundary ray cast + argmin)
must agree with the independent full-PIP oracle on every probe point
(SURVEY.md §5 item 4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tzspark.cells import Zone, compile_cover, resolve_points
from tzspark.geom import F32
from tzspark.zones import oracle_resolve


def _ring(cx, cy, r, n, phase):
    """Star-ish (possibly concave, possibly self-intersecting) ring."""
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False) + phase
    rad = r * (0.5 + 0.5 * np.cos(3 * ang + phase))
    lat = np.clip(cy + rad * np.sin(ang), -89, 89)
    lng = np.clip(cx + rad * np.cos(ang), -179, 179)
    return lat.astype(F32), lng.astype(F32)


@settings(max_examples=25, deadline=None)
@given(
    seeds=st.lists(
        st.tuples(
            st.floats(-60, 60),  # center lat
            st.floats(-120, 120),  # center lng
            st.floats(0.5, 25.0),  # radius
            st.integers(3, 40),  # vertices
            st.floats(0, 6.28),  # phase
        ),
        min_size=1,
        max_size=6,
    ),
    probe_seed=st.integers(0, 2**31 - 1),
)
def test_cover_resolve_equals_oracle(seeds, probe_seed):
    zones = [
        Zone(k, f"Z{k}", *_ring(cx, cy, r, n, ph))
        for k, (cy, cx, r, n, ph) in enumerate(seeds)
    ]
    idx = compile_cover(zones, base_res=3, max_res=8)
    rng = np.random.default_rng(probe_seed)
    # probe around the zones' extent plus global scatter
    lat = np.concatenate(
        [rng.uniform(-89, 89, 200)]
        + [rng.uniform(z.bbox[0] - 1, z.bbox[2] + 1, 100) for z in zones]
    ).astype(F32)
    lng = np.concatenate(
        [rng.uniform(-179, 179, 200)]
        + [rng.uniform(z.bbox[1] - 1, z.bbox[3] + 1, 100) for z in zones]
    ).astype(F32)
    got = resolve_points(idx, lat, lng)
    want, _ = oracle_resolve(zones, lat, lng)
    np.testing.assert_array_equal(got, want)
