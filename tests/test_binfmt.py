"""Reference v2 binary format (binfmt.py): byte-level structure, quirks,
round-trip fidelity, and engine equality after a save/load cycle."""

import struct

import numpy as np
import pytest

from tzspark.binfmt import load_binary, save_binary
from tzspark.cells import Zone, compile_cover, resolve_points
from tzspark.geom import F32
from tzspark.zones import make_zones


def _small_zones():
    return [
        Zone(0, "A/Zero", [0.0, 0.0, 4.0, 4.0], [0.0, 4.0, 4.0, 0.0]),
        Zone(1, "B/One", [10.0, 10.0, 12.5, 12.5, 11.0],
             [10.0, 12.0, 12.0, 10.0, 9.5]),
    ]


def test_golden_bytes_layout(tmp_path):
    """Hand-computed byte check: header, items, blob offsets and the
    reference's quirky headerLength value (timezone.go:129-134 adds the
    slice LENGTH, not the name length)."""
    p = str(tmp_path / "tz.data")
    n_bytes = save_binary(_small_zones(), p)
    raw = open(p, "rb").read()
    assert len(raw) == n_bytes

    header_len, data_len, items = struct.unpack_from("<IIH", raw, 0)
    assert items == 2
    assert data_len == 4 * 8 + 5 * 8  # 4-vertex + 5-vertex rings, 8 B/vertex
    assert header_len == 10 + 2 * (5 + 2)  # the quirk: 10 + items*(5+items)

    # item 0: arr end-offset 32, nameLen 6, "A/Zero"
    arr0, nlen0 = struct.unpack_from("<IB", raw, 10)
    assert (arr0, nlen0) == (32, 6)
    assert raw[15:21] == b"A/Zero"
    arr1, nlen1 = struct.unpack_from("<IB", raw, 21)
    assert (arr1, nlen1) == (32 + 40, 5)
    assert raw[26:31] == b"B/One"

    # blob: f32 lat then lng per vertex, little-endian (polygon.go:119-127)
    blob = np.frombuffer(raw[31:], dtype="<f4")
    assert blob[0] == 0.0 and blob[1] == 0.0  # v0 of zone 0
    assert blob[8] == 10.0 and blob[9] == 10.0  # v0 of zone 1 (offset 32 B)


def test_roundtrip_bitexact(tmp_path):
    p = str(tmp_path / "tz.data")
    zones = make_zones(n_coast=500)
    save_binary(zones, p)
    back = load_binary(p)
    assert len(back) == len(zones)
    for a, b in zip(zones, back):
        assert a.zone_id == b.zone_id and a.tzid == b.tzid
        np.testing.assert_array_equal(
            np.asarray(a.ring_lat, F32), b.ring_lat
        )
        np.testing.assert_array_equal(
            np.asarray(a.ring_lng, F32), b.ring_lng
        )
        assert a.bbox == b.bbox  # recomputed, must agree


def test_save_load_save_idempotent(tmp_path):
    p1, p2 = str(tmp_path / "a.data"), str(tmp_path / "b.data")
    zones = make_zones(n_coast=200)
    save_binary(zones, p1)
    save_binary(load_binary(p1), p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_engine_equal_after_binary_cycle(tmp_path):
    """Compile-from-loaded == compile-from-original on random lookups."""
    p = str(tmp_path / "tz.data")
    zones = make_zones(n_coast=300)
    save_binary(zones, p)
    idx_a = compile_cover(zones)
    idx_b = compile_cover(load_binary(p))
    rng = np.random.default_rng(7)
    lat = rng.uniform(-10, 40, 2000).astype(F32)
    lng = rng.uniform(-10, 50, 2000).astype(F32)
    np.testing.assert_array_equal(
        resolve_points(idx_a, lat, lng), resolve_points(idx_b, lat, lng)
    )


def test_facade_binary_cycle(tmp_path):
    from tzspark.api import TimezoneLookup

    p = str(tmp_path / "tz.data")
    tl = TimezoneLookup(make_zones(n_coast=200))
    tl.save_reference_binary(p)
    tl2 = TimezoneLookup.from_reference_binary(p)
    r1 = tl.search(3.0, 3.0)
    r2 = tl2.search(3.0, 3.0)
    assert r1.name == r2.name != ""


def test_format_limits(tmp_path):
    p = str(tmp_path / "tz.data")
    long_name = Zone(0, "x" * 300, [0.0, 1.0, 1.0], [0.0, 0.0, 1.0])
    with pytest.raises(ValueError, match="name too long"):
        save_binary([long_name], p)


def test_truncated_file_rejected(tmp_path):
    p = str(tmp_path / "tz.data")
    save_binary(_small_zones(), p)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-8])  # chop the blob tail
    with pytest.raises(ValueError, match="truncated"):
        load_binary(p)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1, max_size=40,
            ),
            st.lists(
                st.tuples(
                    st.floats(-90, 90, width=32, allow_nan=False),
                    st.floats(-180, 180, width=32, allow_nan=False),
                ),
                min_size=2, max_size=12,
            ),
        ),
        min_size=1, max_size=8,
    )
)
def test_roundtrip_property(tmp_path_factory, zones_spec):
    """Any zone list (arbitrary names, arbitrary f32 rings) survives a
    save/load cycle bit-exactly and idempotently."""
    p = str(tmp_path_factory.mktemp("binfmt") / "tz.data")
    zones = [
        Zone(i, name, np.array([v[0] for v in verts], F32),
             np.array([v[1] for v in verts], F32))
        for i, (name, verts) in enumerate(zones_spec)
    ]
    save_binary(zones, p)
    back = load_binary(p)
    assert [(z.tzid, z.ring_lat.tobytes(), z.ring_lng.tobytes()) for z in zones] \
        == [(z.tzid, z.ring_lat.tobytes(), z.ring_lng.tobytes()) for z in back]
    p2 = p + ".2"
    save_binary(back, p2)
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_mmap_load_lazy_views(tmp_path):
    """mmap mode (the reference's defining v2 trick, timezone.go:192,
    216-231): ring arrays must be strided views into ONE shared np.memmap of
    the vertex blob — no per-zone copies, vertices paged in on demand — and
    value-identical to the eager load."""
    p = str(tmp_path / "tz.data")
    save_binary(_small_zones(), p)
    lazy = load_binary(p, mmap=True)
    eager = load_binary(p, mmap=False)
    maps = set()
    for lz, ez in zip(lazy, eager):
        assert np.array_equal(lz.ring_lat, ez.ring_lat)
        assert np.array_equal(lz.ring_lng, ez.ring_lng)
        assert not lz.ring_lat.flags.owndata  # a view, not a copy
        base = lz.ring_lat
        while isinstance(base.base, np.ndarray):
            base = base.base
        assert isinstance(base, np.memmap)
        maps.add(id(base))
    assert len(maps) == 1  # one mapping shared by every zone


def test_mmap_load_compiles_and_resolves(tmp_path):
    """The memmap-backed zones must drive the cover compiler and kernels
    unchanged (read-only strided input is part of the kernel contract)."""
    from tzspark.cells import compile_cover, resolve_points

    p = str(tmp_path / "tz.data")
    save_binary(_small_zones(), p)
    lazy = load_binary(p, mmap=True)
    idx = compile_cover(lazy)
    idx2 = compile_cover(load_binary(p, mmap=False))
    la = np.array([0.5, 1.5, 50.0], F32)
    lg = np.array([0.5, 1.5, 50.0], F32)
    assert np.array_equal(resolve_points(idx, la, lg), resolve_points(idx2, la, lg))
