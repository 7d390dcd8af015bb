"""GeoJSON ingest quirks + the TimezoneLookup facade (reference API parity)."""

import json
import os
import zipfile

import numpy as np
import pytest

from tzspark.api import TimezoneLookup
from tzspark.geojson import zones_from_geojson, zones_from_geojson_zip
from tzspark.zones import make_zones

FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"tzid": "Test/Poly"},
            "geometry": {
                "type": "Polygon",
                # outer [0,10]^2 + hole [4,6]^2 — GeoJSON order is [lng, lat]
                "coordinates": [
                    [[0, 0], [10, 0], [10, 10], [0, 10]],
                    [[4, 4], [6, 4], [6, 6], [4, 6]],
                ],
            },
        },
        {
            "type": "Feature",
            "properties": {"tzid": "Test/Multi"},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [
                        [[20, 0], [30, 0], [30, 10], [20, 10]],
                        [[24, 4], [26, 4], [26, 6], [24, 6]],
                    ]
                ],
            },
        },
        {
            "type": "Feature",
            "properties": {"tzid": "Test/Invalid"},
            "geometry": {
                "type": "Polygon",
                # two vertices out of domain -> dropped (AddVertex semantics)
                "coordinates": [[[40, 0], [50, 0], [50, 200], [999, 10], [40, 10]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"tzid": "Test/Point"},
            "geometry": {"type": "Point", "coordinates": [1, 1]},  # skipped
        },
    ],
}


def test_polygon_rings_become_separate_zones():
    zones = zones_from_geojson(FC, mode="rings")
    by_tz = {}
    for z in zones:
        by_tz.setdefault(z.tzid, []).append(z)
    # Polygon: outer + hole = 2 rows, same tzid (import.go:141-153 quirk)
    assert len(by_tz["Test/Poly"]) == 2
    # MultiPolygon in rings mode: 2 rows too
    assert len(by_tz["Test/Multi"]) == 2
    # lng/lat swap: outer ring lat range is [0,10], lng range [0,10]
    z = by_tz["Test/Poly"][0]
    assert z.ring_lat.max() == 10 and z.ring_lng.max() == 10


def test_multipolygon_reference_mode_concatenates():
    zones = zones_from_geojson(FC, mode="reference")
    multi = [z for z in zones if z.tzid == "Test/Multi"]
    assert len(multi) == 1 and len(multi[0].ring_lat) == 8  # 4+4 concatenated
    # parity semantics: hole point outside, rim point inside
    tl = TimezoneLookup([multi[0]])
    assert tl.search(5.0, 25.0, knn=False).name == ""  # in hole -> out
    # rim point chosen east of the phantom "bridge" edges (lng 20..24) that
    # concatenation introduces — SURVEY.md §1.4 documents that rays crossing
    # a bridge get parity-flipped answers in the reference too
    assert tl.search(2.0, 27.0, knn=False).name == "Test/Multi"


def test_invalid_vertices_dropped():
    zones = zones_from_geojson(FC)
    inv = [z for z in zones if z.tzid == "Test/Invalid"][0]
    assert len(inv.ring_lat) == 3  # 2 of 5 dropped
    assert (np.abs(inv.ring_lat) <= 90).all() and (np.abs(inv.ring_lng) <= 180).all()


def test_zip_ingest(tmp_path):
    p = tmp_path / "tz.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("combined.JSON", json.dumps(FC))  # case-insensitive suffix
        zf.writestr("readme.txt", "ignored")
    zones = zones_from_geojson_zip(str(p))
    assert len(zones) == 5  # 2 + 2 + 1


def test_facade_search_and_roundtrip(tmp_path):
    zones = make_zones(n_coast=2000)
    tl = TimezoneLookup(zones, cache_dir=str(tmp_path / "cache"))
    r = tl.search(3.0, 3.0)
    assert r.name == "Test/Zone_0_0" and r.elapsed >= 0
    # float32 truncation happens inside (echoed coords are the f32 values)
    r2 = tl.search(37.7749, 10.0)
    assert r2.lat == float(np.float32(37.7749))
    # invalid -> error (ErrCoordinatesNotValid, timezone.go:62-64)
    with pytest.raises(ValueError):
        tl.search(95.0, 0.0)
    # unmatched without kNN -> empty name ("" result, timezone.go:77)
    assert tl.search(35.0, 10.0, knn=False).name == ""
    assert tl.search(35.0, 10.0, knn=True).name != ""

    # save -> load -> identical answers; cover cache hit on reload
    db = str(tmp_path / "zones.parquet")
    tl.save(db)
    tl2 = TimezoneLookup.load(db, cache_dir=str(tmp_path / "cache"))
    lat = np.linspace(-5, 43, 200, dtype=np.float32)
    lng = np.linspace(-5, 43, 200, dtype=np.float32)
    np.testing.assert_array_equal(tl.search_many(lat, lng), tl2.search_many(lat, lng))


def test_facade_readme_fixture_points():
    """The reference README/CLI example coordinates run through search()
    without error (README.md:31-34, cmd/main.go:21-22) — values resolve
    against our synthetic zone set, exercising the same code path."""
    tl = TimezoneLookup(make_zones(n_coast=2000))
    for lat, lng in [(37.7749, -122.4194), (5.261417, -3.925778), (-31.9523, 115.8613)]:
        r = tl.search(lat, lng)
        assert isinstance(r.name, str)


def test_search_validates_after_f32_truncation():
    """Reference parity: NewLatLng truncates to float32 BEFORE Valid()
    (geo/latlng.go:24-31), so 90.0000001 (f32 -> 90.0) is a valid input."""
    import pytest as _pytest

    from tzspark.api import TimezoneLookup
    from tzspark.zones import make_zones

    tl = TimezoneLookup(make_zones(n_coast=500))
    r_edge = tl.search(90.0000001, 10.0)  # would raise under pre-truncation checks
    assert r_edge.lat == 90.0
    with _pytest.raises(ValueError):
        tl.search(90.001, 10.0)  # still out of domain after truncation


def test_geojson_keeps_f32_roundable_edge_vertices():
    """AddVertex truncates then validates: a vertex at 90.0000001 survives."""
    from tzspark.geojson import _ring_to_arrays

    la, lg = _ring_to_arrays([[10.0, 90.0000001], [10.0, 91.0], [11.0, 89.0]])
    assert la.tolist() == [90.0, 89.0]  # 91.0 dropped, 90.0000001 kept as 90.0


def _fixture_zip(tmp_path):
    p = tmp_path / "src" / "tz.geojson.zip"
    p.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("combined.json", json.dumps(FC))
    return p


def test_fetch_and_cache_file_protocol(tmp_path):
    """S1 (fetchAndCacheFile, import.go:68-90 + the stat check,
    import.go:31-36): first call copies through the transport, second call
    reuses the cache without touching the transport, and a transport
    failure leaves no (partial) cache behind."""
    from tzspark.fetch import fetch_and_cache_file

    src = _fixture_zip(tmp_path)
    cache = str(tmp_path / "cache.zip")
    calls = []

    def transport(url):
        calls.append(url)
        return open(src, "rb")

    assert fetch_and_cache_file(cache, "x://src", transport=transport) == cache
    assert open(cache, "rb").read() == open(src, "rb").read()
    fetch_and_cache_file(cache, "x://src", transport=transport)
    assert calls == ["x://src"]  # second call served from cache

    def boom(url):
        raise OSError("no route")

    bad = str(tmp_path / "bad.zip")
    with pytest.raises(OSError):
        fetch_and_cache_file(bad, "x://gone", transport=boom)
    assert not os.path.exists(bad) and not os.path.exists(bad + ".part")


def test_import_zip_url_file_scheme(tmp_path):
    """The default transport (urllib) drives file:// URLs end-to-end — the
    offline stand-in for the reference's http download; going live is only
    a URL swap. Non-.zip cache names are rejected like import.go:48-50."""
    from tzspark.fetch import import_zip_url

    src = _fixture_zip(tmp_path)
    cache = str(tmp_path / "cached.zip")
    zones = import_zip_url(cache, src.as_uri())
    assert len(zones) == 5 and os.path.exists(cache)
    with pytest.raises(ValueError, match="not a zip"):
        import_zip_url(str(tmp_path / "cache.tar"), src.as_uri())


def test_cli_build_from_url(tmp_path, capsys, monkeypatch):
    """-build -url compiles through the fetch seam (file:// fixture) and
    the db round-trips through -search; a transport failure exits 1 with
    the fallback guidance instead of a traceback."""
    from tzspark.__main__ import main

    src = _fixture_zip(tmp_path)
    monkeypatch.chdir(tmp_path)
    db = str(tmp_path / "zones.parquet")
    rc = main(["-build", "-url", src.as_uri(), "-cache",
               str(tmp_path / "dl.zip"), "-db", db])
    assert rc == 0 and "compiled 5 zones" in capsys.readouterr().out
    rc = main(["-search", "-db", db, "-lat", "5", "-lng", "5"])
    assert rc == 0 and "Timezone:" in capsys.readouterr().out

    rc = main(["-build", "-url", "file:///nonexistent/x.zip", "-db", db])
    assert rc == 1 and "-zip <file>" in capsys.readouterr().err

    rc = main(["-build", "-url", "https://example.com/not-a-zip.tar", "-db", db])
    assert rc == 1 and "not a zip" in capsys.readouterr().err


def test_geojson_roundtrip_exact(tmp_path):
    """write_geojson_zip -> zones_from_geojson_zip restores the exact zone
    table: dense ids, tzids, bitwise-identical float32 rings."""
    from tzspark.geojson import write_geojson_zip, zones_to_geojson

    zones = make_zones(n_coast=500)
    path = write_geojson_zip(zones, str(tmp_path / "export.zip"))
    back = zones_from_geojson_zip(path)
    assert len(back) == len(zones)
    for a, b in zip(zones, back):
        assert (a.zone_id, a.tzid) == (b.zone_id, b.tzid)
        assert np.array_equal(a.ring_lat, b.ring_lat)
        assert np.array_equal(a.ring_lng, b.ring_lng)
    # same-tzid runs collapse into one MultiPolygon feature
    obj = zones_to_geojson(zones)
    n_tzid_runs = 1 + sum(
        1 for i in range(1, len(zones)) if zones[i].tzid != zones[i - 1].tzid
    )
    assert len(obj["features"]) == n_tzid_runs
    assert all(f["geometry"]["type"] == "MultiPolygon" for f in obj["features"])
