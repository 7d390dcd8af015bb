"""S1: fetch-and-cache of the zone-source zip (reference import.go parity).

The reference's `-build` first downloads the timezone-boundary-builder
release zip unless a cached copy exists (ImportZipFile's stat check,
import.go:29-44, and fetchAndCacheFile's streaming copy, import.go:68-90).
This module reproduces that seam with an injectable transport so the cache
protocol is fully testable offline: the default transport is
urllib.request.urlopen, which handles http(s):// when the environment has
network access and file:// always — tests drive the whole path against a
file:// fixture, so going live is exactly one real URL away.
"""

from __future__ import annotations

import os
import shutil
import urllib.request

# the reference's pinned release (import.go:26-27 DefaultURL)
DEFAULT_URL = (
    "https://github.com/evansiroky/timezone-boundary-builder/releases/"
    "download/2020d/timezones-with-oceans.geojson.zip"
)


def fetch_and_cache_file(cache_path: str, url: str, transport=None) -> str:
    """Download ``url`` into ``cache_path`` unless the cache already exists.

    Mirrors ImportZipFile's stat-then-fetch (import.go:31-36) and
    fetchAndCacheFile's streamed copy (import.go:68-90; io.Copy — the body
    is never held in memory). ``transport(url) -> file-like`` defaults to
    urllib.request.urlopen. Returns ``cache_path``. A partial download is
    never left behind as a valid cache: the copy lands in a temp file that
    is renamed into place only on success.
    """
    if os.path.exists(cache_path):
        return cache_path
    opener = transport if transport is not None else urllib.request.urlopen
    tmp = cache_path + ".part"
    try:
        with opener(url) as resp, open(tmp, "wb") as f:
            shutil.copyfileobj(resp, f)
        os.replace(tmp, cache_path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return cache_path


def import_zip_url(cache_path: str, url: str, mode: str = "rings", transport=None):
    """ImportZipFile analog (import.go:29-56): fetch-or-reuse the cached
    zip, reject non-.zip names (import.go:48-50 "error not a zip file"),
    and decode every .json member into Zone rows."""
    from .geojson import zones_from_geojson_zip

    if not cache_path.lower().endswith(".zip"):
        raise ValueError("error not a zip file")
    fetch_and_cache_file(cache_path, url, transport=transport)
    return zones_from_geojson_zip(cache_path, mode=mode)
