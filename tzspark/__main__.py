"""CLI, mirroring the reference's cmd/main.go surface:

    python -m tzspark -build -zip tz.geojson.zip -db zones.parquet
    python -m tzspark -search -db zones.parquet -lat -31.9523 -lng 115.8613
    python -m tzspark -search -synthetic -lat 3 -lng 3

Reference flags (cmd/main.go:18-27): -build downloads+compiles the db,
-search -lat -lng queries it (defaults lat=-31.9523, lng=115.8613). -build
takes either a local zip (-zip) or a source URL (-url, fetched through the
S1 cache seam in fetch.py — file:// works offline, http(s) when networked);
-search prints the same fields the reference CLI prints (name, coords,
elapsed — cmd/main.go:46).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tzspark", add_help=True)
    ap.add_argument("-build", action="store_true", help="compile a zone db")
    ap.add_argument("-search", action="store_true", help="look up a coordinate")
    ap.add_argument("-zip", dest="zipfile", help="GeoJSON zip to compile (build)")
    ap.add_argument(
        "-url",
        help="zone-source URL for -build (reference parity: fetchAndCacheFile, "
        "import.go:68-90): downloaded to -cache unless the cache exists, then "
        "compiled. file:// URLs work offline; http(s) needs network access.",
    )
    ap.add_argument(
        "-cache",
        help="cache path for -url downloads (ImportZipFile's cache file, "
        "import.go:29-36); default: the URL basename in the working dir",
    )
    ap.add_argument(
        "-db", default="zones.parquet",
        help="zone db path; .parquet = engine snapshot, anything else = the "
        "reference's v2 binary format (timezone.go Save layout, binfmt.py) — "
        "an existing timezone.data works directly",
    )
    ap.add_argument("-lat", type=float, default=-31.9523)  # cmd/main.go:21
    ap.add_argument("-lng", type=float, default=115.8613)  # cmd/main.go:22
    ap.add_argument("-synthetic", action="store_true",
                    help="use the built-in synthetic zone set instead of -db")
    ap.add_argument("-no-knn", action="store_true",
                    help="disable the nearest-zone fallback")
    ap.add_argument("-protocol", choices=("argmin", "as_written"), default="argmin",
                    help="match semantics: deterministic argmin(zone_id) "
                    "(engine default) or the reference's as-written "
                    "abort-on-miss callback protocol (timezone.go:66-76), "
                    "candidates in ascending zone_id order")
    args = ap.parse_args(argv)

    from .api import TimezoneLookup

    if args.build:
        if args.url:
            from .fetch import fetch_and_cache_file

            cache = args.cache or args.url.rstrip("/").rsplit("/", 1)[-1]
            if not cache.lower().endswith(".zip"):
                print("error not a zip file", file=sys.stderr)  # import.go:48-50
                return 1
            try:
                args.zipfile = fetch_and_cache_file(cache, args.url)
            except OSError as e:
                print(
                    f"error: fetching {args.url} failed ({e}); if this "
                    "environment is offline, download the zip yourself and "
                    "pass it with -zip <file>",
                    file=sys.stderr,
                )
                return 1
        if not args.zipfile:
            ap.error("-build requires -zip <geojson.zip> or -url <source>")
        tl = TimezoneLookup.from_geojson_zip(args.zipfile)
        if args.db.endswith(".parquet"):
            tl.save(args.db)
        else:
            tl.save_reference_binary(args.db)
        print(f"compiled {len(tl.zones)} zones -> {args.db}")
        return 0

    if args.search:
        if args.synthetic:
            from .zones import make_zones

            tl = TimezoneLookup(make_zones())
        elif args.db.endswith(".parquet"):
            tl = TimezoneLookup.load(args.db)
        else:
            tl = TimezoneLookup.from_reference_binary(args.db)
        try:
            r = tl.search(args.lat, args.lng, knn=not args.no_knn,
                          protocol=args.protocol)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(f"Timezone: {r.name!r}  Lat: {r.lat}  Lng: {r.lng}  "
              f"Elapsed: {r.elapsed * 1e6:.0f}us")
        return 0

    ap.print_help()
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
