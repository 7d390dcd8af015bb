"""CLI, mirroring the reference's cmd/main.go surface:

    python -m tzspark -build -zip tz.geojson.zip -db zones.parquet
    python -m tzspark -search -db zones.parquet -lat -31.9523 -lng 115.8613
    python -m tzspark -search -synthetic -lat 3 -lng 3

Reference flags (cmd/main.go:18-27): -build downloads+compiles the db,
-search -lat -lng queries it (defaults lat=-31.9523, lng=115.8613). Here
-build compiles from a local GeoJSON zip (the sandbox is offline — the
download step S1 is out of scope, SURVEY §2.1) and -search prints the same
fields the reference CLI prints (name, coords, elapsed — cmd/main.go:46).
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
        help="download URL for -build (reference parity: fetchAndCacheFile, "
        "import.go:68-90). NOT available in this offline build — download the "
        "zip yourself and pass it via -zip.",
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
            print(
                "error: the -url download path (reference S1, fetchAndCacheFile "
                "import.go:68-90) needs network access, which this environment "
                "does not have; download the GeoJSON zip yourself and pass it "
                "with -zip <file>",
                file=sys.stderr,
            )
            return 1
        if not args.zipfile:
            ap.error("-build requires -zip <geojson.zip> (or -url, unavailable offline)")
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
