"""Reference-exact v2 binary timezone-database format (S6/S7/S8 parity).

Byte layout (little-endian, timezone.go:119-163 encode / 143-196 decode;
comment at timezone.go:233-235):

    header (10 B):  u32 headerLength | u32 dataLength | u16 itemCount
    per item:       u32 arr[i] (cumulative END byte-offset into the blob)
                    | u8 nameLen | name bytes
    vertex blob:    per polygon, the raw []LatLng reinterpret — f32 lat then
                    f32 lng per vertex (geo/polygon.go:119-127 toByteSlice;
                    struct field order LatLng{Lat, Lng}, latlng.go:15-17)

Two reference quirks are reproduced (and asserted in tests) so a file we
write is byte-identical to what the reference's Save would produce:

1. headerLength is computed as ``10 + items * (5 + items)`` — the Go loop
   adds ``len(tzc.name)`` (the SLICE length, i.e. the item count) instead of
   ``len(tzc.name[i])`` (timezone.go:129-134). The value round-trips into
   ``dataOffset`` on load but is never used to locate the blob — Load
   derives the real offset from the bytes it actually discarded
   (timezone.go:179-191), so lookups are unaffected.
2. arr[] holds cumulative end offsets in BYTES (8 per vertex); for a fresh
   cache the first entry is just the first polygon's byte length
   (timezone.go:29-45 AddTimezone).

Limits inherited from the format: <= 65535 polygon rows (u16 itemCount),
<= 255-byte names (u8 nameLen), < 4 GiB blob (u32 offsets). The engine's
parquet cover snapshots have none of these limits; this module exists so a
reference user can hand their compiled ``timezone.data`` to this repo (or
take ours back) without re-ingesting GeoJSON.
"""

from __future__ import annotations

import struct

import numpy as np

from .cells import Zone
from .geom import F32

_HEADER = struct.Struct("<IIH")
_ITEM_FIXED = struct.Struct("<IB")


def save_binary(zones: list, path: str) -> int:
    """Write zones in the reference's exact v2 on-disk format.

    Returns the number of bytes written. Zone rows map 1:1 to reference
    items in zone_id order (the reference flattens one item per polygon,
    import.go:141-172); names are the tzids.
    """
    zones = sorted(zones, key=lambda z: z.zone_id)
    if len(zones) > 0xFFFF:
        raise ValueError(f"{len(zones)} items exceed the format's u16 count")
    blobs, items = [], []
    end = 0
    for z in zones:
        lat = np.asarray(z.ring_lat, dtype=F32)
        lng = np.asarray(z.ring_lng, dtype=F32)
        inter = np.empty(lat.shape[0] * 2, dtype=F32)
        inter[0::2] = lat  # LatLng{Lat, Lng} memory order
        inter[1::2] = lng
        buf = inter.tobytes()  # little-endian f32 on every supported platform
        end += len(buf)
        name = z.tzid.encode("utf-8")
        if len(name) > 0xFF:
            raise ValueError(f"name too long for u8 length: {z.tzid!r}")
        blobs.append(buf)
        items.append((end, name))
    if end >= 1 << 32:
        raise ValueError("vertex blob exceeds the format's u32 offsets")

    n = len(items)
    header_length = 10 + n * (5 + n)  # reference quirk #1 (timezone.go:129-134)
    out = [_HEADER.pack(header_length, end, n)]
    for arr_i, name in items:
        out.append(_ITEM_FIXED.pack(arr_i, len(name)))
        out.append(name)
    out.extend(blobs)
    data = b"".join(out)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_binary(path: str, mmap: bool = True) -> list:
    """Read a reference v2 file back into Zone rows (dense zone_id order).

    Mirrors Load (timezone.go:165-196): the blob offset is the actual size
    of the header + item section, NOT the stored headerLength quirk value.
    bboxes are recomputed exactly like the engine's ingest (ring_bbox).

    ``mmap=True`` reproduces the format's defining v2 trick (timezone.go:192
    MmapFile; PolygonFromBytes reinterprets the mapped region in place,
    geo/polygon.go:119-144, timezone.go:216-231): only the header and the
    item section are read eagerly; every ring array is a strided view into
    one ``np.memmap`` of the vertex blob, so vertices page in on first
    touch. At the format's 4 GiB limit an open costs ~header-size I/O, not
    a full-file read. ``mmap=False`` returns owned arrays (use when the
    zones must outlive the file, e.g. before rewriting it in place).
    """
    import os

    with open(path, "rb") as f:
        head = f.read(10)
        if len(head) < 10:
            raise ValueError("file shorter than the 10-byte header")
        _header_len_quirk, data_len, n = _HEADER.unpack_from(head, 0)
        # item section: bounded by 65535 * (5 + 255) bytes — always small
        items_raw = f.read(n * 5 + 0xFF * n if n else 0)
    pos = 0
    arr, names = [], []
    for _ in range(n):
        end, name_len = _ITEM_FIXED.unpack_from(items_raw, pos)
        pos += 5
        names.append(items_raw[pos : pos + name_len].decode("utf-8"))
        pos += name_len
        arr.append(end)
    buf_offset = 10 + pos  # == discarded bytes in Load (timezone.go:190)
    if os.path.getsize(path) < buf_offset + data_len:
        raise ValueError("file truncated: blob shorter than dataLength")
    if mmap and data_len:
        blob = np.memmap(
            path, dtype="<f4", mode="r", offset=buf_offset, shape=(data_len // 4,)
        )
    else:
        with open(path, "rb") as f:
            f.seek(buf_offset)
            blob = np.frombuffer(f.read(data_len), dtype="<f4")
    zones = []
    prev = 0
    for zid, (end, name) in enumerate(zip(arr, names)):
        inter = blob[prev // 4 : end // 4]
        prev = end
        lat = inter[0::2]
        lng = inter[1::2]
        if not mmap:
            lat, lng = lat.astype(F32), lng.astype(F32)
        zones.append(Zone(zone_id=zid, tzid=name, ring_lat=lat, ring_lng=lng))
    return zones
