"""Deterministic synthetic image+caption table (the points side).

Exactly the BASELINE.json input_hint shape:
    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

Generated DISTRIBUTED (mapInPandas over a row-index range — each partition
synthesizes its own rows; nothing is collected to the driver), deterministic
in the row index alone, so any scale factor reproduces bit-identically and a
resumed job regenerates identical partitions.

Coordinate distribution (FIXTURES.md §1): ~80% of rows drawn from 5 "urban"
hot cells (Zipf-ish skew — exercises salting/AQE), ~15% uniform over the
synthetic zone region, ~5% offshore in the uncovered strips (kNN fallback
path). Derived from splitmix64-style integer hashing of the row index — no
RNG state, fully order-independent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .geom import F32
from .imagecodec import FMT_CODES

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

WS = (8, 16, 32)
HS = (8, 16, 24)
FMTS = ("raw", "rle", "qnt")

# 5 urban hot spots inside lattice zones (lat, lng), FIXTURES.md §1
HOT = np.array(
    [(3.0, 3.0), (9.5, 15.5), (15.2, 27.3), (21.0, 9.0), (3.5, 33.0)], dtype=np.float64
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic integer hash (public splitmix64 constants)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _u01(i: np.ndarray, stream: int) -> np.ndarray:
    """Uniform [0,1) keyed on (row index, stream id)."""
    h = _splitmix64(i.astype(np.uint64) * np.uint64(1315423911) + np.uint64(stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synth_coords(i: np.ndarray):
    """Vectorized (lat, lng) float32 for row indices i."""
    i = np.asarray(i, dtype=np.int64)
    sel = _u01(i, 1)
    u1 = _u01(i, 2)
    u2 = _u01(i, 3)
    hot_k = (_u01(i, 4) * len(HOT)).astype(np.int64).clip(0, len(HOT) - 1)

    lat = np.empty(i.shape[0], dtype=np.float64)
    lng = np.empty(i.shape[0], dtype=np.float64)

    hot = sel < 0.80  # tight 0.5-degree blobs around the hot spots
    lat[hot] = HOT[hot_k[hot], 0] + (u1[hot] - 0.5) * 0.5
    lng[hot] = HOT[hot_k[hot], 1] + (u2[hot] - 0.5) * 0.5

    uni = (sel >= 0.80) & (sel < 0.95)  # uniform over the covered region
    lat[uni] = -6.0 + u1[uni] * 48.0
    lng[uni] = -6.0 + u2[uni] * 48.0

    off = sel >= 0.95  # offshore strips (uncovered -> kNN)
    lat[off] = np.where(u2[off] < 0.5, 34.5 + u1[off] * 1.0, 24.5 + u1[off] * 1.0)
    lng[off] = -6.0 + u2[off] * 48.0

    return lat.astype(F32), lng.astype(F32)


def synth_images_pdf(i: np.ndarray, tzid_hint=None) -> pd.DataFrame:
    """Build one pandas batch of image rows for row indices i.

    Vectorized per (w, h, fmt) shape group (the i%3 cycle): one batched
    pixel synthesis + one header build per group; bit-identical per row to
    encode_image (pinned by tests/test_imagecodec.py). The only per-row
    Python left is the blake2b phash and the rle payload split — hashing is
    inherently per-row, and rle runs are row-delimited by construction.
    """
    import hashlib

    from .imagecodec import (
        _HEADER_DTYPE,
        MAGIC,
        rle_encode,
        synth_pixels_batch,
    )

    i = np.asarray(i, dtype=np.int64)
    n = i.shape[0]
    lat, lng = synth_coords(i)
    bufs = [None] * n
    phash = np.zeros(n, dtype=np.int64)
    m = (i % 3).astype(np.int64)
    for g in range(3):
        rows = np.flatnonzero(m == g)
        if rows.size == 0:
            continue
        w, h, fmt = WS[g], HS[g], FMTS[g]
        pix = synth_pixels_batch(i[rows], w, h)
        flat = pix.reshape(rows.size, -1)
        hdrs = np.zeros(rows.size, dtype=_HEADER_DTYPE)
        hdrs["magic"] = MAGIC
        hdrs["lat"] = lat[rows]
        hdrs["lng"] = lng[rows]
        hdrs["w"] = w
        hdrs["h"] = h
        hdrs["fmt"] = FMT_CODES[fmt]
        hb = hdrs.view(np.uint8).reshape(rows.size, -1)
        if fmt == "raw":
            payload = flat
        elif fmt == "qnt":
            payload = flat >> 2
        else:
            payload = None  # rle: variable length, encoded per row below
        for k in range(rows.size):
            row_flat = flat[k]
            pb = rle_encode(row_flat) if payload is None else payload[k].tobytes()
            bufs[rows[k]] = hb[k].tobytes() + pb
            phash[rows[k]] = int.from_bytes(
                hashlib.blake2b(row_flat.tobytes(), digest_size=8).digest(),
                "little",
                signed=True,
            )
    pdf = pd.DataFrame(
        {
            "image_id": [f"img{int(ii):012d}" for ii in i],
            "bytes": bufs,
            "w": np.array(WS, dtype=np.int32)[m],
            "h": np.array(HS, dtype=np.int32)[m],
            "fmt": pd.Categorical.from_codes(m, categories=list(FMTS)).astype(str),
            "caption": [f"cap {int(ii)}" for ii in i],
            "phash": phash,
        }
    )
    return pdf


def images_df(spark: SparkSession, n_rows: int, partitions: int = None) -> DataFrame:
    """Distributed synthesis of the image table: spark.range -> mapInPandas.

    Each partition builds only its own index range; scales to any n_rows
    without driver memory growth (the 10^12-row shape scaled down)."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def _gen(batches):
        for pdf in batches:
            yield synth_images_pdf(pdf["id"].to_numpy())

    return spark.range(0, n_rows, 1, partitions).mapInPandas(_gen, IMAGES_SCHEMA)


def images_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image table keyed on the driver-provided events table (event_id as the
    row index) — ties the flagship query to /root/testdata inputs."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    # Small SF parquet arrives as one file -> one partition; spread the
    # 8-byte ids so synthesis (the expensive part) uses every core. At
    # cluster scale the input is already many splits and this no-ops cost-wise
    # (the shuffle payload is just the id column).
    ev = ev.repartition(max(8, spark.sparkContext.defaultParallelism))

    def _gen(batches):
        for pdf in batches:
            yield synth_images_pdf(pdf["event_id"].to_numpy())

    return ev.mapInPandas(_gen, IMAGES_SCHEMA)


def synth_embeddings(i: np.ndarray, dims: int = 64) -> np.ndarray:
    """Deterministic float32 embedding block for row indices i: dim j of
    row r is u01(r*dims + j) mapped to [-1, 1). Vectorized; the same
    formula serves Spark synthesis and driver-side probe construction."""
    i = np.asarray(i, dtype=np.int64)
    flat = (i[:, None] * np.int64(dims) + np.arange(dims, dtype=np.int64)).ravel()
    return (2.0 * _u01(flat, 7) - 1.0).astype(np.float32).reshape(len(i), dims)


def embeddings_df(
    spark: SparkSession, n_rows: int, dims: int = 64, partitions: int = None
) -> DataFrame:
    """Distributed synthesis of an embeddings table (vec_id, embedding:
    array<float>) — the 10^12-vector shape scaled down; each partition
    builds only its own index range."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            emb = synth_embeddings(ids, dims)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(emb)}
            )

    return spark.range(0, n_rows, 1, partitions).mapInPandas(
        _gen, "vec_id long, embedding array<float>"
    )
