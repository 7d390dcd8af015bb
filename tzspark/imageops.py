"""Multimodal image operators over the binary column (training-data path).

Image/audio libraries are not in this container, so the codec is our own
(imagecodec.py) — the point here is the SPARK-side plumbing: schemas, Arrow
batch shape, partition-local decode (never shuffle multi-KB payloads), and
vectorized per-batch numpy. Operators:

* features    — per-image stats (mean RGB, luma, phash verify) from ONE
  vectorized batch pass (imagecodec.batch_image_stats); the only per-image
  Python left is the blake2b call of the phash verify itself
* resize_nn   — nearest-neighbor resize, re-encoded into the same container;
  output pixels gather directly from the packed payload stream per
  (h, w)-shape group — no per-image decode, no per-image bytes objects
* frame_sample— every k-th frame per clip (deterministic window sample)
* A real JPEG/PNG decode would slot into the batch kernels below; formats
  outside our container are routed to a 'failed' flag rather than failing
  the job.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imagecodec import FMT_CODES, HEADER_LEN

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash_ok", T.BooleanType(), True),
        T.StructField("decode_failed", T.BooleanType(), False),
    ]
)


def _offsets32(lens: np.ndarray) -> np.ndarray:
    """int32 Arrow binary offsets from int64 per-row lengths, failing
    LOUDLY if the batch's total payload would wrap 2 GiB (pa.binary()
    offsets are int32; a silent cumsum(...).astype(int32) would wrap and
    corrupt every blob after the overflow point). Callers control batch
    size via spark.sql.execution.arrow.maxRecordsPerBatch; this guard
    turns a mis-sized batch into an error instead of corrupt tensors."""
    total = int(np.cumsum(lens, dtype=np.int64)[-1]) if lens.size else 0
    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"Arrow batch payload {total} B overflows int32 binary offsets "
            "(2 GiB); lower arrow.maxRecordsPerBatch or the output size"
        )
    off = np.zeros(lens.shape[0] + 1, np.int32)
    off[1:] = np.cumsum(lens).astype(np.int32)
    return off


def _phash_i64(buf) -> int:
    """blake2b-8 content hash of a pixel byte stream (== phash_pixels)."""
    return int.from_bytes(
        hashlib.blake2b(buf, digest_size=8).digest(), "little", signed=True
    )


def image_features(images: DataFrame) -> DataFrame:
    """Per-image feature stats + phash verification, fully vectorized.

    One mapInArrow stage: the payload column is consumed zero-copy from the
    Arrow buffers; means come from batch_image_stats' exact integer channel
    sums (no decode loop, no per-image pixel arrays). The ONLY per-image
    Python is the phash verify — one blake2b call per lossless row over the
    in-place payload bytes (raw) or the single global RLE decode stream —
    hashing is inherently per-row. (The round-2 form decoded every image in
    a Python loop; this was the last row-at-a-time decode on a hot path.)
    """
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import batch_image_stats

    def _feat(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            ph = batch.column(2).to_numpy(zero_copy_only=False)
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            bad = ~ok
            npx = np.maximum(st["n_pixels"], 1).astype(np.float64)
            ch = st["ch_sum"].astype(np.float64)

            # phash verify for lossless rows (raw: payload bytes in place;
            # rle: slices of the one global decode). qnt is lossy -> null.
            phash_ok = np.zeros(n, dtype=bool)
            has_phash = np.zeros(n, dtype=bool)
            ps = offs[:-1] + HEADER_LEN
            for i in np.flatnonzero(ok & (st["fmt_code"] == FMT_CODES["raw"])):
                phash_ok[i] = (
                    _phash_i64(data[ps[i] : ps[i] + 3 * st["n_pixels"][i]]) == ph[i]
                )
                has_phash[i] = True
            decoded, dstart, rle_rows, good = st["rle"]
            for j, i in enumerate(rle_rows):
                if good[j] and ok[i]:
                    phash_ok[i] = _phash_i64(decoded[dstart[j] : dstart[j + 1]]) == ph[i]
                    has_phash[i] = True

            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(st["w"].astype(np.int32), mask=bad),
                    pa.array(st["h"].astype(np.int32), mask=bad),
                    pa.array(ch[:, 0] / npx, mask=bad),
                    pa.array(ch[:, 1] / npx, mask=bad),
                    pa.array(ch[:, 2] / npx, mask=bad),
                    pa.array(st["luma_sum"] / npx, mask=bad),
                    pa.array(phash_ok, mask=bad | ~has_phash),
                    pa.array(bad),
                ],
                names=[f.name for f in FEATURES_SCHEMA.fields],
            )

    return images.select("image_id", "bytes", "phash").mapInArrow(
        _feat, FEATURES_SCHEMA
    )


CHANNEL_SUMS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def image_channel_sums(images: DataFrame) -> DataFrame:
    """Exact per-image decoded channel sums (int64), one zero-copy
    mapInArrow over batch_image_stats — no decode loop, no float error.
    Used by q30's value-level oracle over resized blobs; undecodable rows
    yield nulls."""
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import batch_image_stats

    def _sums(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs)
            ok = st["ok"] if valid is None else st["ok"] & valid
            bad = ~ok
            ch = st["ch_sum"]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(ch[:, 0], mask=bad),
                    pa.array(ch[:, 1], mask=bad),
                    pa.array(ch[:, 2], mask=bad),
                ],
                names=[f.name for f in CHANNEL_SUMS_SCHEMA.fields],
            )

    return images.select("image_id", "bytes").mapInArrow(
        _sums, CHANNEL_SUMS_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("decode_failed", T.BooleanType(), False),
    ]
)


def resize_nn_pixels(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (no PIL in this container)."""
    h, w = pix.shape[0], pix.shape[1]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pix[yi][:, xi]


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize every image to (out_w, out_h), re-encoding losslessly (raw)
    with the original GPS header preserved.

    Vectorized per (h, w)-shape group: nearest-neighbor only READS
    out_w*out_h*3 source bytes per image, so the resize gathers exactly those
    bytes straight out of the packed payload stream (raw/qnt: the Arrow data
    buffer; rle: the one global decode from batch_image_stats) with a single
    (k, out_bytes) fancy index per group — no per-image decode, no (h, w, 3)
    intermediates. Output blobs are fixed-length, so the whole output column
    is ONE (n, out_len) uint8 matrix handed to Arrow as a single buffer —
    zero per-image bytes objects in either direction.
    """
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import _HEADER_DTYPE, MAGIC, batch_image_stats

    out_npx = out_w * out_h
    out_len = HEADER_LEN + 3 * out_npx

    def _resize(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            bad = ~ok

            buf = np.zeros((n, out_len), np.uint8)
            hdrs = np.zeros(n, dtype=_HEADER_DTYPE)
            hdrs["magic"] = MAGIC
            hdrs["lat"] = st["lat"]
            hdrs["lng"] = st["lng"]
            hdrs["w"] = out_w
            hdrs["h"] = out_h
            hdrs["fmt"] = FMT_CODES["raw"]
            buf[:, :HEADER_LEN] = hdrs.view(np.uint8).reshape(n, HEADER_LEN)

            ps = offs[:-1] + HEADER_LEN
            decoded, dstart, rle_rows, good = st["rle"]
            rle_start = np.full(n, -1, np.int64)
            rle_start[rle_rows[good]] = dstart[:-1][good]
            fmtc = st["fmt_code"]
            h64, w64 = st["h"], st["w"]
            okw = np.flatnonzero(ok)
            is_rle_row = np.zeros(n, bool)
            is_rle_row[rle_rows] = True
            for hh, ww in set(zip(h64[okw].tolist(), w64[okw].tolist())):
                sel = okw[(h64[okw] == hh) & (w64[okw] == ww)]
                yi = (np.arange(out_h) * hh // out_h).clip(0, hh - 1)
                xi = (np.arange(out_w) * ww // out_w).clip(0, ww - 1)
                # byte position of each output pixel inside a packed payload
                pos = (3 * (yi[:, None] * ww + xi[None, :])).reshape(-1)
                pos3 = (pos[:, None] + np.arange(3)).reshape(-1)
                for rows, src, start, qnt in (
                    (sel[fmtc[sel] == FMT_CODES["raw"]], data, ps, False),
                    (sel[fmtc[sel] == FMT_CODES["qnt"]], data, ps, True),
                    (sel[is_rle_row[sel]], decoded, rle_start, False),
                ):
                    if rows.shape[0] == 0:
                        continue
                    g = src[start[rows][:, None] + pos3[None, :]]
                    buf[rows, HEADER_LEN:] = ((g << 2) + 2) if qnt else g

            # one Arrow buffer for the whole column: nulls get zero length
            lens = np.where(ok, out_len, 0).astype(np.int64)
            off32 = _offsets32(lens)
            values = pa.py_buffer(np.ascontiguousarray(buf[okw]).tobytes())
            validity = (
                None if ok.all() else pa.py_buffer(np.packbits(ok, bitorder="little"))
            )
            bytes_arr = pa.Array.from_buffers(
                pa.binary(), n, [validity, pa.py_buffer(off32), values],
                null_count=int(bad.sum()),
            )
            wcol = np.full(n, out_w, np.int32)
            hcol = np.full(n, out_h, np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    bytes_arr,
                    pa.array(wcol, mask=bad),
                    pa.array(hcol, mask=bad),
                    pa.array(bad),
                ],
                names=[f.name for f in RESIZED_SCHEMA.fields],
            )

    return images.select("image_id", "bytes").mapInArrow(_resize, RESIZED_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("b0", T.LongType(), True),
        T.StructField("b1", T.LongType(), True),
        T.StructField("b2", T.LongType(), True),
        T.StructField("b3", T.LongType(), True),
    ]
)


def image_ahash(images: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of every image, as four 16-bit bands.

    The classic aHash: downsample the DECODED image to 8x8 (the same
    nearest-neighbor gather as resize_images — only 64*3 source bytes are
    read per image, straight from the packed payload stream), take the
    integer luma 299r+587g+114b per sampled pixel, and set bit k iff that
    pixel's luma is strictly above the 64-pixel mean (compared exactly as
    64*luma_k > sum(luma), so no float division can flip a bit). The 64
    bits are packed row-major into four int64 columns of 16 bits each —
    exactly the band layout the LSH near-dup join wants (and safely inside
    int64, so no engine disagrees about bit-63 overflow).

    One mapInArrow stage, all-numpy per (h, w)-shape group; zero per-image
    Python. Undecodable payloads yield null bands.
    """
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import batch_image_stats

    pow2 = 1 << np.arange(16, dtype=np.int64)

    def _ahash(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            bad = ~ok
            bands = np.zeros((n, 4), np.int64)

            ps = offs[:-1] + HEADER_LEN
            decoded, dstart, rle_rows, good = st["rle"]
            rle_start = np.full(n, -1, np.int64)
            rle_start[rle_rows[good]] = dstart[:-1][good]
            fmtc = st["fmt_code"]
            h64, w64 = st["h"], st["w"]
            okw = np.flatnonzero(ok)
            is_rle_row = np.zeros(n, bool)
            is_rle_row[rle_rows] = True
            for hh, ww in set(zip(h64[okw].tolist(), w64[okw].tolist())):
                sel = okw[(h64[okw] == hh) & (w64[okw] == ww)]
                yi = (np.arange(8) * hh // 8).clip(0, hh - 1)
                xi = (np.arange(8) * ww // 8).clip(0, ww - 1)
                pos = (3 * (yi[:, None] * ww + xi[None, :])).reshape(-1)
                pos3 = (pos[:, None] + np.arange(3)).reshape(-1)
                for rows, src, start, qnt in (
                    (sel[fmtc[sel] == FMT_CODES["raw"]], data, ps, False),
                    (sel[fmtc[sel] == FMT_CODES["qnt"]], data, ps, True),
                    (sel[is_rle_row[sel]], decoded, rle_start, False),
                ):
                    if rows.shape[0] == 0:
                        continue
                    g = src[start[rows][:, None] + pos3[None, :]].astype(np.int64)
                    if qnt:
                        g = (g << 2) + 2
                    g = g.reshape(-1, 64, 3)
                    luma = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
                    bits = 64 * luma > luma.sum(axis=1, keepdims=True)
                    for b in range(4):
                        bands[rows, b] = bits[:, b * 16 : (b + 1) * 16] @ pow2

            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array(bands[:, b], mask=bad) for b in range(4)],
                names=[f.name for f in AHASH_SCHEMA.fields],
            )

    return images.select("image_id", "bytes").mapInArrow(_ahash, AHASH_SCHEMA)


def _encode_raw(lat: float, lng: float, pix: np.ndarray) -> bytes:
    """Container-encode arbitrary pixels (raw fmt) with a GPS header."""
    from .imagecodec import _HEADER_DTYPE, MAGIC

    hdr = np.zeros(1, dtype=_HEADER_DTYPE)
    hdr["magic"] = MAGIC
    hdr["lat"] = np.float32(lat)
    hdr["lng"] = np.float32(lng)
    hdr["w"] = pix.shape[1]
    hdr["h"] = pix.shape[0]
    hdr["fmt"] = FMT_CODES["raw"]
    return hdr.tobytes() + np.ascontiguousarray(pix, dtype=np.uint8).tobytes()


def frame_sample(frames: DataFrame, clip_col: str, order_col: str, k: int) -> DataFrame:
    """Every k-th frame per clip: deterministic window sample — the video
    analog of the tiling group-by (pure Catalyst, no UDF)."""
    from pyspark.sql import Window

    w = Window.partitionBy(clip_col).orderBy(order_col)
    return (
        frames.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") - 1) % k == 0)
        .drop("_rn")
    )


PATCH_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("py", T.IntegerType(), False),
        T.StructField("px", T.IntegerType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("sum_r", T.LongType(), False),
        T.StructField("sum_g", T.LongType(), False),
        T.StructField("sum_b", T.LongType(), False),
    ]
)


def patchify(images: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch extraction: cut every decoded image into a grid of
    (patch x patch) tiles and emit exact int64 per-patch channel sums —
    the patchification step a vision-transformer training pipeline runs
    over every image, as ONE mapInArrow stage.

    Vectorized per (h, w)-shape x format group: one fancy-index gather
    pulls the packed payload matrix (k, 3*h*w) straight from the Arrow
    data buffer (raw/qnt) or the single global RLE decode, then one
    6-axis reshape + sum folds it to (k, h/P, w/P, 3) — no per-image
    Python, no per-patch loop. Only the 7-column sums table crosses back
    to the JVM (never pixels), so the shuffle after this operator carries
    ~16 small rows per image, not payloads. Rows whose decode fails and
    trailing partial patches (h or w not a multiple of P) are clipped,
    matching the floor-grid semantics of standard ViT patch embeds.
    """
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import batch_image_stats

    names = [f.name for f in PATCH_SCHEMA.fields]

    def _patches(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            ps = offs[:-1] + HEADER_LEN
            decoded, dstart, rle_rows, good = st["rle"]
            rle_start = np.full(n, -1, np.int64)
            rle_start[rle_rows[good]] = dstart[:-1][good]
            is_rle_row = np.zeros(n, bool)
            is_rle_row[rle_rows] = True
            fmtc = st["fmt_code"]
            h64, w64 = st["h"], st["w"]
            okw = np.flatnonzero(ok)
            o_idx, o_py, o_px, o_sum = [], [], [], []
            for hh, ww in sorted(set(zip(h64[okw].tolist(), w64[okw].tolist()))):
                gy, gx = hh // patch, ww // patch
                if gy == 0 or gx == 0:
                    continue
                sel = okw[(h64[okw] == hh) & (w64[okw] == ww)]
                span = np.arange(3 * hh * ww, dtype=np.int64)
                grid_y = np.repeat(np.arange(gy, dtype=np.int32), gx)
                grid_x = np.tile(np.arange(gx, dtype=np.int32), gy)
                for rows, src, start, qnt in (
                    (sel[fmtc[sel] == FMT_CODES["raw"]], data, ps, False),
                    (sel[fmtc[sel] == FMT_CODES["qnt"]], data, ps, True),
                    (sel[is_rle_row[sel]], decoded, rle_start, False),
                ):
                    k = rows.shape[0]
                    if k == 0:
                        continue
                    # gather stays uint8 (the astype(int64) made the pixel
                    # matrix 8x the payload bytes); the reduction carries an
                    # int64 accumulator, and the qnt dequant (v -> 4v+2) is
                    # affine so it folds into the per-patch sums exactly:
                    # sum(4v+2) over P*P pixels == 4*sum(v) + 2*P*P.
                    g = src[start[rows][:, None] + span[None, :]]
                    arr = g.reshape(k, hh, ww, 3)
                    # clip trailing partial patches, then fold (P x P) blocks
                    arr = arr[:, : gy * patch, : gx * patch, :]
                    sums = arr.reshape(k, gy, patch, gx, patch, 3).sum(
                        axis=(2, 4), dtype=np.int64
                    )
                    if qnt:
                        sums = 4 * sums + 2 * (patch * patch)
                    o_idx.append(np.repeat(rows, gy * gx))
                    o_py.append(np.tile(grid_y, k))
                    o_px.append(np.tile(grid_x, k))
                    o_sum.append(sums.reshape(k * gy * gx, 3))
            if not o_idx:
                continue
            idx = np.concatenate(o_idx)
            sums = np.concatenate(o_sum)
            n_out = idx.shape[0]
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(idx)),
                    pa.array(np.concatenate(o_py)),
                    pa.array(np.concatenate(o_px)),
                    pa.array(np.full(n_out, patch * patch, np.int64)),
                    pa.array(sums[:, 0]),
                    pa.array(sums[:, 1]),
                    pa.array(sums[:, 2]),
                ],
                names=names,
            )

    return images.select("image_id", "bytes").mapInArrow(_patches, PATCH_SCHEMA)


def flip_images(images: DataFrame) -> DataFrame:
    """Horizontal-flip augmentation: mirror every image left-right and
    re-encode losslessly (raw) with the original GPS header — the
    deterministic member of a training-augmentation stage. Same zero-copy
    shape as resize_images: per (h, w)-shape group ONE mirrored fancy-index
    gather straight off the packed payload stream (raw/qnt: Arrow data
    buffer; rle: the single global decode), the whole output column built
    as one (n, len) uint8 matrix — no per-image Python, no (h, w, 3)
    intermediates."""
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import _HEADER_DTYPE, MAGIC, batch_image_stats

    out_names = ["image_id", "bytes", "w", "h", "fmt"]
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("w", T.IntegerType(), True),
            T.StructField("h", T.IntegerType(), True),
            T.StructField("fmt", T.StringType(), True),
        ]
    )

    def _flip(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            bad = ~ok
            ps = offs[:-1] + HEADER_LEN
            decoded, dstart, rle_rows, good = st["rle"]
            rle_start = np.full(n, -1, np.int64)
            rle_start[rle_rows[good]] = dstart[:-1][good]
            is_rle_row = np.zeros(n, bool)
            is_rle_row[rle_rows] = True
            fmtc = st["fmt_code"]
            h64, w64 = st["h"], st["w"]
            okw = np.flatnonzero(ok)
            # variable shapes -> variable blob lengths; build per-shape and
            # scatter into one concatenated values buffer
            lens = np.where(ok, HEADER_LEN + 3 * st["n_pixels"], 0).astype(np.int64)
            off32 = _offsets32(lens)
            values = np.zeros(int(off32[-1]), np.uint8)
            hdrs = np.zeros(n, dtype=_HEADER_DTYPE)
            hdrs["magic"] = MAGIC
            hdrs["lat"] = st["lat"]
            hdrs["lng"] = st["lng"]
            hdrs["w"] = w64
            hdrs["h"] = h64
            hdrs["fmt"] = FMT_CODES["raw"]
            hview = hdrs.view(np.uint8).reshape(n, HEADER_LEN)
            if okw.size:
                values[
                    off32[okw][:, None] + np.arange(HEADER_LEN, dtype=np.int64)
                ] = hview[okw]
            for hh, ww in sorted(set(zip(h64[okw].tolist(), w64[okw].tolist()))):
                sel = okw[(h64[okw] == hh) & (w64[okw] == ww)]
                yy, xx = np.meshgrid(
                    np.arange(hh, dtype=np.int64),
                    np.arange(ww, dtype=np.int64),
                    indexing="ij",
                )
                pos = (3 * (yy * ww + (ww - 1 - xx))).reshape(-1)
                pos3 = (pos[:, None] + np.arange(3)).reshape(-1)
                npb = 3 * hh * ww
                for rows, src, start, qnt in (
                    (sel[fmtc[sel] == FMT_CODES["raw"]], data, ps, False),
                    (sel[fmtc[sel] == FMT_CODES["qnt"]], data, ps, True),
                    (sel[is_rle_row[sel]], decoded, rle_start, False),
                ):
                    if rows.shape[0] == 0:
                        continue
                    g = src[start[rows][:, None] + pos3[None, :]]
                    if qnt:
                        g = ((g.astype(np.uint16) << 2) + 2).astype(np.uint8)
                    dst = (off32[rows] + HEADER_LEN).astype(np.int64)
                    values[dst[:, None] + np.arange(npb, dtype=np.int64)] = g
            validity = (
                None if ok.all() else pa.py_buffer(np.packbits(ok, bitorder="little"))
            )
            bytes_arr = pa.Array.from_buffers(
                pa.binary(), n,
                [validity, pa.py_buffer(off32), pa.py_buffer(values.tobytes())],
                null_count=int(bad.sum()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    bytes_arr,
                    pa.array(w64.astype(np.int32), mask=bad),
                    pa.array(h64.astype(np.int32), mask=bad),
                    pa.array(np.where(ok, "raw", None)),
                ],
                names=out_names,
            )

    return images.select("image_id", "bytes").mapInArrow(_flip, out_schema)


MOMENTS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("luma_sum", T.LongType(), False),
        T.StructField("luma_sumsq", T.LongType(), False),
    ]
)


def image_luma_moments(images: DataFrame) -> DataFrame:
    """Exact integer luma moments per image (sum and sum-of-squares of the
    x1000-scaled ITU luma 299R+587G+114B over the DECODED pixels) — the
    inputs to variance/flatness quality filters, computed so both moments
    are exact int64 and therefore bit-comparable cross-engine (no float
    summation order anywhere). One mapInArrow stage, one payload gather +
    two reductions per shape group; failed decodes are dropped."""
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import batch_image_stats

    names = [f.name for f in MOMENTS_SCHEMA.fields]

    def _moments(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            ps = offs[:-1] + HEADER_LEN
            decoded, dstart, rle_rows, good = st["rle"]
            rle_start = np.full(n, -1, np.int64)
            rle_start[rle_rows[good]] = dstart[:-1][good]
            is_rle_row = np.zeros(n, bool)
            is_rle_row[rle_rows] = True
            fmtc = st["fmt_code"]
            h64, w64 = st["h"], st["w"]
            okw = np.flatnonzero(ok)
            o_idx, o_npx, o_sum, o_sq = [], [], [], []
            for hh, ww in sorted(set(zip(h64[okw].tolist(), w64[okw].tolist()))):
                sel = okw[(h64[okw] == hh) & (w64[okw] == ww)]
                span = np.arange(3 * hh * ww, dtype=np.int64)
                for rows, src, start, qnt in (
                    (sel[fmtc[sel] == FMT_CODES["raw"]], data, ps, False),
                    (sel[fmtc[sel] == FMT_CODES["qnt"]], data, ps, True),
                    (sel[is_rle_row[sel]], decoded, rle_start, False),
                ):
                    k = rows.shape[0]
                    if k == 0:
                        continue
                    g = src[start[rows][:, None] + span[None, :]].astype(np.int64)
                    if qnt:
                        g = (g << 2) + 2
                    px = g.reshape(k, hh * ww, 3)
                    luma = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                    o_idx.append(rows)
                    o_npx.append(np.full(k, hh * ww, np.int64))
                    o_sum.append(luma.sum(axis=1))
                    o_sq.append((luma * luma).sum(axis=1))
            if not o_idx:
                continue
            idx = np.concatenate(o_idx)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(idx)),
                    pa.array(np.concatenate(o_npx)),
                    pa.array(np.concatenate(o_sum)),
                    pa.array(np.concatenate(o_sq)),
                ],
                names=names,
            )

    return images.select("image_id", "bytes").mapInArrow(_moments, MOMENTS_SCHEMA)


GRADIENT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("n_edges", T.LongType(), False),
        T.StructField("grad_sum", T.LongType(), False),
    ]
)


def image_gradient_energy(images: DataFrame) -> DataFrame:
    """Exact integer gradient energy per image — the blur/sharpness signal
    an image-curation pipeline filters on (LAION-style "discard soft or
    flat frames" stage; reference analog: the per-payload invariants of
    timezone.go's fixture checks extended to a quality gate).

    Energy = sum of |luma(x+1,y) - luma(x,y)| over all horizontal neighbor
    pairs plus |luma(x,y+1) - luma(x,y)| over all vertical pairs, where
    luma is the x1000-scaled ITU integer 299R+587G+114B of the DECODED
    pixels. Everything is int64 — no float summation order anywhere — so
    the result is bit-comparable cross-engine (the DuckDB oracle recomputes
    it with two window LAGs over the synthetic pixel grid). n_edges =
    h*(w-1) + w*(h-1) normalizes across the mixed 8x8/16x16/32x24 corpus.

    One mapInArrow stage sharing image_luma_moments' shape-grouped gather:
    one payload read + two vectorized |diff| reductions per (h, w) group;
    zero per-image Python. Failed decodes are dropped (same contract as
    the moments kernel q94 builds on)."""
    import pyarrow as pa

    from .engine import _arrow_binary_view
    from .imagecodec import batch_image_stats

    names = [f.name for f in GRADIENT_SCHEMA.fields]

    def _grad(batches):
        for batch in batches:
            ids = batch.column(0)
            data, offs, valid = _arrow_binary_view(batch.column(1))
            st = batch_image_stats(data, offs, keep_decoded=True)
            ok = st["ok"] if valid is None else st["ok"] & valid
            n = len(ok)
            ps = offs[:-1] + HEADER_LEN
            decoded, dstart, rle_rows, good = st["rle"]
            rle_start = np.full(n, -1, np.int64)
            rle_start[rle_rows[good]] = dstart[:-1][good]
            is_rle_row = np.zeros(n, bool)
            is_rle_row[rle_rows] = True
            fmtc = st["fmt_code"]
            h64, w64 = st["h"], st["w"]
            okw = np.flatnonzero(ok)
            o_idx, o_edges, o_sum = [], [], []
            for hh, ww in sorted(set(zip(h64[okw].tolist(), w64[okw].tolist()))):
                sel = okw[(h64[okw] == hh) & (w64[okw] == ww)]
                span = np.arange(3 * hh * ww, dtype=np.int64)
                n_edges = hh * (ww - 1) + ww * (hh - 1)
                for rows, src, start, qnt in (
                    (sel[fmtc[sel] == FMT_CODES["raw"]], data, ps, False),
                    (sel[fmtc[sel] == FMT_CODES["qnt"]], data, ps, True),
                    (sel[is_rle_row[sel]], decoded, rle_start, False),
                ):
                    k = rows.shape[0]
                    if k == 0:
                        continue
                    # int32 throughout the per-pixel temporaries: luma is
                    # <= 255000 and a neighbor |diff| <= 255000, both far
                    # inside int32, so only the final reduction needs int64
                    # — same exact values, half the memory traffic of the
                    # heaviest arrays in the suite's hottest pixel kernel.
                    g = src[start[rows][:, None] + span[None, :]].astype(np.int32)
                    if qnt:
                        g = (g << 2) + 2
                    px = g.reshape(k, hh, ww, 3)
                    luma = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                    gs = np.abs(np.diff(luma, axis=2)).sum(axis=(1, 2), dtype=np.int64)
                    gs += np.abs(np.diff(luma, axis=1)).sum(axis=(1, 2), dtype=np.int64)
                    o_idx.append(rows)
                    o_edges.append(np.full(k, n_edges, np.int64))
                    o_sum.append(gs)
            if not o_idx:
                continue
            idx = np.concatenate(o_idx)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(pa.array(idx)),
                    pa.array(np.concatenate(o_edges)),
                    pa.array(np.concatenate(o_sum)),
                ],
                names=names,
            )

    return images.select("image_id", "bytes").mapInArrow(_grad, GRADIENT_SCHEMA)
