"""Multimodal operators: features, resize, frame sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tzspark.datasets import IMAGES_SCHEMA, images_df
from tzspark.imagecodec import decode_image, encode_image, synth_pixels
from tzspark.imageops import (
    frame_sample,
    image_features,
    resize_images,
    resize_nn_pixels,
)

N = 90


@pytest.fixture(scope="module")
def imgs(spark):
    return images_df(spark, N, partitions=3).cache()


def test_image_features(spark, imgs):
    f = image_features(imgs).toPandas()
    assert len(f) == N
    assert not f["decode_failed"].any()
    ok = f[f["phash_ok"].notna()]
    assert len(ok) > 0 and ok["phash_ok"].all()  # lossless rows verify phash
    assert (f["mean_luma"] > 0).all() and (f["mean_luma"] < 255).all()


def test_decode_failure_routed_not_raised(spark):
    rows = [("bad", bytearray(b"TZI1garbage"), 8, 8, "raw", "c", 0)]
    df = spark.createDataFrame(rows, IMAGES_SCHEMA)
    f = image_features(df).toPandas()
    assert f["decode_failed"].tolist() == [True]


def test_resize_nn_pixels_exact():
    pix = synth_pixels(3, 16, 8)
    small = resize_nn_pixels(pix, 8, 4)
    assert small.shape == (4, 8, 3)
    # nearest-neighbor: every output pixel exists in the input
    assert small[0, 0].tolist() == pix[0, 0].tolist()


def test_resize_images_roundtrip(spark, imgs):
    r = resize_images(imgs, 8, 8).toPandas()
    assert len(r) == N and not r["decode_failed"].any()
    lat, lng, pix = decode_image(bytes(r["bytes"].iloc[0]))
    assert pix.shape == (8, 8, 3)
    # GPS header preserved through the resize
    from tzspark.datasets import synth_coords

    i = int(r["image_id"].iloc[0][3:])
    wlat, wlng = synth_coords(np.array([i]))
    assert lat == wlat[0] and lng == wlng[0]


def test_frame_sample(spark, imgs):
    # treat every 10 consecutive images as one clip
    frames = imgs.withColumn(
        "clip_id", F.floor(F.substring("image_id", 4, 12).cast("long") / 10)
    )
    s = frame_sample(frames, "clip_id", "image_id", 3)
    pdf = s.select("clip_id", "image_id").toPandas()
    per_clip = pdf.groupby("clip_id").size()
    assert (per_clip == 4).all()  # ceil(10/3) = 4 frames kept per clip
    # deterministic: frames 0,3,6,9 of each clip
    ids = sorted(int(x[3:]) % 10 for x in pdf[pdf["clip_id"] == 0]["image_id"])
    assert ids == [0, 3, 6, 9]


def test_image_features_equals_decode_loop(spark, imgs):
    """The vectorized (round-3) feature path must reproduce what a per-image
    decode loop computes: exact means from integer channel sums, phash verify
    over the same pixel bytes."""
    from tzspark.imagecodec import phash_pixels

    f = image_features(imgs).toPandas().set_index("image_id").sort_index()
    rows = imgs.select("image_id", "bytes", "fmt", "phash").toPandas()
    for _, r in rows.iterrows():
        _, _, pix = decode_image(bytes(r["bytes"]))
        p = pix.astype(np.float64)
        got = f.loc[r["image_id"]]
        assert got["w"] == pix.shape[1] and got["h"] == pix.shape[0]
        assert got["mean_r"] == p[..., 0].mean()
        assert got["mean_g"] == p[..., 1].mean()
        assert got["mean_b"] == p[..., 2].mean()
        want_luma = (
            0.299 * p[..., 0].sum() + 0.587 * p[..., 1].sum() + 0.114 * p[..., 2].sum()
        ) / p[..., 0].size
        assert abs(got["mean_luma"] - want_luma) < 1e-9
        if r["fmt"] in ("raw", "rle"):
            assert bool(got["phash_ok"]) == (phash_pixels(pix) == int(r["phash"]))
        else:
            assert got["phash_ok"] is None or np.isnan(got["phash_ok"])


def test_resize_images_equals_decode_loop(spark, imgs):
    """The grouped-gather resize must emit byte-identical blobs to the
    per-image decode->resize->re-encode reference."""
    from tzspark.imageops import _encode_raw

    r = resize_images(imgs, 8, 8).toPandas().set_index("image_id").sort_index()
    rows = imgs.select("image_id", "bytes").toPandas()
    for _, row in rows.iterrows():
        lat, lng, pix = decode_image(bytes(row["bytes"]))
        want = _encode_raw(float(lat), float(lng), resize_nn_pixels(pix, 8, 8))
        assert bytes(r.loc[row["image_id"]]["bytes"]) == want


def test_resize_images_mixed_failures(spark):
    """Failed rows are null-routed while good rows in the same batch still
    resize correctly (exercises the validity-bitmap construction)."""
    from tzspark.imagecodec import encode_image

    good, _, _ = encode_image(5, 1.5, 2.5, 6, 4, "rle")
    rows = [
        ("bad1", bytearray(b"XXXXgarbage_not_magic"), 0, 0, "raw", "c", 0),
        ("good", bytearray(good), 6, 4, "rle", "c", 0),
        ("bad2", bytearray(b"TZ"), 0, 0, "raw", "c", 0),
    ]
    df = spark.createDataFrame(rows, IMAGES_SCHEMA)
    r = resize_images(df, 8, 8).toPandas().set_index("image_id")
    assert bool(r.loc["bad1"]["decode_failed"]) and r.loc["bad1"]["bytes"] is None
    assert bool(r.loc["bad2"]["decode_failed"])
    assert not bool(r.loc["good"]["decode_failed"])
    lat, lng, pix = decode_image(bytes(r.loc["good"]["bytes"]))
    assert pix.shape == (8, 8, 3) and abs(lat - 1.5) < 1e-6


def _ahash_scalar(pix: np.ndarray) -> list:
    """Per-image aHash reference: decode -> 8x8 NN gather -> integer luma ->
    strict above-mean bits -> four 16-bit bands."""
    h, w = pix.shape[0], pix.shape[1]
    g = pix.astype(np.int64)[
        np.ix_((np.arange(8) * h // 8).clip(0, h - 1),
               (np.arange(8) * w // 8).clip(0, w - 1))
    ]
    luma = 299 * g[:, :, 0] + 587 * g[:, :, 1] + 114 * g[:, :, 2]
    bits = (64 * luma > luma.sum()).astype(np.int64).ravel()
    return [
        int((bits[b * 16 : (b + 1) * 16] * (1 << np.arange(16))).sum())
        for b in range(4)
    ]


def test_image_ahash_equals_decode_loop(spark, imgs):
    """The grouped-gather aHash must equal the per-image decode reference
    across all three formats (raw/rle passthrough, qnt dequantize)."""
    from tzspark.imageops import image_ahash

    a = image_ahash(imgs).toPandas().set_index("image_id").sort_index()
    rows = imgs.select("image_id", "bytes", "fmt").toPandas()
    assert len(a) == N
    n_qnt = 0
    for _, row in rows.iterrows():
        _, _, pix = decode_image(bytes(row["bytes"]))
        if row["fmt"] == "qnt":
            pix = (4 * (pix.astype(np.int64) // 4) + 2).astype(np.uint8)
            n_qnt += 1
        want = _ahash_scalar(pix)
        got = [int(a.loc[row["image_id"]][f"b{b}"]) for b in range(4)]
        assert got == want, row["image_id"]
    assert n_qnt > 0  # the lossy decode path was exercised


def test_image_ahash_mixed_failures(spark):
    """Undecodable payloads yield null bands; good rows in the same batch
    still hash correctly."""
    good, _, _ = encode_image(5, 1.5, 2.5, 6, 4, "rle")
    rows = [
        ("bad", bytearray(b"XXXXgarbage_not_magic"), 0, 0, "raw", "c", 0),
        ("good", bytearray(good), 6, 4, "rle", "c", 0),
    ]
    df = spark.createDataFrame(rows, IMAGES_SCHEMA)
    from tzspark.imageops import image_ahash

    a = image_ahash(df).toPandas().set_index("image_id")
    assert a.loc["bad"][["b0", "b1", "b2", "b3"]].isna().all()
    _, _, pix = decode_image(bytes(good))
    assert [int(a.loc["good"][f"b{b}"]) for b in range(4)] == _ahash_scalar(pix)


def test_patchify_equals_decode_loop(spark, imgs):
    """The grouped reshape-fold patchify must reproduce per-image decode ->
    8x8 block sums, patch for patch, including the mixed-shape grid."""
    from tzspark.imageops import patchify

    out = patchify(imgs, patch=8).toPandas()
    got = {
        (r["image_id"], r["py"], r["px"]): (r["sum_r"], r["sum_g"], r["sum_b"])
        for _, r in out.iterrows()
    }
    assert (out["n_px"] == 64).all()
    n_expect = 0
    rows = imgs.select("image_id", "bytes").toPandas()
    for _, row in rows.iterrows():
        _, _, pix = decode_image(bytes(row["bytes"]))
        h, w = pix.shape[:2]
        gy, gx = h // 8, w // 8
        n_expect += gy * gx
        p = pix.astype(np.int64)
        for py in range(gy):
            for px in range(gx):
                blk = p[py * 8 : py * 8 + 8, px * 8 : px * 8 + 8, :]
                assert got[(row["image_id"], py, px)] == (
                    blk[..., 0].sum(),
                    blk[..., 1].sum(),
                    blk[..., 2].sum(),
                )
    assert len(out) == n_expect


def test_flip_images_equals_decode_loop(spark, imgs):
    """The grouped mirrored-gather flip must emit byte-identical blobs to a
    per-image decode -> np.flip -> re-encode reference."""
    from tzspark.imageops import _encode_raw, flip_images

    out = flip_images(imgs).toPandas().set_index("image_id").sort_index()
    rows = imgs.select("image_id", "bytes").toPandas()
    for _, row in rows.iterrows():
        lat, lng, pix = decode_image(bytes(row["bytes"]))
        want = _encode_raw(float(lat), float(lng), pix[:, ::-1, :])
        got = out.loc[row["image_id"]]
        assert bytes(got["bytes"]) == want
        assert got["fmt"] == "raw"
    # flip is an involution through the kernel: flip(flip(x)) == decode(x)
    twice = (
        flip_images(
            flip_images(imgs).select(
                "image_id", "bytes"
            )
        )
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    for _, row in rows.iterrows():
        lat, lng, pix = decode_image(bytes(row["bytes"]))
        want = _encode_raw(float(lat), float(lng), pix)
        assert bytes(twice.loc[row["image_id"]]["bytes"]) == want


def test_flip_images_mixed_failures(spark):
    """Garbage blobs route to null bytes, good rows still flip."""
    from tzspark.datasets import images_df
    from tzspark.imageops import flip_images

    good = images_df(spark, 6, partitions=1).select("image_id", "bytes")
    bad = spark.createDataFrame(
        [("imgBAD", bytearray(b"nonsense")), ("imgSHORT", bytearray(b"\x01"))],
        "image_id string, bytes binary",
    )
    out = flip_images(good.unionByName(bad)).toPandas().set_index("image_id")
    assert out.loc["imgBAD"]["bytes"] is None
    assert out.loc["imgSHORT"]["bytes"] is None
    assert sum(1 for b in out["bytes"] if b is not None) == 6


def test_luma_moments_equal_decode_loop(spark, imgs):
    """Integer luma moments must equal a per-image decode loop exactly."""
    from tzspark.imageops import image_luma_moments

    out = image_luma_moments(imgs).toPandas().set_index("image_id").sort_index()
    rows = imgs.select("image_id", "bytes").toPandas()
    assert len(out) == len(rows)
    for _, row in rows.iterrows():
        _, _, pix = decode_image(bytes(row["bytes"]))
        p = pix.astype(np.int64)
        luma = 299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]
        got = out.loc[row["image_id"]]
        assert got["n_px"] == luma.size
        assert got["luma_sum"] == luma.sum()
        assert got["luma_sumsq"] == (luma * luma).sum()


def test_offsets32_overflow_fails_loudly():
    """int32 Arrow binary offsets must raise on a >2 GiB batch payload
    instead of silently wrapping and corrupting blobs."""
    from tzspark.imageops import _offsets32

    ok = _offsets32(np.array([10, 0, 20], dtype=np.int64))
    np.testing.assert_array_equal(ok, [0, 10, 10, 30])
    assert ok.dtype == np.int32
    assert _offsets32(np.zeros(0, dtype=np.int64)).tolist() == [0]
    big = np.full(3, 900 * 1024 * 1024, dtype=np.int64)  # 2.6 GiB total
    with pytest.raises(ValueError, match="overflows int32"):
        _offsets32(big)
