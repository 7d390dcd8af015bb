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
