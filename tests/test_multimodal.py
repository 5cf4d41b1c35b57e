"""Multimodal binary-column plumbing: decode/resize/phash, video frame
sampling, per-record error recovery, PSNR invariant on the resize path."""

import numpy as np
import pytest

from webarchive_discovery_spark.functions.imaging import (
    decode_image,
    encode_fake_video,
    encode_image,
    psnr,
    resize_nearest,
)
from webarchive_discovery_spark.operators.multimodal import (
    decode_resize_images,
    sample_frames,
)


def _rgb(w, h, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_resize_nearest_identity_and_shape():
    img = _rgb(16, 12, 1)
    same = resize_nearest(img, 16, 12)
    assert psnr(img, same) == float("inf")  # identity resize is lossless
    small = resize_nearest(img, 8, 6)
    assert small.shape == (6, 8, 3)


def test_decode_resize_images(spark):
    rows = [
        ("img-1", encode_image(_rgb(16, 12, 2), "png"), "png"),
        ("img-2", encode_image(_rgb(20, 10, 3), "bmp"), "bmp"),
        ("img-3", b"garbage-bytes", "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {r.image_id: r for r in decode_resize_images(df, 8, 8).collect()}
    assert (got["img-1"].orig_w, got["img-1"].orig_h) == (16, 12)
    decoded = decode_image(bytes(got["img-1"].resized), "png")
    assert decoded.shape == (8, 8, 3)
    assert got["img-2"].phash is not None
    assert got["img-3"].decode_error is not None and got["img-3"].resized is None


def test_sample_frames(spark):
    frames = [_rgb(8, 8, s) for s in range(6)]
    vid = encode_fake_video(frames, "png")
    df = spark.createDataFrame(
        [("vid-1", vid), ("vid-2", b"\x00\x00realmp4??")],
        "video_id string, bytes binary",
    )
    out = sample_frames(df, every_n=2).collect()
    good = sorted(r.frame_index for r in out if r.video_id == "vid-1")
    assert good == [0, 2, 4]
    bad = [r for r in out if r.video_id == "vid-2"]
    assert len(bad) == 1 and "fake video container" in bad[0].decode_error


def test_plumbing_is_single_python_stage(spark):
    df = spark.createDataFrame([("a", b"x", "png")], "image_id string, bytes binary, fmt string")
    plan = decode_resize_images(df, 4, 4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
