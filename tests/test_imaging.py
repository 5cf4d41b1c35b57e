"""Image codec tests: lossless round trips, the PSNR ≥ 40 dB lossy
invariant (BASELINE.json input_hint), header-only dims, and phash
determinism."""

import numpy as np
import pytest

from webarchive_discovery_spark.functions.imaging import (
    average_hash,
    decode_image,
    encode_image,
    image_dims,
    psnr,
)
from webarchive_discovery_spark.sources.frontier_data import expected_pixels


@pytest.mark.parametrize("fmt", ["png", "bmp"])
def test_lossless_roundtrip(fmt):
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    data = encode_image(rgb, fmt)
    out = decode_image(data, fmt)
    assert np.array_equal(out, rgb)
    assert image_dims(data) == (23, 19)


def test_lossy_psnr_invariant():
    """PSNR ≥ 40 dB for the lossy roundtrip (BASELINE.json input_hint) on
    photo-like content — smooth gradients + mild noise, which is what real
    stored web images look like.  (iid-uniform noise is the worst case for
    any real transform codec and is covered at quality=100 below.)"""
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:32, 0:32]
    base = np.stack([
        128 + 80 * np.sin(xx / 9) + 30 * np.cos(yy / 7),
        100 + 60 * np.cos(xx / 11 + yy / 8),
        140 + 50 * np.sin((xx + yy) / 13),
    ], axis=-1)
    rgb = np.clip(base + rng.normal(0, 2, base.shape), 0, 255).astype(np.uint8)
    data = encode_image(rgb, "jpeg")
    out = decode_image(data, "jpeg")
    assert out.shape == rgb.shape
    assert psnr(rgb, out) >= 40.0, psnr(rgb, out)
    assert image_dims(data) == (32, 32)

    # worst-case content: quality=100 (unit quant tables) still clears 40 dB
    from webarchive_discovery_spark.functions.jpeg import decode_jpeg, encode_jpeg

    noise = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert psnr(noise, decode_jpeg(encode_jpeg(noise, quality=100))) >= 40.0


def test_expected_pixels_deterministic():
    a, fmt_a = expected_pixels(123)
    b, fmt_b = expected_pixels(123)
    assert np.array_equal(a, b) and fmt_a == fmt_b
    data = encode_image(a, fmt_a)
    dec = decode_image(data, fmt_a)
    if fmt_a == "jpeg":
        assert psnr(a, dec) >= 40.0
    else:
        assert np.array_equal(a, dec)


def test_average_hash_stable_and_int64():
    rgb, _ = expected_pixels(5)
    h1, h2 = average_hash(rgb), average_hash(rgb)
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
