"""ISO BMFF (MP4/MOV) demuxer (``functions/mp4.py``): real box walk +
sample-table resolution; MJPEG samples decode through the in-repo JPEG
codec, modern codecs are honestly gated by name."""

import struct

import numpy as np
import pytest

from webarchive_discovery_spark.functions.imaging import (
    psnr,
    sample_video_frames,
)
from webarchive_discovery_spark.functions.mp4 import (
    encode_mp4_mjpeg,
    is_mp4,
    mp4_frames,
    mp4_info,
)


def _gradient_frames(n=4, h=32, w=48):
    y, x = np.mgrid[0:h, 0:w]
    return [
        np.stack([(x * 3 + k * 7) % 220, (y * 2 + 40) % 220,
                  (x + y + k) % 220], axis=-1).astype(np.uint8)
        for k in range(n)
    ]


def test_mjpeg_mp4_round_trip_psnr_40db():
    frames = _gradient_frames()
    data = encode_mp4_mjpeg(frames, fps=20, quality=92)
    assert is_mp4(data)
    assert mp4_info(data) == {"width": 48, "height": 32, "n_frames": 4,
                              "fps": 20, "codec": "jpeg"}
    out = list(mp4_frames(data))
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, got), want in zip(out, frames):
        assert psnr(got, want) >= 40.0


def test_every_n_sampling_and_dispatch():
    data = encode_mp4_mjpeg(_gradient_frames(n=5), fps=10)
    assert [i for i, _ in sample_video_frames(data, every_n=3)] == [0, 3]


def test_modern_codec_gated_by_name():
    data = encode_mp4_mjpeg(_gradient_frames(n=1)).replace(b"jpeg", b"avc1", 1)
    with pytest.raises(NotImplementedError, match="avc1"):
        list(mp4_frames(data))


def test_malformed_boxes_raise_for_per_record_recovery():
    with pytest.raises(ValueError):
        mp4_info(b"\0\0\0\x08free")  # no ftyp
    # ftyp but no moov/video track
    data = struct.pack(">I", 16) + b"ftypisom" + b"\0\0\0\0"
    with pytest.raises(ValueError):
        list(mp4_frames(data + struct.pack(">I", 8) + b"mdat"))


def test_stsc_multi_chunk_resolution():
    """Non-trivial sample-to-chunk tables: 2+2 split, then a varying
    stsc run (chunk 1 holds 3 samples, chunks 2.. hold 1) — the resolver
    must pick the LAST stsc entry whose first_chunk <= chunk."""
    from webarchive_discovery_spark.functions.mp4 import _sample_ranges

    sizes = [10, 20, 30, 40]
    base = 1000
    t = {"sizes": sizes, "offsets": [base, base + 30], "stsc": [(1, 2, 1)]}
    assert list(_sample_ranges(t)) == [
        (1000, 10), (1010, 20), (1030, 30), (1060, 40)]

    t = {"sizes": sizes, "offsets": [base, 2000],
         "stsc": [(1, 3, 1), (2, 1, 1)]}
    assert list(_sample_ranges(t)) == [
        (1000, 10), (1010, 20), (1030, 30), (2000, 40)]
