"""RIFF/AVI demuxer + muxer (``functions/avi.py``).

The reference identifies ``video/*`` via Tika's container detector
(``TikaPayloadAnalyser.java:165-240``); frame sampling is the
training-pipeline addition on top.  AVI is decodable end-to-end with the
in-repo codecs: MJPEG frames through ``functions/jpeg.py``, uncompressed
DIB bit-exact.
"""

import struct

import numpy as np
import pytest

from webarchive_discovery_spark.functions.avi import (
    avi_frames,
    avi_info,
    encode_avi,
    is_avi,
)
from webarchive_discovery_spark.functions.imaging import (
    psnr,
    sample_video_frames,
)


def _frames(n=4, h=18, w=13, seed=7):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def test_dib_round_trip_bit_exact_odd_stride():
    # w=13 -> row stride 40 bytes (3 pad) — exercises DIB 4-byte alignment
    frames = _frames()
    data = encode_avi(frames, codec="DIB ", fps=10)
    assert is_avi(data)
    out = list(avi_frames(data))
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, got), want in zip(out, frames):
        assert np.array_equal(got, want)


def test_avi_info_header_fields():
    data = encode_avi(_frames(n=5, h=32, w=48), codec="MJPG", fps=25)
    assert avi_info(data) == {
        "width": 48, "height": 32, "n_frames": 5, "fps": 25, "codec": "MJPG",
    }


def test_mjpeg_round_trip_psnr_40db():
    y, x = np.mgrid[0:32, 0:48]
    frames = [
        np.stack([(x * 2 + k * 5) % 200, (y * 3) % 200, (x + y) % 200],
                 axis=-1).astype(np.uint8)
        for k in range(3)
    ]
    data = encode_avi(frames, codec="MJPG", quality=92)
    out = list(avi_frames(data))
    assert len(out) == 3
    for (_, got), want in zip(out, frames):
        assert psnr(got, want) >= 40.0


def test_hand_rolled_spec_avi_decodes_exactly():
    """An AVI written field-by-field from the spec (NOT via encode_avi):
    a mux/demux pair that made the same row-order or channel-order mistake
    would round-trip — this fixture cannot.  One 3x2 frame, bottom-up BGR
    rows padded to 4 bytes:

        image (top-down RGB): row0 = red green blue, row1 = white black gray
    """
    red, green, blue = (255, 0, 0), (0, 255, 0), (0, 0, 255)
    white, black, gray = (255, 255, 255), (0, 0, 0), (128, 128, 128)
    want = np.array([[red, green, blue], [white, black, gray]], dtype=np.uint8)

    def bgr(px):
        return bytes(px[::-1])

    # bottom-up: file row 0 is image row 1; stride 3*3=9 -> pad to 12
    dib = (bgr(white) + bgr(black) + bgr(gray) + b"\0\0\0"
           + bgr(red) + bgr(green) + bgr(blue) + b"\0\0\0")
    u32 = lambda v: struct.pack("<I", v)

    avih = struct.pack("<14I", 40000, 0, 0, 0x10, 1, 0, 1, len(dib), 3, 2,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " +
            struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, 25, 0, 1,
                        len(dib), 0, 0, 0, 0, 3, 2))
    strf = struct.pack("<IiiHH4sIiiII", 40, 3, 2, 1, 24, u32(0), len(dib),
                       0, 0, 0, 0)
    strl = b"LIST" + u32(4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + u32(len(strh)) + strh + b"strf" + u32(len(strf)) + strf
    hdrl = b"LIST" + u32(4 + 8 + len(avih) + len(strl)) + b"hdrl" \
        + b"avih" + u32(len(avih)) + avih + strl
    movi = b"LIST" + u32(4 + 8 + len(dib)) + b"movi" \
        + b"00db" + u32(len(dib)) + dib
    payload = b"AVI " + hdrl + movi
    data = b"RIFF" + u32(len(payload)) + payload

    out = list(avi_frames(data))
    assert len(out) == 1 and out[0][0] == 0
    assert np.array_equal(out[0][1], want)


def test_sample_video_frames_dispatches_avi_and_every_n():
    frames = _frames(n=5, h=8, w=8)
    data = encode_avi(frames, codec="DIB ")
    out = sample_video_frames(data, every_n=2)
    assert [i for i, _ in out] == [0, 2, 4]
    for (i, got) in out:
        assert np.array_equal(got, frames[i])


def test_malformed_avi_raises_for_per_record_recovery():
    with pytest.raises((ValueError, NotImplementedError)):
        sample_video_frames(b"RIFF\x10\x00\x00\x00AVI LIST\x04\x00\x00\x00hdrl")
    # mp4 container parses for real now; a moov-less stub is a ValueError,
    # a modern codec a NotImplementedError (tests/test_mp4.py)
    with pytest.raises(ValueError):
        sample_video_frames(b"\x00\x00\x00\x18ftypmp42" + b"\0" * 16)
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x1aE\xdf\xa3webm stub")  # webm: honest no


def test_sample_frames_operator_over_avi(spark):
    """Spark-side plumbing: the existing mapInPandas frame sampler handles
    AVI payloads with no operator change (dispatch in imaging.py)."""
    from webarchive_discovery_spark.operators.multimodal import sample_frames

    vids = [(k, bytearray(encode_avi(_frames(n=2 + k, h=8, w=5, seed=k),
                                     codec="DIB "))) for k in range(3)]
    df = spark.createDataFrame(
        [(str(k), bytes(b)) for k, b in vids], "video_id string, bytes binary")
    rows = sample_frames(df, every_n=1).collect()
    assert [r["decode_error"] for r in rows] == [None] * len(rows)
    got = sorted((r["video_id"], r["frame_index"], r["frame_w"], r["frame_h"])
                 for r in rows)
    want = sorted((str(k), f, 5, 8) for k in range(3) for f in range(2 + k))
    assert got == want
