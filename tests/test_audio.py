"""RIFF/WAVE PCM decoder + integer-exact audio features
(``functions/audio.py``)."""

import struct

import numpy as np
import pytest

from webarchive_discovery_spark.functions.audio import (
    audio_features,
    decode_wav,
    encode_wav,
    is_wav,
    wav_info,
)


def test_pcm16_stereo_round_trip_bit_exact():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, (1000, 2)).astype(np.int16)
    w = encode_wav(s, 44100)
    assert is_wav(w)
    dec, rate = decode_wav(w)
    assert rate == 44100 and np.array_equal(dec, s)
    assert wav_info(w) == {"sample_rate": 44100, "channels": 2, "bits": 16,
                           "n_samples": 1000, "duration_ms": 22,
                           "codec": "pcm"}


def _wav(fmt_payload: bytes, data: bytes, extra_chunks: bytes = b"") -> bytes:
    payload = (b"WAVE" + extra_chunks
               + b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
               + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def test_hand_rolled_spec_wav_8bit_and_unknown_chunk_skip():
    """Written field-by-field from the spec (NOT via encode_wav): unsigned
    8-bit PCM rescales exactly to int16, and an unknown chunk before
    ``fmt `` is skipped by declared size."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    w = _wav(fmt, bytes([128, 255, 0, 128]), extra_chunks=junk)
    dec, rate = decode_wav(w)
    assert rate == 8000
    assert list(dec[:, 0]) == [0, 127 * 256, -128 * 256, 0]


def test_wave_format_extensible_resolves_to_pcm():
    sub = struct.pack("<H", 1) + b"\0" * 14  # PCM subformat GUID prefix
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
           + struct.pack("<H", 22) + struct.pack("<HI", 16, 1) + sub)
    s = np.array([1, -2, 3], dtype="<i2").tobytes()
    dec, rate = decode_wav(_wav(fmt, s))
    assert list(dec[:, 0]) == [1, -2, 3]
    assert wav_info(_wav(fmt, s))["codec"] == "pcm"


def test_features_integer_exact():
    mono = np.array([0, 5, -3, 0, 2, -2], dtype=np.int16)
    assert audio_features(mono, 1000) == {
        "n_samples": 6, "duration_ms": 6, "peak_abs": 5, "energy": 42,
        "zero_crossings": 3,
    }
    # full-scale negative squares must not overflow int16/int32
    full = np.array([-32768, 32767], dtype=np.int16)
    f = audio_features(full, 8000)
    assert f["energy"] == 32768**2 + 32767**2 and f["peak_abs"] == 32768


def test_malformed_inputs_raise_for_per_record_recovery():
    with pytest.raises(ValueError):
        decode_wav(b"ID3\x03" + b"\0" * 20)  # mp3: honest no
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt
    fmt_float = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    with pytest.raises(ValueError):
        decode_wav(_wav(fmt_float, b"\0" * 8))  # float PCM unsupported
    # truncated data chunk is clamped, not fatal
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", 100) + b"\x01\x00\x02\x00")
    w = b"RIFF" + struct.pack("<I", len(payload)) + payload
    dec, _ = decode_wav(w)
    assert list(dec[:, 0]) == [1, 2]


def test_mp3_id3v2_tags_and_frame_walk():
    from webarchive_discovery_spark.functions.audio import (
        encode_mp3_stub,
        mp3_info,
    )

    m = encode_mp3_stub(100, 128, 44100, title="Song T", artist="Ann",
                        album="LP")
    assert mp3_info(m) == {
        "title": "Song T", "artist": "Ann", "album": "LP",
        "bitrate_kbps": 128, "sample_rate": 44100, "n_frames": 100,
        "duration_ms": 100 * 1152 * 1000 // 44100,
    }
    # junk before the first sync word is scanned past; no tag -> None tags
    j = mp3_info(b"\x00junkjunk" + encode_mp3_stub(3, 192, 48000))
    assert (j["n_frames"], j["sample_rate"], j["bitrate_kbps"],
            j["title"]) == (3, 48000, 192, None)
    with pytest.raises(ValueError):
        mp3_info(b"RIFFxxxxWAVE")  # no MPEG frame


def test_mp3_utf16_tag_and_id3v24_syncsafe_sizes():
    import struct as st

    from webarchive_discovery_spark.functions.audio import mp3_info

    body = b"\x01" + "Tétra".encode("utf-16")  # enc=1: UTF-16 with BOM
    frame = b"TIT2" + bytes(((len(body) >> s) & 0x7F)
                            for s in (21, 14, 7, 0)) + b"\0\0" + body
    id3 = (b"ID3\x04\x00\x00"
           + bytes(((len(frame) >> s) & 0x7F) for s in (21, 14, 7, 0))
           + frame)
    mpeg = bytes([0xFF, 0xFB, (9 << 4) | (0 << 2), 0x00])
    mpeg += b"\0" * ((144 * 128000) // 44100 - 4)
    assert mp3_info(id3 + mpeg)["title"] == "Tétra"


# ---------------------------------------------------------------------------
# FLAC metadata tier
# ---------------------------------------------------------------------------

def test_flac_roundtrip_all_fields():
    from webarchive_discovery_spark.functions.audio import (
        encode_flac_stub, flac_info)

    d = encode_flac_stub(sample_rate=96000, channels=8, bits_per_sample=32,
                         total_samples=(1 << 36) - 1, md5=bytes(range(16)),
                         title="T", artist="A", album="L")
    r = flac_info(d)
    assert (r["sample_rate"], r["channels"], r["bits_per_sample"]) == (
        96000, 8, 32)
    assert r["total_samples"] == (1 << 36) - 1  # 36-bit field saturated
    assert r["md5_hex"] == bytes(range(16)).hex()
    assert (r["title"], r["artist"], r["album"]) == ("T", "A", "L")


def test_flac_streaminfo_bit_layout():
    """The packed STREAMINFO bytes checked against the spec layout
    independently of the symmetric encoder: sample rate is the TOP 20 bits
    of the 8-byte field."""
    from webarchive_discovery_spark.functions.audio import encode_flac_stub

    d = encode_flac_stub(sample_rate=44100, channels=2, bits_per_sample=16,
                         total_samples=7)
    # STREAMINFO body starts after 'fLaC' + 4-byte block header
    body = d[8:8 + 34]
    packed = int.from_bytes(body[10:18], "big")
    assert packed >> 44 == 44100
    assert ((packed >> 41) & 0x7) + 1 == 2
    assert ((packed >> 36) & 0x1F) + 1 == 16
    assert packed & ((1 << 36) - 1) == 7


def test_flac_malformed_and_case_insensitive_comments():
    import struct

    import pytest as _pytest

    from webarchive_discovery_spark.functions.audio import (
        encode_flac_stub, flac_info)

    with _pytest.raises(ValueError):
        flac_info(b"RIFFxxxx")
    # lowercase vorbis field names are accepted per spec
    d = encode_flac_stub(title="X")
    lc = d.replace(b"TITLE=", b"title=")
    assert flac_info(lc)["title"] == "X"


def test_mp3_id3v1_trailer_fallback():
    from webarchive_discovery_spark.functions.audio import (
        encode_mp3_stub, mp3_info)

    mp3 = encode_mp3_stub(3)  # no ID3v2 text frames
    v1 = (b"TAG" + b"Old Title".ljust(30, b"\0")
          + b"Old Artist".ljust(30, b"\0") + b"Old Album".ljust(30, b"\0")
          + b"\0" * 35)
    assert len(v1) == 128
    r = mp3_info(mp3 + v1)
    assert (r["title"], r["artist"], r["album"]) == (
        "Old Title", "Old Artist", "Old Album")
    # ID3v2 wins when present
    tagged = encode_mp3_stub(3, title="New")
    assert mp3_info(tagged + v1)["title"] == "New"
