"""Real RIFF/WAVE (PCM) audio decoder + muxer and deterministic audio
features (pure stdlib + numpy).

The multimodal training-data tier treats audio as an opaque binary column
with typed metadata; WAV/PCM is the one audio format fully decodable
without codec libraries, so its decode and feature-extraction path is REAL
here.  MP3 gets a real METADATA tier (ID3v2 text tags + MPEG frame-header
walk, below) while its sample decode — like ogg/aac — stays an honest
``ValueError``/``NotImplementedError`` (those codecs cannot ship in this
sandbox).  The reference classifies ``audio/*`` via the MIME ladder only
(``functions/mime.py`` ports that); sample-level features are the
training-pipeline addition.

Container: RIFF 'WAVE' with 'fmt ' (PCM format 1 or WAVE_FORMAT_EXTENSIBLE
0xFFFE wrapping PCM) and 'data' chunks, walked tolerantly like the AVI
demuxer — unknown chunks are skipped by declared size, a truncated final
chunk is clamped, and malformed input raises ``ValueError`` for the
caller's per-record recovery.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "wav_info", "decode_wav", "audio_features", "is_wav",
           "mp3_info", "encode_mp3_stub", "flac_info", "encode_flac_stub"]

_U32 = struct.Struct("<I")


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Mux int16 PCM samples — shape ``(n,)`` mono or ``(n, channels)`` —
    into a canonical WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block,
                      block, 16)
    data = s.tobytes()  # interleaved frames, little-endian
    payload = (b"WAVE"
               + b"fmt " + _U32.pack(len(fmt)) + fmt
               + b"data" + _U32.pack(len(data)) + data
               + (b"\0" if len(data) % 2 else b""))
    return b"RIFF" + _U32.pack(len(payload)) + payload


def _walk(data: bytes):
    end = min(len(data), 8 + _U32.unpack_from(data, 4)[0])
    pos = 12
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = _U32.unpack_from(data, pos + 4)[0]
        start = pos + 8
        size = min(size, max(0, end - start))
        yield fourcc, start, size
        pos = start + size + (size % 2)


def _parse(data: bytes) -> tuple[dict, int, int]:
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE file")
    info: dict = {}
    data_at = data_len = None
    for fourcc, start, size in _walk(data):
        if fourcc == b"fmt " and size >= 16:
            tag, ch, rate, _, block, bits = struct.unpack_from(
                "<HHIIHH", data, start)
            if tag == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                tag = struct.unpack_from("<H", data, start + 24)[0]
            info = {"format_tag": tag, "channels": ch, "sample_rate": rate,
                    "block_align": block, "bits": bits}
        elif fourcc == b"data" and data_at is None:
            data_at, data_len = start, size
    if not info:
        raise ValueError("WAV has no fmt chunk")
    if data_at is None:
        raise ValueError("WAV has no data chunk")
    return info, data_at, data_len


def wav_info(data: bytes) -> dict:
    """Header metadata without decoding samples: sample_rate / channels /
    bits / n_samples / duration_ms / codec."""
    info, _, data_len = _parse(data)
    block = info["block_align"] or (info["channels"] * info["bits"] // 8) or 1
    n = data_len // block
    return {
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bits": info["bits"],
        "n_samples": n,
        "duration_ms": (n * 1000) // info["sample_rate"]
        if info["sample_rate"] else None,
        "codec": "pcm" if info["format_tag"] == 1 else hex(info["format_tag"]),
    }


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM samples to ``(samples int16 (n, channels), sample_rate)``.
    Supported encodings: PCM 16-bit and PCM unsigned 8-bit (rescaled to
    int16 exactly: ``(v - 128) * 256``); anything else (float, ADPCM,
    mp3-in-wav) raises for per-record recovery."""
    info, at, size = _parse(data)
    if info["format_tag"] != 1:
        raise ValueError(f"unsupported WAV format tag: {info['format_tag']:#x}")
    ch = max(1, info["channels"])
    if info["bits"] == 16:
        n = size // (2 * ch)
        s = np.frombuffer(data, dtype="<i2", count=n * ch, offset=at)
        return s.reshape(n, ch).astype(np.int16), info["sample_rate"]
    if info["bits"] == 8:
        n = size // ch
        s = np.frombuffer(data, dtype=np.uint8, count=n * ch, offset=at)
        return (((s.astype(np.int16)) - 128) * 256).reshape(n, ch), \
            info["sample_rate"]
    raise ValueError(f"unsupported PCM bit depth: {info['bits']}")


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Deterministic integer-exact features over int16 samples (first
    channel): peak amplitude, energy (sum of squares), zero-crossing count,
    duration.  All exact integers so a SQL oracle can restate them."""
    s = np.asarray(samples)
    if s.ndim == 2:
        s = s[:, 0]
    s64 = s.astype(np.int64)
    sign = np.sign(s64)
    nz = sign[sign != 0]
    return {
        "n_samples": int(s.shape[0]),
        "duration_ms": int(s.shape[0] * 1000) // sample_rate if sample_rate else None,
        "peak_abs": int(np.abs(s64).max(initial=0)),
        "energy": int((s64 * s64).sum()),
        "zero_crossings": int((nz[1:] != nz[:-1]).sum()) if nz.size else 0,
    }


# ---------------------------------------------------------------------------
# MP3 (MPEG audio) metadata: ID3v2 tags + frame-header walk — no decode.
# ``audio/mpeg`` is the most common audio MIME in web archives; its header
# grammar (ISO 11172-3) and ID3v2 (id3.org spec) are pure-stdlib parseable,
# so the METADATA tier is real here while sample decode stays an honest
# ``NotImplementedError`` (an MDCT/huffman decoder cannot ship here).
# ---------------------------------------------------------------------------

# MPEG1 Layer III bitrate table (kbps), index 1-14
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                 256, 320)
_MP3_RATES = (44100, 48000, 32000)  # MPEG1 sample-rate index 0-2
_ID3_TEXT_FRAMES = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album"}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3v2_tags(data: bytes) -> tuple[dict, int]:
    """Parse leading ID3v2.3/2.4 text frames; returns (tags, body_offset)."""
    tags: dict = {"title": None, "artist": None, "album": None}
    if data[:3] != b"ID3" or len(data) < 10:
        return tags, 0
    version = data[3]
    size = _syncsafe(data[6:10])
    end = min(10 + size, len(data))
    pos = 10
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if not fid.strip(b"\0"):
            break  # padding
        fsz = (_syncsafe(data[pos + 4 : pos + 8]) if version >= 4
               else struct.unpack(">I", data[pos + 4 : pos + 8])[0])
        body = data[pos + 10 : pos + 10 + fsz]
        key = _ID3_TEXT_FRAMES.get(fid)
        if key and body:
            enc, text = body[0], body[1:]
            if enc == 0:
                tags[key] = text.decode("latin-1", "replace").rstrip("\0") or None
            elif enc == 1:
                tags[key] = text.decode("utf-16", "replace").rstrip("\0") or None
            elif enc == 3:
                tags[key] = text.decode("utf-8", "replace").rstrip("\0") or None
        pos += 10 + fsz
    return tags, end


def mp3_info(data: bytes) -> dict:
    """ID3v2 text tags + MPEG1-Layer-III frame-header walk: title / artist /
    album / bitrate_kbps (of the first frame) / sample_rate / n_frames /
    duration_ms (1152 samples per frame).  Frames are walked by computed
    length (``144 * bitrate / rate + padding``), so a corrupt stream ends
    the walk instead of failing the record."""
    data = bytes(data)
    tags, pos = _id3v2_tags(data)
    first = None
    n_frames = 0
    while pos + 4 <= len(data):
        if data[pos] == 0xFF and (data[pos + 1] & 0xFE) == 0xFA:
            # MPEG1 (11 sync + version 11 + layer 01): 0xFFFA/0xFFFB
            br_idx = data[pos + 2] >> 4
            sr_idx = (data[pos + 2] >> 2) & 0x3
            if not (1 <= br_idx <= 14) or sr_idx > 2:
                break
            bitrate = _MP3_BITRATES[br_idx] * 1000
            rate = _MP3_RATES[sr_idx]
            padding = (data[pos + 2] >> 1) & 0x1
            if first is None:
                first = (bitrate, rate)
            n_frames += 1
            pos += (144 * bitrate) // rate + padding
        elif first is None:
            pos += 1  # scan for first sync word past junk
        else:
            break
    if first is None:
        raise ValueError("no MPEG audio frame found")
    if all(v is None for v in tags.values()) and len(data) >= 128 \
            and data[-128:-125] == b"TAG":
        # ID3v1 trailer fallback: fixed 30-byte latin-1 fields
        v1 = data[-128:]
        for key, lo, hi in (("title", 3, 33), ("artist", 33, 63),
                            ("album", 63, 93)):
            val = v1[lo:hi].decode("latin-1", "replace").rstrip("\0 ")
            tags[key] = val or None
    bitrate, rate = first
    return {
        **tags,
        "bitrate_kbps": bitrate // 1000,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1152 * 1000) // rate,
    }


def encode_mp3_stub(n_frames: int, bitrate_kbps: int = 128,
                    sample_rate: int = 44100, title: str | None = None,
                    artist: str | None = None, album: str | None = None) -> bytes:
    """Header-valid MPEG1-Layer-III stream (frame payloads are zeros — a
    real encoder cannot ship here) with an ID3v2.3 tag, for exercising the
    metadata walk end-to-end."""
    frames = []
    for k, v in ((b"TIT2", title), (b"TPE1", artist), (b"TALB", album)):
        if v is not None:
            body = b"\x03" + v.encode("utf-8")
            frames.append(k + struct.pack(">I", len(body)) + b"\0\0" + body)
    tag_body = b"".join(frames)
    id3 = (b"ID3\x03\x00\x00"
           + bytes(((len(tag_body) >> s) & 0x7F) for s in (21, 14, 7, 0))
           + tag_body)
    br_idx = _MP3_BITRATES.index(bitrate_kbps)
    sr_idx = _MP3_RATES.index(sample_rate)
    flen = (144 * bitrate_kbps * 1000) // sample_rate
    header = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
    frame = header + b"\0" * (flen - 4)
    return id3 + frame * n_frames


# ---------------------------------------------------------------------------
# FLAC metadata (STREAMINFO + VORBIS_COMMENT; spec: xiph.org/flac/format)
# ---------------------------------------------------------------------------

def flac_info(data: bytes) -> dict:
    """FLAC metadata-block walk: STREAMINFO (sample rate, channels, bit
    depth, total samples → duration) and VORBIS_COMMENT (TITLE/ARTIST/
    ALBUM, case-insensitive field names).  Raises on a non-FLAC payload;
    a truncated block list ends the walk with what was parsed."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise ValueError("no fLaC magic")
    out = {"title": None, "artist": None, "album": None, "sample_rate": None,
           "channels": None, "bits_per_sample": None, "total_samples": None,
           "duration_ms": None, "md5_hex": None}
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if btype == 0 and len(body) >= 34:  # STREAMINFO
            bits = int.from_bytes(body[10:18], "big")
            out["sample_rate"] = bits >> 44
            out["channels"] = ((bits >> 41) & 0x7) + 1
            out["bits_per_sample"] = ((bits >> 36) & 0x1F) + 1
            out["total_samples"] = bits & ((1 << 36) - 1)
            out["md5_hex"] = body[18:34].hex()
            if out["sample_rate"]:
                out["duration_ms"] = (
                    out["total_samples"] * 1000) // out["sample_rate"]
        elif btype == 4 and len(body) >= 8:  # VORBIS_COMMENT (all LE)
            vlen = struct.unpack("<I", body[:4])[0]
            p = 4 + vlen
            if p + 4 <= len(body):
                n = struct.unpack("<I", body[p:p + 4])[0]
                p += 4
                for _ in range(min(n, 256)):
                    if p + 4 > len(body):
                        break
                    clen = struct.unpack("<I", body[p:p + 4])[0]
                    item = body[p + 4:p + 4 + clen].decode("utf-8", "replace")
                    p += 4 + clen
                    k, _, v = item.partition("=")
                    k = k.lower()
                    if k in ("title", "artist", "album") and v:
                        out[k] = v
        pos += 4 + blen
        if last:
            break
    if out["sample_rate"] is None:
        raise ValueError("no STREAMINFO block")
    return out


def encode_flac_stub(sample_rate: int = 44100, channels: int = 2,
                     bits_per_sample: int = 16, total_samples: int = 0,
                     md5: bytes = b"\0" * 16, title: str | None = None,
                     artist: str | None = None,
                     album: str | None = None) -> bytes:
    """Header-valid FLAC (metadata blocks only — a real FLAC encoder
    cannot ship here), for exercising the metadata walk end-to-end."""
    bits = ((sample_rate << 44) | ((channels - 1) << 41)
            | ((bits_per_sample - 1) << 36)
            | (total_samples & ((1 << 36) - 1)))
    streaminfo = (struct.pack(">HH", 4096, 4096) + b"\0" * 6
                  + bits.to_bytes(8, "big") + md5)
    assert len(streaminfo) == 34
    comments = [f"{k}={v}".encode() for k, v in
                (("TITLE", title), ("ARTIST", artist), ("ALBUM", album))
                if v is not None]
    vendor = b"wads-flac-stub"
    vc = struct.pack("<I", len(vendor)) + vendor
    vc += struct.pack("<I", len(comments))
    for c in comments:
        vc += struct.pack("<I", len(c)) + c
    out = b"fLaC"
    out += bytes([0]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
    return out
