"""Real RIFF/WAVE (PCM) audio decoder + muxer and deterministic audio
features (pure stdlib + numpy).

The multimodal training-data tier treats audio as an opaque binary column
with typed metadata; WAV/PCM is the one audio format fully decodable
without codec libraries, so its decode and feature-extraction path is REAL
here (mp3/ogg/aac stay honest ``NotImplementedError``s — their codecs
cannot ship in this sandbox).  The reference classifies ``audio/*`` via
the MIME ladder only (``functions/mime.py`` ports that); sample-level
features are the training-pipeline addition.

Container: RIFF 'WAVE' with 'fmt ' (PCM format 1 or WAVE_FORMAT_EXTENSIBLE
0xFFFE wrapping PCM) and 'data' chunks, walked tolerantly like the AVI
demuxer — unknown chunks are skipped by declared size, a truncated final
chunk is clamped, and malformed input raises ``ValueError`` for the
caller's per-record recovery.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav", "wav_info", "decode_wav", "audio_features", "is_wav"]

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
