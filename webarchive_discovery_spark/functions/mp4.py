"""Real ISO BMFF (MP4/MOV) container demuxer + muxer (pure stdlib + numpy).

Upgrades the mp4 story from "no" to "container real, codec gated": the box
walk, track selection, and sample-table resolution (``stsd``/``stsz``/
``stsc``/``stco``/``co64``) are fully implemented, so **Motion-JPEG in
MP4/MOV** (sample formats ``jpeg``/``mjpa``/``MJPG``) decodes end-to-end
through the in-repo JPEG codec.  Modern codecs (``avc1``/``hvc1``/
``vp09``/``av01``) raise ``NotImplementedError`` naming the codec — an
H.264 decoder genuinely cannot ship in this sandbox — and the error routes
through the same per-record recovery as every other payload parser.

The reference identifies ``video/mp4`` via Tika's container detector
(``TikaPayloadAnalyser.java:165-240``); sample-level demux is the
training-pipeline addition.

Box grammar (ISO/IEC 14496-12): ``u32 size + fourcc type``; ``size==1`` →
u64 largesize follows; ``size==0`` → box extends to end of file.
Containers walked: ``moov > trak > mdia > minf > stbl``.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401 — frames come back as ndarrays

__all__ = ["encode_mp4_mjpeg", "mp4_info", "mp4_frames", "is_mp4"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
_VIDEO_JPEG = {b"jpeg", b"mjpa", b"mjpb", b"MJPG", b"AVDJ"}


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


# ---------------------------------------------------------------------------
# Muxer (MJPEG samples; the test/fixture path)
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + payload)


def encode_mp4_mjpeg(frames: list, fps: int = 25, quality: int = 90) -> bytes:
    """Mux RGB frames into an MP4 with a Motion-JPEG video track (sample
    format ``jpeg``, one contiguous chunk).  Every sample is a baseline
    JPEG from the in-repo encoder."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    samples = [encode_jpeg(f, quality=quality) for f in frames]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    # sample data begins after ftyp + the mdat header (8 bytes)
    chunk_offset = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    timescale, n = fps, len(samples)
    mvhd = _full(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, n)
                 + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                 + b"\0" * 10 + _MATRIX + b"\0" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, struct.pack(">IIIII", 0, 0, 1, 0, n)
                 + b"\0" * 16 + _MATRIX
                 + struct.pack(">II", w << 16, h << 16))
    mdhd = _full(b"mdhd", 0, struct.pack(">IIII", 0, 0, timescale, n)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, b"\0" * 4 + b"vide" + b"\0" * 12 + b"MJPEG\0")
    entry = (b"\0" * 6 + struct.pack(">H", 1)        # reserved + data_ref_idx
             + b"\0" * 16                             # pre_defined/reserved
             + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\0" * 4 + struct.pack(">H", 1)       # reserved + frame_count
             + b"\0" * 32                             # compressorname
             + struct.pack(">Hh", 24, -1))            # depth, color_table_id
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, struct.pack(">II", 1, chunk_offset))
    # one self-contained 'url ' entry (flags=1: data in this file)
    dref = _full(b"dref", 0, struct.pack(">I", 1)
                 + struct.pack(">I", 12) + b"url " + struct.pack(">I", 1))
    dinf = _box(b"dinf", dref)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
                + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)


# ---------------------------------------------------------------------------
# Demuxer
# ---------------------------------------------------------------------------

def _iter_boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        start = pos + 8
        if size == 1:
            if pos + 16 > end:
                break
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            start = pos + 16
        elif size == 0:
            size = end - pos
        body_end = min(pos + size, end) if size >= 8 else end
        yield fourcc, start, body_end
        if size < 8:
            break  # malformed size; stop rather than loop
        pos += size


def _find(data: bytes, pos: int, end: int, path: list[bytes]):
    """Yield (start, end) of every box matching the fourcc path."""
    head, rest = path[0], path[1:]
    for fourcc, start, body_end in _iter_boxes(data, pos, end):
        if fourcc != head:
            continue
        if not rest:
            yield start, body_end
        else:
            yield from _find(data, start, body_end, rest)


def _video_track(data: bytes) -> dict | None:
    """First track whose ``hdlr`` is ``vide``, with its sample tables."""
    for moov_s, moov_e in _find(data, 0, len(data), [b"moov"]):
        for trak_s, trak_e in _find(data, moov_s, moov_e, [b"trak"]):
            t: dict = {"width": None, "height": None}
            is_video = False
            for s, e in _find(data, trak_s, trak_e, [b"mdia", b"hdlr"]):
                is_video = data[s + 8 : s + 12] == b"vide"
            if not is_video:
                continue
            for s, e in _find(data, trak_s, trak_e, [b"tkhd"]):
                ver = data[s]
                off = s + 4 + (32 if ver == 1 else 20) + 16 + 36
                if off + 8 <= e:
                    wq, hq = struct.unpack_from(">II", data, off)
                    t["width"], t["height"] = wq >> 16, hq >> 16
            for s, e in _find(data, trak_s, trak_e, [b"mdia", b"mdhd"]):
                ver = data[s]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, s + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", data, s + 4 + 8)
                t["timescale"], t["duration"] = ts, dur
            stbl = [b"mdia", b"minf", b"stbl"]
            for s, e in _find(data, trak_s, trak_e, stbl + [b"stsd"]):
                for fmt, es, ee in _iter_boxes(data, s + 8, e):
                    t["codec"] = fmt.decode("latin-1").strip()
                    if ee - es >= 28:
                        w, h = struct.unpack_from(">HH", data, es + 24)
                        t["width"], t["height"] = t["width"] or w, t["height"] or h
                    break
            for s, e in _find(data, trak_s, trak_e, stbl + [b"stsz"]):
                fixed, count = struct.unpack_from(">II", data, s + 4)
                if fixed:
                    t["sizes"] = [fixed] * count
                else:
                    t["sizes"] = list(struct.unpack_from(f">{count}I", data, s + 12))
            for s, e in _find(data, trak_s, trak_e, stbl + [b"stsc"]):
                count = struct.unpack_from(">I", data, s + 4)[0]
                t["stsc"] = [struct.unpack_from(">III", data, s + 8 + 12 * i)
                             for i in range(count)]
            for s, e in _find(data, trak_s, trak_e, stbl + [b"stco"]):
                count = struct.unpack_from(">I", data, s + 4)[0]
                t["offsets"] = list(struct.unpack_from(f">{count}I", data, s + 8))
            for s, e in _find(data, trak_s, trak_e, stbl + [b"co64"]):
                count = struct.unpack_from(">I", data, s + 4)[0]
                t["offsets"] = list(struct.unpack_from(f">{count}Q", data, s + 8))
            return t
    return None


def _sample_ranges(t: dict):
    """Resolve stsc/stco/stsz into per-sample (offset, size)."""
    sizes, offsets = t.get("sizes", []), t.get("offsets", [])
    stsc = t.get("stsc") or [(1, len(sizes) or 1, 1)]
    si = 0
    for ci, chunk_off in enumerate(offsets, start=1):
        per = next(
            (spc for first, spc, _ in reversed(stsc) if first <= ci),
            stsc[0][1],
        )
        off = chunk_off
        for _ in range(per):
            if si >= len(sizes):
                return
            yield off, sizes[si]
            off += sizes[si]
            si += 1


def mp4_info(data: bytes) -> dict:
    """Header metadata without decoding any frame: width / height /
    n_frames / fps / codec."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF (mp4/mov) file")
    t = _video_track(data)
    if t is None:
        raise ValueError("mp4 has no video track")
    dur, ts = t.get("duration"), t.get("timescale")
    n = len(t.get("sizes", []))
    return {
        "width": t["width"], "height": t["height"], "n_frames": n,
        "fps": round(n * ts / dur) if dur and ts else None,
        "codec": t.get("codec"),
    }


def mp4_frames(data: bytes, every_n: int = 1):
    """Yield ``(frame_index, rgb ndarray)`` for every ``every_n``-th video
    sample.  MJPEG sample formats decode through the in-repo JPEG codec;
    anything else raises ``NotImplementedError`` naming the codec."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF (mp4/mov) file")
    t = _video_track(data)
    if t is None:
        raise ValueError("mp4 has no video track")
    codec = (t.get("codec") or "").encode("latin-1").ljust(4)[:4]
    if codec not in _VIDEO_JPEG:
        raise NotImplementedError(
            f"mp4 codec {t.get('codec')!r} not decodable here (only MJPEG "
            "sample formats; H.264/HEVC/VP9/AV1 decoders cannot ship in "
            "this sandbox)"
        )
    from .imaging import decode_image

    for idx, (off, size) in enumerate(_sample_ranges(t)):
        if idx % every_n:
            continue
        payload = data[off : off + size]
        if payload[:2] != b"\xff\xd8":
            raise ValueError(f"sample {idx} is not a JPEG (bad stco/stsz)")
        yield idx, decode_image(payload, "jpeg")
