"""GIF87a/89a decoder: LZW decompression, global/local color tables,
interlacing, transparency, and multi-frame animation with disposal
methods — pure Python + numpy.

Two public entry points:

- :func:`decode_gif` — first composed frame as (H, W, 3) uint8 RGB (what
  an image analyser wants);
- :func:`gif_frames` — iterator of (frame_index, delay_cs, rgb) over the
  composed animation — a *real* demuxer for the frame-sampling tier
  (``operators/multimodal.sample_frames``), replacing the fake container
  for the one animated format web archives actually contain in bulk.
  mp4/webm still raise ``NotImplementedError`` (no codec libs here).

Verified against ``javax.imageio`` in ``tests/test_png_gif.py`` on the
reference repository's GIF assets.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

__all__ = ["GifError", "decode_gif", "gif_frames", "gif_dims"]


class GifError(ValueError):
    """Malformed or unsupported GIF stream."""


def gif_dims(data: bytes) -> tuple[int, int] | None:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-flavor LZW (variable width, CLEAR/EOI, MSB-last packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the byte stream
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: treat as end
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            width = reset()
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifError("bad LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            break
        out += data[pos:pos + n]
        pos += n
    return bytes(out), pos


_DEINTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def gif_frames(data: bytes) -> Iterator[tuple[int, int, np.ndarray]]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("missing GIF signature")
    W, H, packed, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.full((H, W, 3), 255, np.uint8)  # browsers show white
    painted = np.zeros((H, W), bool)
    transparent_idx = -1
    delay_cs = 0
    disposal = 0
    frame_i = 0

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            block, pos = _subblocks(data, pos)
            if label == 0xF9 and len(block) >= 4:  # graphic control
                flags = block[0]
                delay_cs = struct.unpack("<H", block[1:3])[0]
                transparent_idx = block[3] if flags & 1 else -1
                disposal = (flags >> 2) & 7
            continue
        if b != 0x2C:  # image descriptor
            raise GifError(f"unknown block 0x{b:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        lct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            lct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise GifError("no color table")
        interlaced = bool(fpacked & 0x40)
        min_code = data[pos]
        pos += 1
        lzw, pos = _subblocks(data, pos)
        idxs = np.frombuffer(
            _lzw_decode(min_code, lzw)[: fw * fh], np.uint8)
        if idxs.size < fw * fh:
            idxs = np.pad(idxs, (0, fw * fh - idxs.size))
        idxs = idxs.reshape(fh, fw)
        if interlaced:
            de = np.empty_like(idxs)
            src = 0
            for start, step in _DEINTERLACE:
                rows = range(start, fh, step)
                for r in rows:
                    de[r] = idxs[src]
                    src += 1
            idxs = de

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        safe = np.minimum(idxs, len(lct) - 1)
        px = lct[safe]
        if transparent_idx >= 0:
            opaque = idxs != transparent_idx
        else:
            opaque = np.ones(idxs.shape, bool)
        region[opaque[: region.shape[0], : region.shape[1]]] = (
            px[: region.shape[0], : region.shape[1]][
                opaque[: region.shape[0], : region.shape[1]]])
        painted[top:top + fh, left:left + fw] |= opaque[
            : region.shape[0], : region.shape[1]]

        yield frame_i, delay_cs, canvas.copy()
        frame_i += 1

        if disposal == 2:  # restore to background (white, like browsers)
            canvas[top:top + fh, left:left + fw] = 255
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas


def decode_gif(data: bytes) -> np.ndarray:
    for _, _, frame in gif_frames(data):
        return frame
    raise GifError("no image data")
