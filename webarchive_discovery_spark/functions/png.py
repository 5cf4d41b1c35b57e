"""Full-spec PNG decoder (RFC 2083 / W3C PNG): all five filter types,
all color types (gray, RGB, palette, gray+alpha, RGBA), bit depths
1/2/4/8/16, Adam7 interlacing, and tRNS transparency.

The minimal encoder in ``imaging.py`` (filter 0, 8-bit RGB) covers what we
*write*; this module covers what the crawl *reads* — arbitrary web PNGs.
Verified against ``javax.imageio`` on the reference's ``cc.png`` fixture
(``warc-indexer/src/test/resources/cc.png``) in ``tests/test_png_gif.py``.

Output is always (H, W, 3) uint8 RGB; alpha is composited over white
(what a browser shows on a plain page) and 16-bit samples are scaled to
8-bit.  Scanline unfiltering is a per-row loop (serial by construction —
each row depends on the previous); everything else is numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngError", "decode_png", "png_dims"]

_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 pass grids: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG stream."""


def png_dims(data: bytes) -> tuple[int, int] | None:
    if data[:8] != _SIG:
        return None
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _unfilter(raw: bytes, w: int, h: int, bpp: int, stride: int) -> np.ndarray:
    """Undo per-scanline filtering; returns (h, stride) uint8."""
    out = np.zeros((h, stride), np.uint16)  # uint16: intermediate sums
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw[pos:pos + stride], np.uint8).astype(np.uint16)
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, np.uint16)
        if ft == 0:
            out[y] = row
        elif ft == 1:  # Sub
            r = row.copy()
            for x in range(bpp, stride):
                r[x] = (r[x] + r[x - bpp]) & 0xFF
            out[y] = r
        elif ft == 2:  # Up
            out[y] = (row + prev) & 0xFF
        elif ft == 3:  # Average
            r = row.copy()
            for x in range(stride):
                a = r[x - bpp] if x >= bpp else 0
                r[x] = (r[x] + ((int(a) + int(prev[x])) >> 1)) & 0xFF
            out[y] = r
        elif ft == 4:  # Paeth
            r = row.copy()
            for x in range(stride):
                a = int(r[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                r[x] = (r[x] + pred) & 0xFF
            out[y] = r
        else:
            raise PngError(f"unknown filter type {ft}")
    return out.astype(np.uint8)


def _unpack_samples(rows: np.ndarray, w: int, depth: int, nch: int) -> np.ndarray:
    """(h, stride) filtered bytes → (h, w, nch) samples scaled to uint8."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * nch].reshape(h, w, nch)
    if depth == 16:
        return rows[:, : w * nch * 2].reshape(h, w, nch, 2)[:, :, :, 0]  # hi byte
    # sub-byte depths: always single channel (gray or palette)
    bits = np.unpackbits(rows, axis=1)
    idx = np.arange(w * depth).reshape(w, depth)
    vals = np.zeros((h, w), np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, idx[:, b]]
    return vals[:, :, None]


def _scale_depth(samples: np.ndarray, depth: int, is_palette: bool) -> np.ndarray:
    if depth >= 8 or is_palette:
        return samples
    max_in = (1 << depth) - 1
    return ((samples.astype(np.uint16) * 255) // max_in).astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise PngError("missing PNG signature")
    pos = 8
    w = h = depth = ctype = interlace = None
    palette: np.ndarray | None = None
    trns: bytes = b""
    idat = bytearray()
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload[:13])
            if comp or filt:
                raise PngError("unknown compression/filter method")
            if ctype not in _CHANNELS:
                raise PngError(f"unknown color type {ctype}")
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise PngError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT stream: {e}") from None

    nch = _CHANNELS[ctype]
    bits_pp = depth * nch
    bpp = max(1, bits_pp // 8)

    def decode_region(buf: bytes, rw: int, rh: int) -> np.ndarray:
        stride = (rw * bits_pp + 7) // 8
        rows = _unfilter(buf, rw, rh, bpp, stride)
        return _unpack_samples(rows, rw, depth, nch)

    if interlace == 0:
        stride = (w * bits_pp + 7) // 8
        expect = h * (stride + 1)
        samples = decode_region(raw[:expect], w, h)
    elif interlace == 1:  # Adam7
        samples = np.zeros((h, w, nch), np.uint8)
        off = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = (pw * bits_pp + 7) // 8
            take = ph * (stride + 1)
            sub = decode_region(raw[off:off + take], pw, ph)
            off += take
            samples[y0::dy, x0::dx] = sub
        samples = samples
    else:
        raise PngError(f"unknown interlace method {interlace}")

    # --- to RGB(A) uint8 ---
    alpha: np.ndarray | None = None
    if ctype == 3:  # palette
        if palette is None:
            raise PngError("palette image without PLTE")
        idxs = samples[:, :, 0]
        if int(idxs.max()) >= len(palette):
            raise PngError("palette index out of range")
        rgb = palette[idxs]
        if trns:
            amap = np.frombuffer(trns.ljust(256, b"\xff"), np.uint8)
            alpha = amap[idxs]
    elif ctype == 0:  # gray
        g = _scale_depth(samples[:, :, 0], depth, False)
        rgb = np.stack([g, g, g], axis=-1)
        if trns and depth <= 16:
            key = struct.unpack(">H", trns[:2])[0]
            raw_g = samples[:, :, 0].astype(np.uint16)
            alpha = np.where(raw_g == (key >> 8 if depth == 16 else key),
                             0, 255).astype(np.uint8)
    elif ctype == 2:  # RGB
        rgb = samples
        if trns and len(trns) >= 6:
            kr, kg, kb = struct.unpack(">HHH", trns[:6])
            shift = 8 if depth == 16 else 0
            mask = ((samples[:, :, 0] == (kr >> shift))
                    & (samples[:, :, 1] == (kg >> shift))
                    & (samples[:, :, 2] == (kb >> shift)))
            alpha = np.where(mask, 0, 255).astype(np.uint8)
    elif ctype == 4:  # gray + alpha
        g = samples[:, :, 0]
        rgb = np.stack([g, g, g], axis=-1)
        alpha = samples[:, :, 1]
    else:  # 6: RGBA
        rgb = samples[:, :, :3]
        alpha = samples[:, :, 3]

    rgb = rgb.astype(np.uint8)
    if alpha is not None and int(alpha.min()) < 255:
        a = alpha.astype(np.float64)[:, :, None] / 255.0
        rgb = np.round(rgb * a + 255.0 * (1.0 - a)).astype(np.uint8)
    return np.ascontiguousarray(rgb)
