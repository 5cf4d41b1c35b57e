"""Pure Python + numpy JPEG codec (ITU-T T.81 / RFC 2435 family).

Decoder: **baseline sequential (SOF0/SOF1) and progressive (SOF2)** DCT
streams — Huffman entropy coding, restart intervals, successive
approximation, spectral selection, 4:4:4/4:2:2/4:2:0 (any integer
subsampling ratio), grayscale and JFIF YCbCr color.  This is what real
crawled web JPEGs use (the reference's test corpus at
``warc-openimaj/src/test/resources/facedetection/`` mixes SOF0 and SOF2),
so the image+caption fetch simulation can validate *actual* web payloads,
not just the deterministic stand-in codec.

Encoder: baseline 4:4:4 with per-image **optimal Huffman tables** (built
from symbol frequencies, length-limited to 16 bits, all-ones code
reserved via the dummy-symbol construction) and Annex-K quantization
tables scaled by a libjpeg-style quality factor.  Optimal tables mean no
transcription of the spec's "typical" Huffman constants is needed — the
DHT segments carry exactly what the entropy coder used.

Everything entropy-coded runs in tight scalar Python (sequential by
nature); everything blockwise (DCT/IDCT, dequant, upsample, color
convert) is batched numpy over all blocks at once.  At crawl scale these
kernels run inside Arrow-batched ``mapInPandas`` workers — per-image cost
is what matters, and the numpy half dominates for megapixel images.

Reference behavior anchors: ``ImageAnalyser.java:92-143`` (dims +
payload analysis), ``FaceDetectionAnalyser.java:112-160`` (decode →
detect on the facedetection corpus).  Verified against ``javax.imageio``
(the JVM codec the reference's OpenIMAJ stack decodes with) in
``tests/test_jpeg.py``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg", "encode_jpeg", "jpeg_dims"]


class JpegError(ValueError):
    """Malformed or unsupported JPEG stream."""


# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

def _zigzag() -> np.ndarray:
    """Natural index for each zigzag position (generated, not transcribed)."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        diag = [(d - j, j) for j in rng]
        if d % 2 == 1:
            diag.reverse()  # odd diagonals run top-right -> bottom-left
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int32)


_ZZ = _zigzag()                      # zigzag pos -> natural index
_ZZ_LIST = [int(x) for x in _ZZ]     # scalar-loop friendly

# Annex K base quantization tables (natural order after de-zigzag; these
# are published spec constants, row-major as printed in the standard).
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return (c * 0.5).astype(np.float64)  # orthonormal: C @ C.T == I


_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over destuffed entropy bytes; reads past the end
    yield zero bits (the tail is encoder padding)."""

    __slots__ = ("d", "i", "n", "hold", "bits")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.n = len(d)
        self.hold = 0
        self.bits = 0

    def _fill(self) -> None:
        while self.bits <= 24:
            b = self.d[self.i] if self.i < self.n else 0
            self.i += 1
            self.hold = ((self.hold << 8) | b) & 0xFFFFFFFF
            self.bits += 8

    def peek16(self) -> int:
        if self.bits < 16:
            self._fill()
        return (self.hold >> (self.bits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.bits -= k

    def get(self, k: int) -> int:
        if k == 0:
            return 0
        if self.bits < k:
            self._fill()
        self.bits -= k
        return (self.hold >> self.bits) & ((1 << k) - 1)


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _HuffTable:
    """Canonical table from DHT (bits, values) → flat 16-bit prefix lookup."""

    __slots__ = ("lens", "vals")

    def __init__(self, counts: list[int], values: bytes):
        self.lens = [0] * 65536
        self.vals = [0] * 65536
        code = 0
        vi = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >= (1 << length):
                    raise JpegError("overfull Huffman table")
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                sym = values[vi]
                self.lens[lo:hi] = [length] * (hi - lo)
                self.vals[lo:hi] = [sym] * (hi - lo)
                vi += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        idx = br.peek16()
        length = self.lens[idx]
        if length == 0:
            raise JpegError("invalid Huffman code")
        br.skip(length)
        return self.vals[idx]


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_id", "ac_id",
                 "bw", "bh", "nbw", "nbh", "blocks")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_id = self.ac_id = 0
        self.blocks: list[list[int]] = []


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Destuff entropy-coded bytes starting at ``pos``; split at RSTn.
    Returns (segments, index of the 0xFF opening the terminating marker)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JFIF stream to (H, W, 3) uint8."""
    if data[:2] != b"\xFF\xD8":
        raise JpegError("missing SOI")
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    W = H = 0
    progressive = False
    restart_interval = 0
    mcus_x = mcus_y = hmax = vmax = 0
    frame_seen = False

    i = 2
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1  # spurious fill
            continue
        marker = data[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + ln]
        i += 2 + ln

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128], ">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64], np.uint8).astype(np.int32)
                    p += 64
                tab = np.empty(64, np.int32)
                tab[_ZZ] = vals  # DQT is in zigzag order
                qt[tq] = tab
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                nv = sum(counts)
                values = seg[p + 17:p + 17 + nv]
                p += 17 + nv
                tab = _HuffTable(counts, values)
                (ac_tables if tc else dc_tables)[th] = tab
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if frame_seen:
                raise JpegError("multiple frames")
            frame_seen = True
            progressive = marker == 0xC2
            prec, H, W, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 15, tq))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcus_x = -(-W // (8 * hmax))
            mcus_y = -(-H // (8 * vmax))
            for c in comps:
                c.bw = mcus_x * c.h
                c.bh = mcus_y * c.v
                c.nbw = -(-(-(-W * c.h // hmax)) // 8)
                c.nbh = -(-(-(-H * c.v // vmax)) // 8)
                c.blocks = [[0] * 64 for _ in range(c.bw * c.bh)]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                comp = next((c for c in comps if c.cid == cs), None)
                if comp is None:
                    raise JpegError("SOS references unknown component")
                comp.dc_id, comp.ac_id = tt >> 4, tt & 15
                scan_comps.append(comp)
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            ah, al = a >> 4, a & 15
            segs, i = _entropy_segments(data, i)
            _decode_scan(segs, scan_comps, dc_tables, ac_tables,
                         progressive, ss, se, ah, al,
                         restart_interval, mcus_x, mcus_y)
        # APPn / COM and anything else: skipped

    if not frame_seen:
        raise JpegError("no frame header")
    return _reconstruct(comps, qt, W, H, hmax, vmax)


def _decode_scan(segs, scan_comps, dc_tables, ac_tables, progressive,
                 ss, se, ah, al, restart_interval, mcus_x, mcus_y):
    interleaved = len(scan_comps) > 1
    if interleaved:
        total_mcus = mcus_x * mcus_y
    else:
        c = scan_comps[0]
        total_mcus = c.nbw * c.nbh
    per_seg = restart_interval or total_mcus
    mcu0 = 0
    for seg in segs:
        if mcu0 >= total_mcus:
            break
        br = _BitReader(seg)
        preds = {c.cid: 0 for c in scan_comps}
        count = min(per_seg, total_mcus - mcu0)
        if not progressive:
            _scan_baseline(br, scan_comps, dc_tables, ac_tables, preds,
                           interleaved, mcu0, count, mcus_x)
        else:
            _scan_progressive(br, scan_comps, dc_tables, ac_tables, preds,
                              interleaved, mcu0, count, mcus_x,
                              ss, se, ah, al)
        mcu0 += count


def _block_at(c: _Component, interleaved: bool, mcu: int, mcus_x: int,
              sub: int) -> list[int]:
    if interleaved:
        mx, my = mcu % mcus_x, mcu // mcus_x
        bi, bj = sub % c.h, sub // c.h
        by = my * c.v + bj
        bx = mx * c.h + bi
    else:
        by, bx = mcu // c.nbw, mcu % c.nbw
    return c.blocks[by * c.bw + bx]


def _scan_baseline(br, scan_comps, dc_tables, ac_tables, preds,
                   interleaved, mcu0, count, mcus_x):
    zz = _ZZ_LIST
    for m in range(mcu0, mcu0 + count):
        for c in scan_comps:
            dc = dc_tables[c.dc_id]
            ac = ac_tables[c.ac_id]
            nsub = c.h * c.v if interleaved else 1
            for sub in range(nsub):
                blk = _block_at(c, interleaved, m, mcus_x, sub)
                s = dc.decode(br)
                if s:
                    preds[c.cid] += _extend(br.get(s), s)
                blk[0] = preds[c.cid]
                k = 1
                while k < 64:
                    rs = ac.decode(br)
                    s = rs & 15
                    r = rs >> 4
                    if s == 0:
                        if r != 15:
                            break
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise JpegError("AC run past block end")
                    blk[zz[k]] = _extend(br.get(s), s)
                    k += 1


def _scan_progressive(br, scan_comps, dc_tables, ac_tables, preds,
                      interleaved, mcu0, count, mcus_x, ss, se, ah, al):
    """Spectral-selection + successive-approximation scans (T.81 G.1.2;
    the AC-refinement control flow mirrors the spec's flowcharts)."""
    zz = _ZZ_LIST
    if ss == 0:  # DC scan (always all components of the scan)
        for m in range(mcu0, mcu0 + count):
            for c in scan_comps:
                nsub = c.h * c.v if interleaved else 1
                for sub in range(nsub):
                    blk = _block_at(c, interleaved, m, mcus_x, sub)
                    if ah == 0:  # first pass
                        s = dc_tables[c.dc_id].decode(br)
                        if s:
                            preds[c.cid] += _extend(br.get(s), s)
                        blk[0] = preds[c.cid] << al
                    else:  # refinement: one bit
                        if br.get(1):
                            blk[0] |= 1 << al
        return

    # AC scans are always single-component (T.81 requires it)
    c = scan_comps[0]
    ac = ac_tables[c.ac_id]
    p1 = 1 << al
    m1 = -1 << al
    eobrun = 0
    for m in range(mcu0, mcu0 + count):
        blk = _block_at(c, False, m, mcus_x, 0)
        if ah == 0:  # first pass over this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = ac.decode(br)
                s = rs & 15
                r = rs >> 4
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.get(r)
                        break
                    k += 16
                    continue
                k += r
                if k > se:
                    raise JpegError("AC run past band end")
                blk[zz[k]] = _extend(br.get(s), s) << al
                k += 1
        else:  # refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = ac.decode(br)
                    s = rs & 15
                    r = rs >> 4
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.get(r)
                            break
                        newval = 0
                    else:
                        if s != 1:
                            raise JpegError("bad refinement symbol")
                        newval = p1 if br.get(1) else m1
                    while k <= se:
                        idx = zz[k]
                        v = blk[idx]
                        if v != 0:
                            if br.get(1) and (v & p1) == 0:
                                blk[idx] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                if newval:
                                    blk[idx] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    idx = zz[k]
                    v = blk[idx]
                    if v != 0:
                        if br.get(1) and (v & p1) == 0:
                            blk[idx] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1


def _reconstruct(comps, qt, W, H, hmax, vmax) -> np.ndarray:
    planes = []
    for c in comps:
        coef = np.array(c.blocks, dtype=np.float64)  # (bh*bw, 64)
        coef *= qt[c.tq][None, :].astype(np.float64)
        blocks = coef.reshape(-1, 8, 8)
        spatial = _C.T @ blocks @ _C  # batched IDCT
        spatial = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        ch = -(-H * c.v // vmax)
        cw = -(-W * c.h // hmax)
        plane = plane[:ch, :cw]
        if c.v != vmax or c.h != hmax:
            plane = np.repeat(np.repeat(plane, vmax // c.v, axis=0),
                              hmax // c.h, axis=1)
        planes.append(plane[:H, :W].astype(np.float64))
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes
    cb -= 128.0
    cr -= 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the SOF header only — no entropy decode
    (the reference's header-only fast path, ``ImageAnalyser.java:92-143``)."""
    if data[:2] != b"\xFF\xD8":
        return None
    i = 2
    n = len(data)
    while i < n - 3:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xFF, 0x01) or 0xD0 <= m <= 0xD9:
            i += 2
            continue
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, H, W = struct.unpack(">BHH", data[i + 4:i + 9])
            return W, H
        i += 2 + struct.unpack(">H", data[i + 2:i + 4])[0]
    return None


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, optimal Huffman)
# ---------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "hold", "bits")

    def __init__(self):
        self.out = bytearray()
        self.hold = 0
        self.bits = 0

    def put(self, code: int, length: int) -> None:
        self.hold = (self.hold << length) | code
        self.bits += length
        while self.bits >= 8:
            b = (self.hold >> (self.bits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
            self.bits -= 8
        self.hold &= (1 << self.bits) - 1

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.put((1 << pad) - 1, pad)  # pad with 1s


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _optimal_huff(freq: dict[int, int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Length-limited (≤16) canonical Huffman code from symbol frequencies.
    Returns (bits counts, value order, symbol -> (code, length)).  A dummy
    symbol forced to maximum depth reserves the all-ones code (T.81 C.2)."""
    import heapq

    DUMMY = 0x1000
    heap = []
    serial = 0
    for sym, f in freq.items():
        heap.append((f, 1, serial, (sym,)))  # tiebreak: real symbols after dummy
        serial += 1
    heap.append((1, 0, serial, (DUMMY,)))
    heapq.heapify(heap)
    depth: dict[int, int] = {}
    if len(heap) == 1:
        depth = {heap[0][3][0]: 1}
    else:
        while len(heap) > 1:
            f1, t1, _, s1 = heapq.heappop(heap)
            f2, t2, _, s2 = heapq.heappop(heap)
            serial += 1
            for s in s1 + s2:
                depth[s] = depth.get(s, 0) + 1
            heapq.heappush(heap, (f1 + f2, max(t1, t2), serial, s1 + s2))
    bits = [0] * 33
    for s, d in depth.items():
        bits[min(d, 32)] += 1
    # length-limit to 16 (libjpeg-style pair adjustment, public algorithm)
    for length in range(32, 16, -1):
        while bits[length]:
            j = length - 2
            while bits[j] == 0:
                j -= 1
            bits[length] -= 2
            bits[length - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # order symbols by (depth, value); dummy forced last within max depth
    maxd = max(depth.values())
    ordered = sorted((s for s in depth), key=lambda s: (min(depth[s], 32), s == DUMMY, s))
    # reassign limited lengths in order
    lengths: dict[int, int] = {}
    li = 1
    remaining = bits[li]
    for s in ordered:
        while remaining == 0:
            li += 1
            remaining = bits[li]
        lengths[s] = li
        remaining -= 1
    # canonical code assignment
    code = 0
    codes: dict[int, tuple[int, int]] = {}
    counts = [0] * 16
    values: list[int] = []
    prev_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s == DUMMY, s)):
        length = lengths[s]
        code <<= (length - prev_len)
        prev_len = length
        if s != DUMMY:
            codes[s] = (code, length)
            counts[length - 1] += 1
            values.append(s)
        code += 1
    return counts, values, codes


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JFIF encode of an (H, W, 3) uint8 array, 4:4:4 sampling,
    per-image optimal Huffman tables."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise JpegError("expected (H, W, 3) RGB")
    H, W = rgb.shape[:2]
    if not (0 < H <= 65535 and 0 < W <= 65535):
        raise JpegError("bad dimensions")
    f = rgb.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128.0

    qly = _scale_qtable(_Q_LUMA, quality)
    qlc = _scale_qtable(_Q_CHROMA, quality)

    bh, bw = -(-H // 8), -(-W // 8)
    ph, pw = bh * 8, bw * 8

    def to_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        padded = np.pad(plane, ((0, ph - H), (0, pw - W)), mode="edge")
        blocks = (
            padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coef = _C @ (blocks - 128.0) @ _C.T
        qz = np.round(coef.reshape(-1, 64) / q[None, :].astype(np.float64))
        return qz.astype(np.int32)[:, _ZZ]  # zigzag order per block

    planes = [(y, qly, 0), (cb, qlc, 1), (cr, qlc, 1)]
    zz_blocks = [to_blocks(p, q) for p, q, _ in planes]

    # Pass 1: symbol frequencies (two Huffman pairs: luma / chroma)
    dc_freq = [{}, {}]
    ac_freq = [{}, {}]
    for ci, (_, _, tid) in enumerate(planes):
        prev = 0
        dcf, acf = dc_freq[tid], ac_freq[tid]
        for row in zz_blocks[ci]:
            lst = row.tolist()
            diff = lst[0] - prev
            prev = lst[0]
            s = _csize(diff)
            dcf[s] = dcf.get(s, 0) + 1
            run = 0
            last_nz = 0
            for k in range(63, 0, -1):
                if lst[k]:
                    last_nz = k
                    break
            for k in range(1, last_nz + 1):
                v = lst[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    acf[0xF0] = acf.get(0xF0, 0) + 1
                    run -= 16
                sym = (run << 4) | _csize(v)
                acf[sym] = acf.get(sym, 0) + 1
                run = 0
            if last_nz != 63:
                acf[0x00] = acf.get(0x00, 0) + 1

    tables = []
    for tid in (0, 1):
        if not dc_freq[tid]:
            dc_freq[tid][0] = 1
        if not ac_freq[tid]:
            ac_freq[tid][0] = 1
        tables.append((_optimal_huff(dc_freq[tid]), _optimal_huff(ac_freq[tid])))

    # Pass 2: emit
    bwr = _BitWriter()
    prevs = [0, 0, 0]
    # 4:4:4 → MCU = one block of each component, same grid
    nblocks = bh * bw
    dc_codes = [tables[tid][0][2] for _, _, tid in planes]
    ac_codes = [tables[tid][1][2] for _, _, tid in planes]
    rows_per_comp = [zz_blocks[ci] for ci in range(3)]
    for b in range(nblocks):
        for ci in range(3):
            lst = rows_per_comp[ci][b].tolist()
            dcc = dc_codes[ci]
            acc = ac_codes[ci]
            diff = lst[0] - prevs[ci]
            prevs[ci] = lst[0]
            s = _csize(diff)
            code, length = dcc[s]
            bwr.put(code, length)
            if s:
                bwr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = 0
            for k in range(63, 0, -1):
                if lst[k]:
                    last_nz = k
                    break
            for k in range(1, last_nz + 1):
                v = lst[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = acc[0xF0]
                    bwr.put(code, length)
                    run -= 16
                s = _csize(v)
                code, length = acc[(run << 4) | s]
                bwr.put(code, length)
                bwr.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz != 63:
                code, length = acc[0x00]
                bwr.put(code, length)
    bwr.flush()

    out = bytearray(b"\xFF\xD8")
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01"
            + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq, q in ((0, qly), (1, qlc)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tq) + bytes(int(q[z]) for z in _ZZ)
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, H, W, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BBB", cid, 0x11, tq)  # h=v=1 (4:4:4)
    for tid in (0, 1):
        for tc, (counts, values, _) in ((0, tables[tid][0]), (1, tables[tid][1])):
            out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values), (tc << 4) | tid)
            out += bytes(counts) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tid in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack("BB", cid, (tid << 4) | tid)
    out += struct.pack("BBB", 0, 63, 0)
    out += bwr.out
    out += b"\xFF\xD9"
    return bytes(out)
