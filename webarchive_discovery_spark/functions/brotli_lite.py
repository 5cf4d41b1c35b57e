"""Minimal RFC 7932 (Brotli) stream support — the vendored fallback behind
``sources.warc._decompress_payload`` when no native ``brotli`` module is
installed (this container has none).

Scope, stated honestly:

- **Decoder**: full stream-header and metablock-header grammar (WBITS
  window codes, ISLAST/ISLASTEMPTY, MNIBBLES incl. the 0-nibble metadata
  escape, MSKIPBYTES) and complete support for UNCOMPRESSED metablocks —
  which are 100% legal Brotli streams (RFC 7932 §9.1: any input can be
  framed this way, at ~+0.06% size).  COMPRESSED metablocks raise
  ``BrotliUnsupported``: implementing the prefix-code/context-map path
  without a local encoder to generate verification vectors would ship
  untestable code, and the 120 KB static dictionary is not embeddable from
  memory.  Callers treat ``BrotliUnsupported`` exactly like a missing
  codec (payload left as served) — the same honest gate the import-try
  used, but with the fully-framed subset actually decoded.
- **Encoder**: deterministic uncompressed-metablock framing
  (:func:`compress_uncompressed`) so the reference's compression-matrix
  golden (``WARCIndexerTest.java:248-288``: none/gzip/brotli × warc/
  warc.gz must all yield the sentinel phrase) runs end-to-end on real
  Brotli bytes.

A real deployment drops in the native ``brotli`` wheel, which is preferred
automatically when importable.
"""

from __future__ import annotations

__all__ = ["BrotliError", "BrotliUnsupported", "decompress", "compress_uncompressed"]

_MAX_OUT = 1 << 31  # sanity cap: a WARC payload should never exceed 2 GiB


class BrotliError(ValueError):
    """Malformed Brotli stream."""


class BrotliUnsupported(BrotliError):
    """Valid-looking stream uses features outside the vendored subset."""


class _Bits:
    """LSB-first bit reader over bytes (RFC 7932 §2)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise BrotliError("truncated stream")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out

    def align_byte(self) -> None:
        pad = (-self.pos) % 8
        if pad and self.read(pad) != 0:
            raise BrotliError("non-zero padding bits")

    def read_bytes(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise BrotliError("truncated uncompressed block")
        self.pos += 8 * n
        return self.data[start:start + n]


def _read_wbits(b: _Bits) -> int:
    """Stream-header window size (RFC 7932 §9.1 WBITS code table)."""
    if b.read(1) == 0:
        return 16
    n = b.read(3)
    if n != 0:
        return 17 + n
    n = b.read(3)
    if n == 0:
        return 17
    if n == 1:
        raise BrotliError("reserved WBITS code")
    return 8 + n


def decompress(data: bytes) -> bytes:
    """Decode a Brotli stream composed of uncompressed/metadata/empty
    metablocks.  Raises :class:`BrotliUnsupported` on compressed
    metablocks, :class:`BrotliError` on malformed framing."""
    b = _Bits(data)
    _read_wbits(b)
    out = bytearray()
    while True:
        islast = b.read(1)
        if islast and b.read(1):  # ISLASTEMPTY
            break
        mnibbles = b.read(2)
        if mnibbles == 3:  # metadata metablock (RFC 7932 §9.2)
            if b.read(1):
                raise BrotliError("reserved bit set in metadata block")
            mskipbytes = b.read(2)
            skip = b.read(8 * mskipbytes)
            b.align_byte()
            b.read_bytes(skip + 1 if mskipbytes else 0)
            if islast:
                break
            continue
        mlen = b.read(16 + 4 * mnibbles) + 1
        if mlen > _MAX_OUT - len(out):
            raise BrotliError("output too large")
        if not islast and b.read(1):  # ISUNCOMPRESSED
            b.align_byte()
            out += b.read_bytes(mlen)
            continue
        # a data-carrying LAST metablock, or ISUNCOMPRESSED = 0: compressed
        raise BrotliUnsupported(
            "compressed Brotli metablock — vendored subset decodes "
            "uncompressed metablocks only; install the native 'brotli' "
            "module for full streams"
        )
    return bytes(out)


def compress_uncompressed(data: bytes, chunk: int = 1 << 20) -> bytes:
    """Frame ``data`` as a valid Brotli stream of uncompressed metablocks
    (deterministic; ≤ ``chunk`` bytes per metablock, max 2^24 − 1).  Any
    conformant Brotli decoder inflates it back to ``data``."""
    if not 0 < chunk <= (1 << 24) - 1:
        raise ValueError("chunk must be in [1, 2^24 - 1]")
    bits = bytearray()
    nbits = 0

    def put(value: int, width: int) -> None:
        nonlocal nbits
        for i in range(width):
            if nbits % 8 == 0:
                bits.append(0)
            if (value >> i) & 1:
                bits[-1] |= 1 << (nbits % 8)
            nbits += 1

    put(0, 1)  # WBITS code for 16-bit window: single 0 bit
    if not data:
        put(1, 1)  # ISLAST
        put(1, 1)  # ISLASTEMPTY
        return bytes(bits)
    for off in range(0, len(data), chunk):
        piece = data[off:off + chunk]
        put(0, 1)  # ISLAST = 0 (uncompressed blocks require it)
        mlen = len(piece) - 1
        mnibbles = 4 if mlen < (1 << 16) else (5 if mlen < (1 << 20) else 6)
        put(mnibbles - 4, 2)
        put(mlen, 4 * mnibbles)
        put(1, 1)  # ISUNCOMPRESSED
        put(0, (-nbits) % 8)  # byte-align
        bits.extend(piece)
        nbits = 8 * len(bits)
    put(1, 1)  # final empty metablock: ISLAST + ISLASTEMPTY
    put(1, 1)
    return bytes(bits)
