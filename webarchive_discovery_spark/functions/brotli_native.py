"""ctypes binding to a system ``libbrotlidec`` shared library.

Middle tier of the Brotli ladder in ``sources.warc._decompress_payload``:

1. native ``brotli`` Python wheel (fastest, preferred when importable),
2. **this module** — the C decoder library loaded via ctypes when one is
   installed anywhere conventional (distro ``ldconfig`` path, a conda
   prefix, or ``$BROTLI_LIB`` pointing straight at the ``.so``/
   ``.dylib``),
3. the vendored pure-Python subset (``brotli_lite``, uncompressed
   metablocks only).

Tiers 1–2 decode *any* RFC 7932 stream, including compressed metablocks
with static-dictionary references — the encoding real servers emit — so
the reference's compression-matrix golden
(``warc-indexer/src/test/java/uk/bl/wa/indexer/WARCIndexerTest.java:248-288``)
can run against its actual brotli fixture rather than the framed subset.

Uses the streaming API (``BrotliDecoderDecompressStream``) rather than the
one-shot call so output sizing needs no a-priori bound; per-call state is
created and destroyed inside :func:`decompress`, so the function is
thread-safe under Arrow UDF worker threads.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import sys
from typing import Optional

__all__ = ["available", "decompress", "BrotliNativeError"]


class BrotliNativeError(ValueError):
    """Stream rejected by the native decoder (corrupt or truncated)."""


# BrotliDecoderResult (decode.h)
_RESULT_ERROR = 0
_RESULT_SUCCESS = 1
_RESULT_NEEDS_MORE_INPUT = 2
_RESULT_NEEDS_MORE_OUTPUT = 3

_CHUNK = 1 << 18  # 256 KiB output chunks


def _candidate_paths() -> list[str]:
    names = []
    env = os.environ.get("BROTLI_LIB")
    if env:
        names.append(env)
    found = ctypes.util.find_library("brotlidec")
    if found:
        names.append(found)
    suffix = ".dylib" if sys.platform == "darwin" else ".so"
    bases = [f"libbrotlidec{suffix}.1", f"libbrotlidec{suffix}"]
    names.extend(bases)
    # conda-style prefixes aren't on the loader path; probe the usual spots
    prefixes = [
        os.environ.get("CONDA_PREFIX"),
        sys.prefix,
        os.path.expanduser("~/miniconda"),
        os.path.expanduser("~/miniconda3"),
        os.path.expanduser("~/anaconda3"),
        "/opt/conda",
        "/usr/local",
    ]
    for p in prefixes:
        if p:
            for base in bases:
                names.append(os.path.join(p, "lib", base))
    return names


_lib: Optional[ctypes.CDLL] = None
_probed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _probed
    if _probed:
        return _lib
    _probed = True
    for path in _candidate_paths():
        try:
            lib = ctypes.CDLL(path)
            lib.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
            lib.BrotliDecoderCreateInstance.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
            lib.BrotliDecoderDecompressStream.restype = ctypes.c_int
            lib.BrotliDecoderDecompressStream.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_size_t),
            ]
            _lib = lib
            return _lib
        except (OSError, AttributeError):
            continue
    return None


def available() -> bool:
    """True when a loadable ``libbrotlidec`` was found on this host."""
    return _load() is not None


def decompress(data: bytes) -> bytes:
    """Decode a complete Brotli stream; raises :class:`BrotliNativeError`
    on corrupt input or when no library is available."""
    lib = _load()
    if lib is None:
        raise BrotliNativeError("no libbrotlidec available")
    state = lib.BrotliDecoderCreateInstance(None, None, None)
    if not state:
        raise BrotliNativeError("BrotliDecoderCreateInstance failed")
    try:
        in_buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
        avail_in = ctypes.c_size_t(len(data))
        next_in = ctypes.cast(in_buf, ctypes.POINTER(ctypes.c_ubyte))
        out: list[bytes] = []
        while True:
            out_buf = (ctypes.c_ubyte * _CHUNK)()
            avail_out = ctypes.c_size_t(_CHUNK)
            next_out = ctypes.cast(out_buf, ctypes.POINTER(ctypes.c_ubyte))
            res = lib.BrotliDecoderDecompressStream(
                state, ctypes.byref(avail_in), ctypes.byref(next_in),
                ctypes.byref(avail_out), ctypes.byref(next_out), None)
            out.append(bytes(out_buf[: _CHUNK - avail_out.value]))
            if res == _RESULT_SUCCESS:
                return b"".join(out)
            if res == _RESULT_NEEDS_MORE_OUTPUT:
                continue
            if res == _RESULT_NEEDS_MORE_INPUT:
                raise BrotliNativeError("truncated brotli stream")
            raise BrotliNativeError("corrupt brotli stream")
    finally:
        lib.BrotliDecoderDestroyInstance(state)
