"""Context-triggered piecewise hashing (ssdeep-style fuzzy hash).

Re-implementation of the published CTPH scheme (Kornblum 2006, "Identifying
almost identical files using context triggered piecewise hashing") used by
the reference's ``FuzzyHashAnalyser.java:62-88`` (java-ssdeep): a 7-byte
rolling hash triggers piece boundaries whenever ``rolling % blocksize ==
blocksize - 1``; each piece contributes one base64 character derived from a
hash of the piece; the signature is ``(blocksize, sig, sig2)`` where
``sig2`` is computed at ``2×blocksize`` (for cross-blocksize comparison).
Text is whitespace-collapsed and lowercased first, exactly like the
reference analyser (``FuzzyHashAnalyser.java:65-68``).

Implementation is FULLY VECTORIZED numpy (no per-byte Python):

- ssdeep's 3-component rolling hash depends only on the last 7 bytes, so
  h1/h2 are 7-tap convolutions and h3 is an XOR of 5-bit-shifted lags;
- piece hashes use a modular polynomial hash computed from prefix arrays
  (odd base ⇒ invertible mod 2^64), so any (start, end] piece hashes in
  O(1) after one cumulative pass — both block sizes share the same pass.

Signatures are ~64 chars; downstream similarity joins use n-gram overlap of
signatures (the common-substring prefilter of ssdeep's compare).
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["ctph", "ctph_similarity", "canonical_text", "MIN_BLOCKSIZE", "SPAMSUM_LENGTH"]

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
MIN_BLOCKSIZE = 3
SPAMSUM_LENGTH = 64
_WS = re.compile(r"\s+")

_MASK32 = np.uint64(0xFFFFFFFF)
_POLY_BASE = np.uint64(0x100000001B3)  # odd ⇒ invertible mod 2^64
_POLY_BASE_INV = np.uint64(pow(0x100000001B3, -1, 2**64))
_ROLL_WINDOW = 7


def canonical_text(text: str) -> bytes:
    """Whitespace-collapse + lowercase, as the reference analyser does."""
    return _WS.sub(" ", text).lower().strip().encode("utf-8")


def _rolling(c: np.ndarray) -> np.ndarray:
    """ssdeep rolling hash value after each byte — h1 (7-sum) + h2 (weighted
    7-sum, newest byte weight 7) + h3 (xor of 5-bit-shifted last 7 bytes),
    each mod 2^32."""
    n = len(c)
    cw = c.astype(np.uint64)
    h1 = np.convolve(cw, np.ones(_ROLL_WINDOW, dtype=np.uint64))[:n]
    h2 = np.convolve(cw, np.arange(_ROLL_WINDOW, 0, -1, dtype=np.uint64))[:n]
    h3 = np.zeros(n, dtype=np.uint64)
    for k in range(_ROLL_WINDOW):
        shifted = (cw << np.uint64(5 * k)) & _MASK32
        h3[k:] ^= shifted[: n - k] if k else shifted
    return (h1 + h2 + h3) & _MASK32


def _piece_chars(prefix: np.ndarray, base_inv_pow: np.ndarray,
                 bounds: np.ndarray, n: int) -> str:
    """One base64 char per piece (start, end] via the polynomial prefix."""
    starts = np.concatenate(([0], bounds + 1))
    ends = np.concatenate((bounds + 1, [n]))
    keep = ends > starts
    starts, ends = starts[keep][: SPAMSUM_LENGTH], ends[keep][: SPAMSUM_LENGTH]
    h = (prefix[ends] - prefix[starts]) * base_inv_pow[starts]
    mixed = (h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
    return "".join(_B64[int(v)] for v in mixed)


def _pick_blocksize(n: int) -> int:
    bs = MIN_BLOCKSIZE
    while bs * SPAMSUM_LENGTH < n:
        bs *= 2
    return bs


def ctph(text: str, block_size: int | None = None) -> tuple[int, str, str]:
    """Fuzzy-hash a text → ``(blocksize, sig, sig2)``; the Solr fields are
    ``ssdeep_hash_bs_<blocksize>`` = sig and ``ssdeep_hash_bs_<2×>`` = sig2
    (``FuzzyHashAnalyser.java:76-78``)."""
    data = canonical_text(text)
    bs = block_size or _pick_blocksize(len(data))
    if not data:
        return bs, "", ""
    c = np.frombuffer(data, dtype=np.uint8)
    n = len(c)
    roll = _rolling(c)
    # polynomial prefix: P[i] = sum_{t<i} c_t * base^t (mod 2^64)
    with np.errstate(over="ignore"):
        base_pow = np.empty(n, dtype=np.uint64)
        base_pow[0] = 1
        if n > 1:
            base_pow[1:] = np.cumprod(np.full(n - 1, _POLY_BASE, dtype=np.uint64))
        prefix = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum((c.astype(np.uint64) + np.uint64(1)) * base_pow, out=prefix[1:])
        inv_pow = np.empty(n, dtype=np.uint64)
        inv_pow[0] = 1
        if n > 1:
            inv_pow[1:] = np.cumprod(np.full(n - 1, _POLY_BASE_INV, dtype=np.uint64))
    # Kornblum's adaptive loop: if the signature comes out too short (the
    # input's 7-gram diversity starves the trigger at this blocksize), halve
    # the blocksize and retry — prefix/rolling arrays are reused, so each
    # retry is one vectorized compare
    while True:
        sig = _piece_chars(
            prefix, inv_pow, np.nonzero(roll % np.uint64(bs) == np.uint64(bs - 1))[0], n
        )
        if (
            block_size is not None
            or bs <= MIN_BLOCKSIZE
            or len(sig) >= SPAMSUM_LENGTH // 2
        ):
            break
        bs //= 2
    sig2 = _piece_chars(
        prefix, inv_pow, np.nonzero(roll % np.uint64(2 * bs) == np.uint64(2 * bs - 1))[0], n
    )
    return bs, sig, sig2


def ctph_similarity(sig_a: str, sig_b: str, n: int = 3) -> float:
    """Signature similarity in [0, 1]: n-gram Jaccard over the signature
    strings — the common-substring prefilter of ssdeep's compare (the full
    weighted edit distance adds little for dedup candidate generation)."""
    if not sig_a or not sig_b:
        return 0.0
    ga = {sig_a[i:i + n] for i in range(max(1, len(sig_a) - n + 1))}
    gb = {sig_b[i:i + n] for i in range(max(1, len(sig_b) - n + 1))}
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter) if inter else 0.0
