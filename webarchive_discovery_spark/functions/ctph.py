"""Context-triggered piecewise hashing (ssdeep-style fuzzy hash).

Re-implementation of the published CTPH scheme (Kornblum 2006, "Identifying
almost identical files using context triggered piecewise hashing") used by
the reference's ``FuzzyHashAnalyser.java:62-88`` (java-ssdeep): a 7-byte
rolling hash triggers piece boundaries whenever ``rolling % blocksize ==
blocksize - 1``; each piece contributes one base64 character derived from an
FNV-1 hash of the piece; the signature is ``blocksize:sig:sig2`` where
``sig2`` is computed at ``2×blocksize`` (for cross-blocksize comparison).
Text is whitespace-collapsed and lowercased first, exactly like the
reference analyser (``FuzzyHashAnalyser.java:65-68``).

The kernel is per-row Python (a byte-walk, like the reference's native
implementation) wrapped in an Arrow-batched UDF; signatures are ~64 chars so
the similarity join downstream is cheap (n-gram overlap of signatures —
the standard ssdeep compare's common-substring prefilter).
"""

from __future__ import annotations

import re

__all__ = ["ctph", "ctph_similarity", "canonical_text", "MIN_BLOCKSIZE", "SPAMSUM_LENGTH"]

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
MIN_BLOCKSIZE = 3
SPAMSUM_LENGTH = 64
_WS = re.compile(r"\s+")

_FNV_PRIME = 0x01000193
_FNV_INIT = 0x28021967
_MASK32 = 0xFFFFFFFF


class _Roll:
    """ssdeep's 7-byte rolling hash (h1 sum, h2 weighted sum, h3 shift-xor)."""

    __slots__ = ("win", "h1", "h2", "h3", "n")
    SIZE = 7

    def __init__(self):
        self.win = [0] * self.SIZE
        self.h1 = self.h2 = self.h3 = 0
        self.n = 0

    def update(self, c: int) -> int:
        self.h2 = (self.h2 - self.h1 + self.SIZE * c) & _MASK32
        self.h1 = (self.h1 + c - self.win[self.n % self.SIZE]) & _MASK32
        self.win[self.n % self.SIZE] = c
        self.n += 1
        self.h3 = ((self.h3 << 5) ^ c) & _MASK32
        return (self.h1 + self.h2 + self.h3) & _MASK32


def canonical_text(text: str) -> bytes:
    """Whitespace-collapse + lowercase, as the reference analyser does."""
    return _WS.sub(" ", text).lower().strip().encode("utf-8")


def _signature_at(data: bytes, block_size: int) -> str:
    roll = _Roll()
    piece = _FNV_INIT
    out = []
    for b in data:
        piece = ((piece * _FNV_PRIME) ^ b) & _MASK32
        if roll.update(b) % block_size == block_size - 1:
            out.append(_B64[piece % 64])
            piece = _FNV_INIT
            if len(out) >= SPAMSUM_LENGTH - 1:
                break
    if piece != _FNV_INIT or not out:
        out.append(_B64[piece % 64])
    return "".join(out)


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
    return bs, _signature_at(data, bs), _signature_at(data, bs * 2)


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
