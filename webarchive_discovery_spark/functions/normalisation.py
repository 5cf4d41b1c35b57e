"""URL / host canonicalization kernels.

Pure-Python re-implementations of the *semantics* of the reference's
normalisation layer (ukwa/webarchive-discovery,
``warc-indexer/src/main/java/uk/bl/wa/util/Normalisation.java:136-275`` and
openwayback's ``AggressiveUrlCanonicalizer``), validated against the golden
corpus ported from ``NormalisationTest.java:33-248``.

These kernels are deliberately written as vectorizable pure functions: the
Spark layer wraps them in Arrow-batched pandas UDFs
(:mod:`webarchive_discovery_spark.functions.udfs`) so the hot path is
amortized per Arrow batch, never per-row Python inside a JVM loop.
"""

from __future__ import annotations

import base64
import hashlib
import re
from urllib.parse import urljoin

__all__ = [
    "aggressive_canonicalize",
    "canonicalise_url",
    "canonicalise_host",
    "fix_url_errors",
    "resolve_relative",
    "sanitise_warc_header_value",
    "sha1_hash_as_base32",
    "url_to_key",
]

# ---------------------------------------------------------------------------
# Step 1: wayback-style aggressive canonicalization
# (semantics of org.archive.wayback.util.url.AggressiveUrlCanonicalizer,
#  reconstructed from behavior/bytecode of the vendored wayback-core jar)
# ---------------------------------------------------------------------------

# (chooser substring, anchored stripper pattern with one capture group to
#  delete).  The chooser is a cheap substring guard; the string is already
#  lower-cased when these run.
_STRIP_RULES: list[tuple[str, re.Pattern[str]]] = [
    ("@", re.compile(r"^(?:(?:(?:https?)|(?:ftps?))://)([^/]+@)(?:.*)$", re.I | re.S)),
    ("/www", re.compile(r"^(?:https?://)(www[0-9]*\.)(?:[^/]*/.+)$", re.I | re.S)),
    ("phpsessid=", re.compile(r"^(?:.+)(phpsessid=[0-9a-zA-Z]{32}&?)(?:(?:.*))?$", re.I | re.S)),
    ("jsessionid=", re.compile(r"^.*(jsessionid=[0-9a-zA-Z]{32}&?).*$", re.I | re.S)),
    ("aspsessionid", re.compile(r"^(?:.+)(ASPSESSIONID[a-zA-Z]{8}=[a-zA-Z]{24}&?)(?:(?:.*))?$", re.I | re.S)),
    (".aspx", re.compile(r".*/(\([0-9a-z]{24}\)/)(?:[^\?]+\.aspx.*)$", re.I | re.S)),
    (".aspx", re.compile(r".*/(\((?:[a-z]\([0-9a-z]{24}\))+\)/)[^\?]+\.aspx.*$", re.I | re.S)),
    ("sid=", re.compile(r"^(?:.+)(sid=[0-9a-zA-Z]{32}&?)(?:(?:.*))?$", re.I | re.S)),
    ("cftoken=", re.compile(r".+(cfid=[^&]+&cftoken=[^&]+(?:&jsessionid=[^&]+)?&?).*$", re.I | re.S)),
]


def aggressive_canonicalize(url: str | None) -> str | None:
    """Lower-case, strip user-info / session-ids / leading ``www`` (when a
    path is present), and tidy dangling ``?`` / ``&`` query leftovers."""
    if url is None or len(url) == 0:
        return url
    url = url.lower()
    for chooser, pat in _STRIP_RULES:
        if chooser in url:
            m = pat.fullmatch(url)
            if m:
                url = url[: m.start(1)] + url[m.end(1):]
    q = url.rfind("?")
    if q > 0:
        if q == len(url) - 1:
            url = url[:-1]
        elif url[q + 1] == "&":
            if len(url) == q + 2:
                url = url[: len(url) - 2]
            else:
                url = url[: q + 1] + url[q + 2:]
        elif url[-1] == "&":
            url = url[:-1]
    return url


# ---------------------------------------------------------------------------
# Steps 2-5: multi-step canonicalization (Normalisation.canonicaliseURL)
# ---------------------------------------------------------------------------

_WWW_PREFIX = re.compile(r"([a-z]+://)(?:www[0-9]*|ww2|ww)[.](.+)", re.S)
_DOMAIN_ONLY = re.compile(r"https?://[^/]+")

_HEX_DIGITS = b"0123456789abcdefABCDEF"


def _is_hex(b: int) -> bool:
    return b in _HEX_DIGITS


def _fix_escape_errors_and_unescape_high_order(url: str) -> bytes:
    """Repair faulty %-escapes (escape the stray ``%``) and convert
    high-order (non-ASCII) %XX escapes into raw UTF-8 bytes."""
    utf8 = url.encode("utf-8")
    out = bytearray()
    i = 0
    n = len(utf8)
    while i < n:
        c = utf8[i]
        if c == 0x25:  # '%'
            if i < n - 2 and _is_hex(utf8[i + 1]) and _is_hex(utf8[i + 2]):
                u = int(chr(utf8[i + 1]) + chr(utf8[i + 2]), 16)
                if u & 0x80 == 0:  # ASCII escape: keep as-is
                    out += b"%" + bytes([utf8[i + 1], utf8[i + 2]])
                else:  # high-order: emit raw byte
                    out.append(u & 0xFF)
                i += 3
            else:  # faulty escape: escape the '%' itself, reprocess the rest
                out += b"%25"
                i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


def _must_escape(cp: int) -> bool:
    return cp == 0x20 or cp == 0x25 or cp == 0x5C  # space, '%', '\\'


def _keep_escape(cp: int) -> bool:
    return cp == 0x23  # '#'


def _hex_escape(cp: int, out: bytearray) -> None:
    out += b"%" + format(cp, "02x").encode("ascii")


def _escape_utf8(utf8: bytes, escape_high_order: bool, normalise_low_order: bool) -> str:
    """Re-escape a repaired UTF-8 byte string.  Space→``+`` inside the query
    section; 2-byte UTF-8 kept raw when high-order is allowed; 3/4-byte
    sequences always escaped; invalid sequences byte-escaped."""
    out = bytearray()
    i = 0
    n = len(utf8)
    param_section = False
    while i < n:
        c = utf8[i]
        param_section = param_section or c == 0x3F  # '?'
        if param_section and c == 0x20:
            out.append(0x2B)  # '+'
        elif c == 0x25:  # '%' — guaranteed followed by 2 hex after the fix pass
            cp = int(chr(utf8[i + 1]) + chr(utf8[i + 2]), 16)
            if param_section and cp == 0x20:
                out.append(0x2B)
            elif _must_escape(cp) or _keep_escape(cp) or not normalise_low_order:
                _hex_escape(cp, out)
            else:
                out.append(cp)
            i += 2
        elif c & 0x80 == 0:  # ASCII
            if _must_escape(c):
                _hex_escape(c, out)
            else:
                out.append(c)
        elif c & 0xC0 == 0x80:  # continuation byte in first position
            _hex_escape(c, out)
        elif c & 0xE0 == 0xC0:  # 2-byte UTF-8
            if i >= n - 1 or utf8[i + 1] & 0xC0 != 0x80:
                _hex_escape(c, out)
            elif escape_high_order:
                _hex_escape(utf8[i], out)
                i += 1
                _hex_escape(utf8[i], out)
            else:
                out.append(utf8[i])
                i += 1
                out.append(utf8[i])
        elif c & 0xF0 == 0xE0:  # 3-byte UTF-8 — always escaped
            if i >= n - 2 or utf8[i + 1] & 0xC0 != 0x80 or utf8[i + 2] & 0xC0 != 0x80:
                _hex_escape(c, out)
            else:
                _hex_escape(utf8[i], out)
                i += 1
                _hex_escape(utf8[i], out)
                i += 1
                _hex_escape(utf8[i], out)
        elif c & 0xF8 == 0xF0:  # 4-byte UTF-8 — always escaped
            if (
                i >= n - 3
                or utf8[i + 1] & 0xC0 != 0x80
                or utf8[i + 2] & 0xC0 != 0x80
                or utf8[i + 3] & 0xC0 != 0x80
            ):
                _hex_escape(c, out)
            else:
                for _ in range(3):
                    _hex_escape(utf8[i], out)
                    i += 1
                _hex_escape(utf8[i], out)
        else:  # illegal first byte
            _hex_escape(c, out)
        i += 1
    return out.decode("utf-8")


def canonicalise_url(
    url: str,
    allow_high_order: bool = True,
    create_unambiguous: bool = True,
) -> str:
    """Multi-step URL canonicalization matching the reference semantics
    (``Normalisation.canonicaliseURL``, golden corpus
    ``NormalisationTest.java:103-220``): wayback aggressive canonicalization,
    ``https``→``http``, optional ``www``-prefix strip, %-escape repair and
    normalization, trailing-slash strip (domain-only URLs keep exactly one
    ``/``)."""
    url = aggressive_canonicalize(url)
    if url is None:
        return url
    if url.startswith("https://"):
        url = "http://" + url[8:]
    if create_unambiguous:
        m = _WWW_PREFIX.fullmatch(url)
        if m:
            url = m.group(1) + m.group(2)
    # Identity fast path (r6): for a pure-ASCII URL containing no '%', space
    # or backslash, the repair pass copies every byte unchanged (nothing to
    # unescape) and the re-escape pass appends every byte unchanged (no
    # must-escape characters, no escapes to normalize, '?'/space interaction
    # impossible without spaces) — under EVERY flag combination.  That is
    # the overwhelmingly common case, and it skips two per-byte Python
    # walks; non-conforming URLs take the exact original path.
    if not (url.isascii() and "%" not in url and " " not in url
            and "\\" not in url):
        url_bytes = _fix_escape_errors_and_unescape_high_order(url)
        url = _escape_utf8(
            url_bytes,
            escape_high_order=not allow_high_order,
            normalise_low_order=create_unambiguous,
        )
    while url.endswith("/"):
        url = url[:-1]
    if _DOMAIN_ONLY.fullmatch(url):
        url += "/"
    return url


def fix_url_errors(url: str) -> str:
    """Only repair faulty escapes (``canonicaliseURL(url, false, false)``)."""
    return canonicalise_url(url, allow_high_order=False, create_unambiguous=False)


def resolve_relative(url: str, relative: str, normalise: bool = True) -> str:
    """Resolve ``relative`` against base ``url``; optionally canonicalise
    (``Normalisation.resolveRelative``, goldens ``NormalisationTest.java:69-91``)."""
    try:
        resolved = urljoin(url, relative)
    except Exception as exc:  # pragma: no cover - urljoin rarely raises
        raise ValueError(f"Unable to resolve {relative!r} relative to {url!r}") from exc
    return canonicalise_url(resolved) if normalise else resolved


# ---------------------------------------------------------------------------
# Host canonicalization (Normalisation.canonicaliseHost → urlStringToKey)
# ---------------------------------------------------------------------------

_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://")
_WWWN_HOST = re.compile(r"^www[0-9]*\.")


def url_to_key(url: str) -> str:
    """Wayback ``urlStringToKey`` semantics (scheme-less, ``www``-less,
    default-port-less host + path [+ query])."""
    if url.startswith("dns:"):
        return url
    s = aggressive_canonicalize(url)
    m = _SCHEME_RE.match(s)
    scheme = m.group(0) if m else "http://"
    if m:
        s = s[len(scheme):]
    if "/" not in s:
        s = s + "/"
    # split authority / path+query
    slash = s.index("/")
    authority, rest = s[:slash], s[slash:]
    if "@" in authority:
        authority = authority.rsplit("@", 1)[1]
    port = ""
    if ":" in authority:
        authority, p = authority.rsplit(":", 1)
        default = {"http://": "80", "https://": "443", "ftp://": "21"}.get(scheme, "")
        if p and p != default:
            port = ":" + p
    host = _WWWN_HOST.sub("", authority)
    # path normalization: collapse //, %20 → +
    qpos = rest.find("?")
    path, query = (rest, "") if qpos < 0 else (rest[:qpos], rest[qpos:])
    path = path.replace("%20", "+")
    while "//" in path:
        path = path.replace("//", "/")
    return host + port + path + query


def canonicalise_host(host: str) -> str:
    """``Normalisation.canonicaliseHost`` — key form of a host with slashes
    removed (goldens ``NormalisationTest.java:223-237``)."""
    return url_to_key(host.strip()).replace("/", "")


# ---------------------------------------------------------------------------
# Misc scalar helpers
# ---------------------------------------------------------------------------


def sanitise_warc_header_value(value: str | None) -> str | None:
    """Strip one matched pair of encapsulating ``<`` ``>``
    (``Normalisation.sanitiseWARCHeaderValue``)."""
    if value is None:
        return None
    if value.startswith("<") and value.endswith(">"):
        return value[1:-1]
    return value


_SHA1_BASE32_PATTERN = re.compile(r"([sS][hH][aA]1:)([0-9A-Fa-f]{40})")


def sha1_hash_as_base32(hash_: str | None) -> str | None:
    """Normalize a base16 ``sha1:`` digest to the WARC de-facto base32 form
    (``Normalisation.sha1HashAsBase32``); anything else passes through."""
    if hash_ is None or len(hash_) != 45:
        return hash_
    m = _SHA1_BASE32_PATTERN.fullmatch(hash_)
    if not m:
        return hash_
    raw = bytes.fromhex(m.group(2))
    return m.group(1) + base64.b32encode(raw).decode("ascii")


def sha1_base32_digest(payload: bytes) -> str:
    """SHA-1 of a payload in base32 (WARC-Payload-Digest convention)."""
    return base64.b32encode(hashlib.sha1(payload).digest()).decode("ascii")
