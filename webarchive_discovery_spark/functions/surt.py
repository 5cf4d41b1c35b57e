"""SURT keys, host-level expansion, and public/private suffix extraction.

Semantics from the reference's ``LinkExtractor``
(``warc-indexer/src/main/java/uk/bl/wa/extract/LinkExtractor.java:58-234``)
and ``SURT.toSURT`` usage (``WARCIndexer.java:619-625``), validated against
the host-SURT goldens in ``WARCIndexerTest.java:340-359``
(``archive.org → ["(org,", "(org,archive,"]``).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from .normalisation import canonicalise_url

__all__ = [
    "all_levels",
    "surt_key_from_canonical",
    "extract_host",
    "extract_public_suffix",
    "extract_private_suffix",
    "host_surts",
    "surt_key",
    "to_surt",
]

MALFORMED_HOST = "malformed.host"

# RFC-952-ish host validation as in LinkExtractor.extractHost
_VALID_HOST = re.compile(r"^[A-Za-z0-9._\-]+$")
_IPV4 = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")

# A compact public-suffix table (most common suffixes) — the reference uses
# Guava's full PSL; for engine purposes only multi-label suffixes need
# listing, single-label TLDs are the fallback.  The ``.uk`` family is
# special-cased exactly like LinkExtractor.java:129-136 (always 2-label
# public suffix under .uk).
_MULTI_SUFFIXES = {
    "co.uk", "org.uk", "ac.uk", "gov.uk", "sch.uk", "nhs.uk", "net.uk",
    "me.uk", "ltd.uk", "plc.uk", "mod.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz", "govt.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.za", "org.za", "net.za", "gov.za",
    "com.mx", "org.mx", "gob.mx",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.tw", "org.tw", "gov.tw",
    "com.sg", "org.sg", "gov.sg", "edu.sg",
    "co.il", "org.il", "gov.il", "ac.il",
    "com.ar", "org.ar", "gob.ar",
    "com.tr", "org.tr", "gov.tr",
    "co.id", "or.id", "go.id", "ac.id",
    "com.hk", "org.hk", "gov.hk", "edu.hk",
    "com.my", "org.my", "gov.my", "edu.my", "net.my",
    "com.ua", "org.ua", "gov.ua", "net.ua", "edu.ua", "in.ua",
    "com.pl", "org.pl", "gov.pl", "edu.pl", "net.pl",
    # JP organisational (JPRS second-level registrations)
    "ad.jp", "ed.jp", "gr.jp", "lg.jp",
    # Oceania / Asia
    "asn.au", "id.au", "ac.nz", "school.nz", "gen.nz", "geek.nz",
    "ac.cn", "edu.tw", "net.tw", "idv.tw", "net.hk", "idv.hk",
    "net.sg", "per.sg", "co.th", "or.th", "ac.th", "go.th", "in.th",
    "com.vn", "org.vn", "edu.vn", "gov.vn", "net.vn",
    "com.ph", "org.ph", "gov.ph", "edu.ph",
    "com.pk", "org.pk", "gov.pk", "edu.pk",
    "com.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd",
    "com.lk", "org.lk", "gov.lk", "edu.lk",
    "com.np", "org.np", "gov.np", "edu.np",
    "com.kz", "org.kz", "gov.kz", "edu.kz",
    "co.ir", "org.ir", "gov.ir", "ac.ir", "net.ir", "sch.ir",
    # Middle East / Africa
    "com.sa", "org.sa", "gov.sa", "edu.sa",
    "co.ae", "org.ae", "gov.ae", "ac.ae",
    "com.eg", "org.eg", "gov.eg", "edu.eg",
    "com.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "go.ke", "ac.ke",
    "ac.za", "edu.za", "web.za",
    # Americas
    "edu.br", "mil.br", "edu.ar", "net.ar", "edu.mx", "net.mx",
    "gob.cl", "com.co", "org.co", "edu.co", "gov.co", "net.co", "nom.co",
    "com.pe", "org.pe", "edu.pe", "gob.pe", "net.pe",
    "com.ve", "org.ve", "gob.ve", "edu.ve",
    "com.ec", "org.ec", "gob.ec", "edu.ec",
    "com.uy", "org.uy", "edu.uy", "gub.uy", "net.uy",
    "com.py", "org.py", "edu.py", "gov.py",
    "com.bo", "org.bo", "gob.bo", "edu.bo",
    "co.cr", "or.cr", "go.cr", "ac.cr",
    "com.gt", "org.gt", "gob.gt", "edu.gt",
    "com.do", "org.do", "gob.do", "edu.do",
    "on.ca", "qc.ca", "bc.ca", "ab.ca", "mb.ca", "ns.ca", "nb.ca",
    "sk.ca", "nl.ca", "pe.ca", "nt.ca", "nu.ca", "yt.ca", "gc.ca",
    # Europe
    "gouv.fr", "asso.fr", "com.fr", "nom.fr",
    "gov.it", "edu.it", "com.pt", "org.pt", "edu.pt", "gov.pt",
    "com.es", "org.es", "gob.es", "edu.es", "nom.es",
    "co.at", "or.at", "ac.at", "gv.at", "ac.be", "gov.ie",
    "co.hu", "org.hu", "info.hu", "com.ro", "org.ro",
    "edu.gr", "gov.gr", "net.gr", "org.gr", "com.gr",
    "com.by", "gov.by", "com.ge", "org.ge", "gov.ge", "edu.ge",
    "com.az", "org.az", "gov.az", "edu.az",
    "com.tr", "net.tr", "edu.tr", "k12.tr", "bel.tr", "av.tr",
    "net.il", "muni.il", "k12.il", "idf.il",
    "edu.in", "res.in", "gen.in", "firm.in", "ind.in",
    "ne.kr", "re.kr", "pe.kr",
}


def extract_host(url: str) -> str:
    """Host of a URL with RFC-952-style validation; ``malformed.host``
    sentinel on failure (``LinkExtractor.extractHost``)."""
    try:
        host = urlsplit(url).hostname
    except Exception:
        return MALFORMED_HOST
    if not host or not _VALID_HOST.match(host):
        return MALFORMED_HOST
    return host


def _is_ip(host: str) -> bool:
    return bool(_IPV4.match(host)) or host.replace(".", "").isdigit()


def extract_public_suffix(host: str | None) -> str | None:
    """Public suffix with the reference's ``.uk`` 2-label override
    (``LinkExtractor.extractPublicSuffixFromHost``)."""
    if not host:
        return None
    host = host.rstrip(".").lower()
    if _is_ip(host):
        return None
    parts = host.split(".")
    if len(parts) < 2:
        return None
    if host.endswith(".uk"):
        return ".".join(parts[-2:])
    last2 = ".".join(parts[-2:])
    if last2 in _MULTI_SUFFIXES:
        return last2
    return parts[-1]


def extract_private_suffix(host: str | None) -> str | None:
    """Registered (private) domain — public suffix + one label; ``.uk``
    forced to 3 labels (``LinkExtractor.extractPrivateSuffixFromHost``).
    Falls back to the host itself when no deeper label exists."""
    if not host:
        return None
    host = host.rstrip(".").lower()
    if _is_ip(host):
        return host
    parts = host.split(".")
    if host.endswith(".uk"):
        return ".".join(parts[-3:]) if len(parts) >= 3 else host
    suffix = extract_public_suffix(host)
    if suffix is None:
        return host
    n = len(suffix.split(".")) + 1
    return ".".join(parts[-n:]) if len(parts) >= n else host


def all_levels(host: str | None) -> list[str]:
    """Every registry level of a host, shallow→deep:
    ``bbc.co.uk → [uk, co.uk, bbc.co.uk]``
    (``LinkExtractor.allLevels``; IP hosts yield an empty list)."""
    if not host:
        return []
    host = host.rstrip(".").lower()
    if _is_ip(host) or "." not in host and not host.isalpha():
        return []
    if _is_ip(host):
        return []
    parts = host.split(".")
    return [".".join(parts[i:]) for i in range(len(parts) - 1, -1, -1)]


def to_surt(host: str) -> str:
    """SURT form of a bare host: ``archive.org → (org,archive,``
    (``SURT.toSURT`` as used by ``WARCIndexer.java:619-625``)."""
    return "(" + ",".join(reversed(host.split("."))) + ","


def host_surts(host: str | None) -> list[str]:
    """Multi-valued ``host_surt`` field: SURT of every host level
    (goldens ``WARCIndexerTest.java:340-359``)."""
    return [to_surt(level) for level in all_levels(host)]


def surt_key(url: str) -> str:
    """Full-URL SURT sort key used for global fetch ordering (the analog of
    the CDX ``urlkey`` in ``ArchiveCDXGenerator``'s total-order sort):
    canonicalise, then ``(tld,dom,[sub,]*)path[?query]``."""
    return surt_key_from_canonical(canonicalise_url(url))


def surt_key_from_canonical(canon: str) -> str:
    """SURT key from an ALREADY-canonical URL (skips re-canonicalization —
    use when ``canonicalise_url`` output is already at hand)."""
    try:
        parts = urlsplit(canon)
        # .hostname/.port parse lazily and can raise on malformed
        # authorities (e.g. "http://::"); a key must still come out
        host = parts.hostname or ""
        port_no = parts.port
    except Exception:
        return canon
    port = f":{port_no}" if port_no and port_no != 80 else ""
    path = parts.path or "/"
    query = f"?{parts.query}" if parts.query else ""
    return "(" + ",".join(reversed(host.split("."))) + "," + ")" + port + path + query
