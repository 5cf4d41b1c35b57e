"""Pure-stdlib deep-format document parsers: PDF text, DOCX text, JPEG EXIF.

The reference delegates these to Tika (``TikaPayloadAnalyser.java:165-414``
maps Tika's metadata into Solr fields).  Tika's jars don't ship in this
sandbox, so these are real MINIMAL parsers for the common cases a
web-archive crawl hits, written against the public format specs:

- PDF (ISO 32000): object/stream scan, ``FlateDecode`` via ``zlib``, text
  operators (``Tj`` / ``'`` / ``"`` / ``TJ``) inside ``BT``/``ET`` blocks,
  literal-string escapes + hex strings, UTF-16BE Info-dict strings,
  ``/Type /Page`` page count.  No xref table needed — the scan tolerates
  the incremental-update and broken-offset files archives are full of.
- DOCX (ECMA-376): ZIP container via ``zipfile``; paragraphs/runs/tabs/
  breaks from ``word/document.xml``; Dublin Core title/creator from
  ``docProps/core.xml``.
- JPEG EXIF (CIPA DC-008): APP1 segment walk, TIFF header (II/MM), IFD0 +
  Exif sub-IFD entries (Make, Model, Software, DateTime, Orientation,
  DateTimeOriginal).

Every parser is bounded (input caps, bounded scans) and total: any failure
returns a ``parse_error`` string instead of raising — the same per-record
recovery contract as the WARC reader and the HTML analyser.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
import zlib
from html import unescape as _xml_unescape

__all__ = ["pdf_extract", "docx_extract", "exif_extract", "TEXT_CAP"]

TEXT_CAP = 512 * 1024  # SolrRecordFactory.DEFAULT_CONTENT_MAX_LENGTH
_MAX_INPUT = 64 * 1024 * 1024  # hard input bound (payload cache tier)

# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------

_PDF_STREAM = re.compile(rb"stream\r?\n", re.S)
_PDF_PAGE = re.compile(rb"/Type\s*/Page(?![s\w])")
_PDF_INFO_STR = {
    "title": re.compile(rb"/Title\s*(\(|<)"),
    "author": re.compile(rb"/Author\s*(\(|<)"),
    "producer": re.compile(rb"/Producer\s*(\(|<)"),
}
_PDF_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _pdf_literal_string(data: bytes, start: int) -> tuple[str, int]:
    """Decode a PDF literal string starting at the ``(``; returns
    (decoded, index past closing paren).  Handles nesting, escapes, octal."""
    assert data[start: start + 1] == b"("
    out: list[str] = []
    depth = 1
    i = start + 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            nxt = data[i + 1]
            if nxt in _PDF_ESCAPES:
                out.append(_PDF_ESCAPES[nxt])
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_digits.append(chr(data[j]))
                    j += 1
                out.append(chr(int("".join(oct_digits), 8) & 0xFF))
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(chr(nxt))
                i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(chr(c))
        i += 1
    s = "".join(out)
    # UTF-16BE with BOM (Info-dict strings); else PDFDocEncoding ≈ latin-1
    if s[:2] == "\xfe\xff":
        try:
            s = s.encode("latin-1", "replace").decode("utf-16-be", "replace")[1:]
        except Exception:
            pass
    return s, i


def _pdf_hex_string(data: bytes, start: int) -> tuple[str, int]:
    end = data.find(b">", start)
    if end < 0:
        return "", len(data)
    hx = re.sub(rb"\s", b"", data[start + 1: end])
    if len(hx) % 2:
        hx += b"0"
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        return "", end + 1
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace"), end + 1
    return raw.decode("latin-1", "replace"), end + 1


def _pdf_string_at(data: bytes, i: int) -> tuple[str, int]:
    if data[i: i + 1] == b"(":
        return _pdf_literal_string(data, i)
    return _pdf_hex_string(data, i)


_TEXT_SHOW = re.compile(rb"""(\(|<(?![<]))""")
_BT_ET = re.compile(rb"\bBT\b(.*?)\bET\b", re.S)
_TJ_OPS = re.compile(rb"(Tj|TJ|T\*|Td|TD|')")


def _pdf_content_text(content: bytes, budget: int) -> list[str]:
    """Text shown by a decoded content stream: strings immediately feeding
    the show operators inside BT/ET blocks, in stream order."""
    parts: list[str] = []
    used = 0
    for block in _BT_ET.finditer(content):
        body = block.group(1)
        i = 0
        n = len(body)
        while i < n and used < budget:
            c = body[i: i + 1]
            if c == b"(":
                s, i = _pdf_literal_string(body, i)
                parts.append(s)
                used += len(s)
            elif c == b"<" and body[i: i + 2] != b"<<":
                s, i = _pdf_hex_string(body, i)
                parts.append(s)
                used += len(s)
            elif c in (b"'", b'"'):  # next-line show operators
                parts.append("\n")
                i += 1
            elif body[i: i + 2] in (b"T*", b"Td", b"TD"):
                parts.append("\n")
                i += 2
            else:
                i += 1
        if used >= budget:
            break
    return parts


def pdf_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract text + document info from a PDF.  Returns
    ``{text, n_pages, title, author, producer, parse_error}``."""
    out = {"text": None, "n_pages": None, "title": None, "author": None,
           "producer": None, "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        data = bytes(data[:_MAX_INPUT])
        if not data.startswith(b"%PDF-"):
            out["parse_error"] = "not a PDF (missing %PDF- header)"
            return out
        # pages: count page objects over the raw file (works without xref)
        out["n_pages"] = len(_PDF_PAGE.findall(data)) or None
        # info strings
        for field, rx in _PDF_INFO_STR.items():
            m = rx.search(data)
            if m:
                s, _ = _pdf_string_at(data, m.end() - 1)
                out[field] = s or None
        # content streams: raw or FlateDecode
        parts: list[str] = []
        used = 0
        pos = 0
        while used < max_chars:
            m = _PDF_STREAM.search(data, pos)
            if not m:
                break
            start = m.end()
            end = data.find(b"endstream", start)
            if end < 0:
                break
            raw = data[start:end].rstrip(b"\r\n")
            # the object dict sits just before "stream"
            dict_start = data.rfind(b"<<", max(0, m.start() - 2048), m.start())
            obj_dict = data[dict_start: m.start()] if dict_start >= 0 else b""
            if b"/FlateDecode" in obj_dict:
                try:
                    raw = zlib.decompress(raw)
                except zlib.error:
                    pos = end + 9
                    continue
            if b"BT" in raw:
                got = _pdf_content_text(raw, max_chars - used)
                if got:
                    parts.extend(got)
                    parts.append("\n")  # stream boundary ≈ page/flow break
                    used += sum(len(g) for g in got)
            pos = end + 9
        text = "".join(parts)
        text = re.sub(r"[ \t]+", " ", text).strip()
        out["text"] = text[:max_chars] or None
    except Exception as e:  # total: any structural surprise → parse_error
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------

_W_P = re.compile(r"</w:p>")
_W_RUNS = re.compile(r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br\s*/>", re.S)
_CORE_TITLE = re.compile(r"<dc:title(?:\s[^>]*)?>(.*?)</dc:title>", re.S)
_CORE_CREATOR = re.compile(r"<dc:creator(?:\s[^>]*)?>(.*?)</dc:creator>", re.S)


def _docx_paragraph_text(p_xml: str) -> str:
    parts = []
    for m in _W_RUNS.finditer(p_xml):
        tok = m.group(0)
        if tok.startswith("<w:tab"):
            parts.append("\t")
        elif tok.startswith("<w:br"):
            parts.append("\n")
        else:
            parts.append(_xml_unescape(m.group(1)))
    return "".join(parts)


def docx_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract text + core properties from a DOCX (ECMA-376 ZIP).  Returns
    ``{text, n_paragraphs, title, author, parse_error}``."""
    out = {"text": None, "n_paragraphs": None, "title": None, "author": None,
           "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data[:_MAX_INPUT])))
        try:
            doc = zf.read("word/document.xml").decode("utf-8", "replace")
        except KeyError:
            out["parse_error"] = "no word/document.xml (not a DOCX)"
            return out
        paras = [
            t for t in (_docx_paragraph_text(p) for p in _W_P.split(doc))
            if t.strip()
        ]
        out["n_paragraphs"] = len(paras)
        out["text"] = "\n".join(paras)[:max_chars] or None
        try:
            core = zf.read("docProps/core.xml").decode("utf-8", "replace")
            mt = _CORE_TITLE.search(core)
            mc = _CORE_CREATOR.search(core)
            out["title"] = _xml_unescape(mt.group(1)) or None if mt else None
            out["author"] = _xml_unescape(mc.group(1)) or None if mc else None
        except KeyError:
            pass
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# JPEG EXIF
# ---------------------------------------------------------------------------

_EXIF_ASCII_TAGS = {
    0x010F: "make", 0x0110: "model", 0x0131: "software", 0x0132: "datetime",
}
_EXIF_SUBIFD_PTR = 0x8769
_EXIF_DT_ORIGINAL = 0x9003
_EXIF_ORIENTATION = 0x0112


def _parse_ifd(tiff: bytes, offset: int, endian: str, out: dict,
               depth: int = 0) -> None:
    if depth > 2 or offset + 2 > len(tiff):
        return
    (count,) = struct.unpack_from(endian + "H", tiff, offset)
    for i in range(min(count, 256)):
        base = offset + 2 + i * 12
        if base + 12 > len(tiff):
            return
        tag, typ, n = struct.unpack_from(endian + "HHI", tiff, base)
        if typ == 2 and (tag in _EXIF_ASCII_TAGS or tag == _EXIF_DT_ORIGINAL):
            if n <= 4:
                raw = tiff[base + 8: base + 8 + n]
            else:
                (val_off,) = struct.unpack_from(endian + "I", tiff, base + 8)
                raw = tiff[val_off: val_off + n]
            s = raw.split(b"\0", 1)[0].decode("ascii", "replace").strip()
            key = _EXIF_ASCII_TAGS.get(tag, "datetime_original")
            out[key] = s or None
        elif tag == _EXIF_ORIENTATION and typ == 3:
            (v,) = struct.unpack_from(endian + "H", tiff, base + 8)
            out["orientation"] = int(v)
        elif tag == _EXIF_SUBIFD_PTR and typ == 4:
            (sub,) = struct.unpack_from(endian + "I", tiff, base + 8)
            _parse_ifd(tiff, sub, endian, out, depth + 1)


def exif_extract(data: bytes | None) -> dict:
    """EXIF fields from a JPEG payload (APP1/TIFF walk).  Returns
    ``{make, model, software, datetime, datetime_original, orientation,
    parse_error}``."""
    out = {"make": None, "model": None, "software": None, "datetime": None,
           "datetime_original": None, "orientation": None, "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        data = bytes(data[:_MAX_INPUT])
        if data[:2] != b"\xff\xd8":
            out["parse_error"] = "not a JPEG (missing SOI)"
            return out
        i = 2
        n = len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xDA:  # start of scan: no more metadata segments
                break
            (seg_len,) = struct.unpack_from(">H", data, i + 2)
            seg = data[i + 4: i + 2 + seg_len]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                tiff = seg[6:]
                if tiff[:2] == b"II":
                    endian = "<"
                elif tiff[:2] == b"MM":
                    endian = ">"
                else:
                    out["parse_error"] = "bad TIFF byte order"
                    return out
                (magic,) = struct.unpack_from(endian + "H", tiff, 2)
                if magic != 42:
                    out["parse_error"] = "bad TIFF magic"
                    return out
                (ifd0,) = struct.unpack_from(endian + "I", tiff, 4)
                _parse_ifd(tiff, ifd0, endian, out)
                return out
            i += 2 + seg_len
        out["parse_error"] = "no EXIF APP1 segment"
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out
