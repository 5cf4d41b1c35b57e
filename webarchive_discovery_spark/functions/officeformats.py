"""Pure-stdlib office-document parsers: XLSX, PPTX, ODT, RTF.

Extends the Tika tier (``functions/docformats.py`` — PDF/DOCX/EXIF) with
the next-most-common office formats a web-archive crawl hits.  The
reference delegates all of these to Tika
(``TikaPayloadAnalyser.java:165-414`` maps Tika metadata into Solr
fields); Tika's jars don't ship here, so these are real MINIMAL parsers
written against the public specs:

- XLSX (ECMA-376 SpreadsheetML): ZIP via ``zipfile``; shared-string table
  (``xl/sharedStrings.xml``, rich runs concatenated per ``<si>``), sheet
  cell walk (``<c t="s|str|inlineStr|b|n">``), Dublin Core title/creator.
  Text is rows tab-joined, rows/sheets newline-joined (Tika's shape).
- PPTX (ECMA-376 PresentationML): slide XMLs in numeric order; ``<a:t>``
  runs concatenated per ``<a:p>`` paragraph.
- ODT (OASIS OpenDocument): ``content.xml`` ``<text:p>``/``<text:h>``
  paragraphs; ``meta.xml`` Dublin Core.
- RTF (Word RTF spec 1.9): group/control-word state machine — destination
  groups (``\\*``, fonttbl, colortbl, stylesheet, info, pict) skipped,
  ``\\par``/``\\line``/``\\tab`` mapped, ``\\'hh`` cp1252 escapes and
  ``\\uN`` unicode (with ``\\ucN`` fallback-skip) decoded;
  ``{\\info{\\title ...}{\\author ...}}`` captured.

Every parser is bounded and total: any failure returns a ``parse_error``
string instead of raising — the same per-record recovery contract as the
WARC reader and the HTML analyser.
"""

from __future__ import annotations

import io
import re
import zipfile
from html import unescape as _xml_unescape

__all__ = ["xlsx_extract", "pptx_extract", "odt_extract", "rtf_extract",
           "zip_extract", "epub_extract"]

from .docformats import TEXT_CAP, _MAX_INPUT

_TAG = re.compile(r"<[^>]+>")
_CORE_TITLE = re.compile(r"<dc:title[^>]*>(.*?)</dc:title>", re.S)
_CORE_CREATOR = re.compile(r"<dc:creator[^>]*>(.*?)</dc:creator>", re.S)


def _core_props(zf: zipfile.ZipFile, path: str, out: dict) -> None:
    try:
        core = zf.read(path).decode("utf-8", "replace")
    except KeyError:
        return
    mt, mc = _CORE_TITLE.search(core), _CORE_CREATOR.search(core)
    out["title"] = (_xml_unescape(mt.group(1)).strip() or None) if mt else None
    out["author"] = (_xml_unescape(mc.group(1)).strip() or None) if mc else None


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------

_SI = re.compile(r"<si\b.*?</si>", re.S)
_T_RUN = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_ROW = re.compile(r"<row\b.*?(?:</row>|/>)", re.S)
_CELL = re.compile(r"<c\b([^>]*?)(?:/>|>(.*?)</c>)", re.S)
_CELL_T = re.compile(r'\bt="([^"]+)"')
_V = re.compile(r"<v(?:\s[^>]*)?>(.*?)</v>", re.S)
_SHEET_N = re.compile(r"xl/worksheets/sheet(\d+)\.xml$")


def _cell_value(attrs: str, body: str, shared: list[str]) -> str | None:
    t = _CELL_T.search(attrs)
    t = t.group(1) if t else "n"
    if t == "inlineStr":
        return "".join(_xml_unescape(m.group(1)) for m in _T_RUN.finditer(body))
    m = _V.search(body or "")
    if m is None:
        return None
    v = _xml_unescape(m.group(1))
    if t == "s":
        try:
            return shared[int(v)]
        except (ValueError, IndexError):
            return None
    if t == "b":
        return "TRUE" if v.strip() == "1" else "FALSE"
    return v  # "n" / "str" / "e": the literal stored value


def xlsx_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract text + core properties from an XLSX (ECMA-376
    SpreadsheetML ZIP).  Returns
    ``{text, n_sheets, n_cells, title, author, parse_error}`` — cells
    tab-joined per row, rows/sheets newline-joined."""
    out = {"text": None, "n_sheets": None, "n_cells": None, "title": None,
           "author": None, "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data[:_MAX_INPUT])))
        shared: list[str] = []
        try:
            ss = zf.read("xl/sharedStrings.xml").decode("utf-8", "replace")
            shared = [
                "".join(_xml_unescape(m.group(1)) for m in _T_RUN.finditer(si.group(0)))
                for si in _SI.finditer(ss)
            ]
        except KeyError:
            pass
        sheets = sorted(
            (int(m.group(1)), n) for n in zf.namelist()
            if (m := _SHEET_N.search(n))
        )
        if not sheets:
            out["parse_error"] = "no xl/worksheets/*.xml (not an XLSX)"
            return out
        n_cells, lines = 0, []
        for _, name in sheets:
            xml = zf.read(name).decode("utf-8", "replace")
            for row in _ROW.finditer(xml):
                vals = []
                for cm in _CELL.finditer(row.group(0)):
                    v = _cell_value(cm.group(1), cm.group(2) or "", shared)
                    if v is not None:
                        vals.append(v)
                        n_cells += 1
                if vals:
                    lines.append("\t".join(vals))
        out["n_sheets"] = len(sheets)
        out["n_cells"] = n_cells
        out["text"] = "\n".join(lines)[:max_chars] or None
        _core_props(zf, "docProps/core.xml", out)
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------

_A_P = re.compile(r"<a:p\b.*?(?:</a:p>|/>)", re.S)
_A_T = re.compile(r"<a:t(?:\s[^>]*)?>(.*?)</a:t>", re.S)
_SLIDE_N = re.compile(r"ppt/slides/slide(\d+)\.xml$")


def pptx_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract slide text + core properties from a PPTX (ECMA-376
    PresentationML ZIP).  Returns
    ``{text, n_slides, title, author, parse_error}``."""
    out = {"text": None, "n_slides": None, "title": None, "author": None,
           "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data[:_MAX_INPUT])))
        slides = sorted(
            (int(m.group(1)), n) for n in zf.namelist()
            if (m := _SLIDE_N.search(n))
        )
        if not slides:
            out["parse_error"] = "no ppt/slides/*.xml (not a PPTX)"
            return out
        paras = []
        for _, name in slides:
            xml = zf.read(name).decode("utf-8", "replace")
            for p in _A_P.finditer(xml):
                txt = "".join(_xml_unescape(m.group(1))
                              for m in _A_T.finditer(p.group(0)))
                if txt.strip():
                    paras.append(txt)
        out["n_slides"] = len(slides)
        out["text"] = "\n".join(paras)[:max_chars] or None
        _core_props(zf, "docProps/core.xml", out)
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# ODT
# ---------------------------------------------------------------------------

_ODT_P = re.compile(r"<text:(?:p|h)\b[^>]*>(.*?)</text:(?:p|h)>", re.S)
_ODT_TITLE = re.compile(r"<dc:title[^>]*>(.*?)</dc:title>", re.S)
_ODT_CREATOR = re.compile(
    r"<(?:meta:initial-creator|dc:creator)[^>]*>(.*?)"
    r"</(?:meta:initial-creator|dc:creator)>", re.S)


def odt_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract text + metadata from an ODT (OASIS OpenDocument ZIP).
    Returns ``{text, n_paragraphs, title, author, parse_error}``."""
    out = {"text": None, "n_paragraphs": None, "title": None, "author": None,
           "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data[:_MAX_INPUT])))
        try:
            content = zf.read("content.xml").decode("utf-8", "replace")
        except KeyError:
            out["parse_error"] = "no content.xml (not an ODT)"
            return out
        paras = [
            t for t in (
                _xml_unescape(_TAG.sub("", p.group(1))).strip()
                for p in _ODT_P.finditer(content)
            ) if t
        ]
        out["n_paragraphs"] = len(paras)
        out["text"] = "\n".join(paras)[:max_chars] or None
        try:
            meta = zf.read("meta.xml").decode("utf-8", "replace")
            mt, mc = _ODT_TITLE.search(meta), _ODT_CREATOR.search(meta)
            out["title"] = (_xml_unescape(mt.group(1)).strip() or None) if mt else None
            out["author"] = (_xml_unescape(mc.group(1)).strip() or None) if mc else None
        except KeyError:
            pass
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# RTF
# ---------------------------------------------------------------------------

_RTF_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"pict", b"object", b"header",
    b"footer", b"xmlnstbl", b"themedata", b"colorschememapping",
    b"generator", b"*",
}
_RTF_CW = re.compile(rb"\\([a-z]+)(-?\d+)? ?|\\'([0-9a-fA-F]{2})|\\([^a-z])")


def rtf_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract text + ``\\info`` title/author from an RTF document with a
    bounded group/control-word state machine.  Returns
    ``{text, n_paragraphs, title, author, parse_error}``."""
    out = {"text": None, "n_paragraphs": None, "title": None, "author": None,
           "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        buf = bytes(data[:_MAX_INPUT])
        if not buf.startswith(b"{\\rtf"):
            out["parse_error"] = "missing {\\rtf header (not RTF)"
            return out
        text: list[str] = []
        dest_stack: list[str] = ["doc"]  # "doc" | "skip" | "title" | "author"
        uc_skip, pending_skip = 1, 0
        sinks = {"doc": text, "title": [], "author": []}
        i, n = 0, len(buf)
        while i < n:
            c = buf[i : i + 1]
            if c == b"{":
                dest_stack.append(dest_stack[-1])
                i += 1
            elif c == b"}":
                if len(dest_stack) > 1:
                    dest_stack.pop()
                i += 1
            elif c == b"\\":
                m = _RTF_CW.match(buf, i)
                if not m:
                    i += 1
                    continue
                i = m.end()
                word, param, hexb, esc = m.groups()
                cur = dest_stack[-1]
                if hexb is not None:
                    if pending_skip:
                        pending_skip -= 1
                    elif cur != "skip":
                        sinks[cur if cur in sinks else "doc"].append(
                            bytes([int(hexb, 16)]).decode("cp1252", "replace"))
                elif esc is not None:
                    if esc == b"*":  # optional destination: skip the group
                        dest_stack[-1] = "skip"
                    elif cur != "skip":
                        ch = {b"\\": "\\", b"{": "{", b"}": "}",
                              b"~": "\u00a0", b"-": "", b"_": "-"}.get(esc)
                        if ch is None and esc in (b"\r", b"\n"):
                            ch = "\n"
                        if ch:
                            sinks[cur if cur in sinks else "doc"].append(ch)
                elif word is not None:
                    w = word
                    if w == b"u" and param is not None:
                        if cur != "skip":
                            cp = int(param)
                            sinks[cur if cur in sinks else "doc"].append(
                                chr(cp + 65536 if cp < 0 else cp))
                        pending_skip = uc_skip
                    elif w == b"uc" and param is not None:
                        uc_skip = int(param)
                    elif w in (b"par", b"line"):
                        if cur == "doc":
                            text.append("\n")
                    elif w == b"tab":
                        if cur == "doc":
                            text.append("\t")
                    elif w == b"title":
                        dest_stack[-1] = "title"
                    elif w == b"author":
                        dest_stack[-1] = "author"
                    elif w in _RTF_SKIP_DESTS:
                        dest_stack[-1] = "skip"
            else:
                j = min(buf.find(b"\\", i) % (n + 1), buf.find(b"{", i) % (n + 1),
                        buf.find(b"}", i) % (n + 1), n)
                chunk = buf[i:j].replace(b"\r", b"").replace(b"\n", b"")
                cur = dest_stack[-1]
                if chunk and cur != "skip":
                    if pending_skip:
                        chunk = chunk[pending_skip:]
                        pending_skip = 0
                    sinks[cur if cur in sinks else "doc"].append(
                        chunk.decode("cp1252", "replace"))
                i = max(j, i + 1)
        full = "".join(text).strip()
        paras = [p for p in full.split("\n") if p.strip()]
        out["n_paragraphs"] = len(paras) or None
        out["text"] = full[:max_chars] or None
        out["title"] = "".join(sinks["title"]).strip() or None
        out["author"] = "".join(sinks["author"]).strip() or None
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# ZIP entry listing (Tika reports container entries for application/zip)
# ---------------------------------------------------------------------------

def zip_extract(data: bytes | None, max_entries: int = 10_000) -> dict:
    """List a ZIP container's entries (the Tika ``application/zip`` tier):
    newline-joined entry names as the text, plus entry count and total
    uncompressed size.  Bounded by ``max_entries``."""
    out = {"text": None, "n_entries": None, "total_uncompressed": None,
           "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data[:_MAX_INPUT])))
        infos = zf.infolist()[:max_entries]
        out["n_entries"] = len(infos)
        out["total_uncompressed"] = int(sum(i.file_size for i in infos))
        out["text"] = "\n".join(i.filename for i in infos)[:TEXT_CAP] or None
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# EPUB (OCF container: META-INF/container.xml → OPF package → spine XHTML)
# ---------------------------------------------------------------------------

# attribute values accept either quote style — a spec-valid EPUB may use
# single-quoted full-path/idref attributes (ADVICE r5), matching the
# tolerance of the other regex parsers in this module
_ROOTFILE = re.compile(r'<rootfile[^>]*full-path=["\']([^"\']+)["\']')
_DC_LANG = re.compile(r"<dc:language[^>]*>(.*?)</dc:language>", re.S)
_MANIFEST_ITEM = re.compile(r"<item\b[^>]*/?>", re.S)
_ATTR_ID = re.compile(r'\bid=["\']([^"\']+)["\']')
_ATTR_HREF = re.compile(r'\bhref=["\']([^"\']+)["\']')
_ITEMREF = re.compile(r'<itemref[^>]*\bidref=["\']([^"\']+)["\']')
_BODY = re.compile(r"<body\b[^>]*>(.*?)</body>", re.S | re.I)


def epub_extract(data: bytes | None, max_chars: int = TEXT_CAP) -> dict:
    """Extract an EPUB (OCF/OPF): Dublin Core title/creator/language from
    the package document located via ``META-INF/container.xml``, spine
    length, and the spine XHTML documents' tag-stripped text in reading
    order.  Returns ``{text, n_spine, title, author, language,
    parse_error}`` — the fields Tika's EpubParser surfaces."""
    out = {"text": None, "n_spine": None, "title": None, "author": None,
           "language": None, "parse_error": None}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data[:_MAX_INPUT])))
        container = zf.read("META-INF/container.xml").decode("utf-8", "replace")
        m = _ROOTFILE.search(container)
        if m is None:
            out["parse_error"] = "container.xml has no rootfile"
            return out
        opf_path = m.group(1)
        opf = zf.read(opf_path).decode("utf-8", "replace")
        mt, mc = _CORE_TITLE.search(opf), _CORE_CREATOR.search(opf)
        ml = _DC_LANG.search(opf)
        out["title"] = (_xml_unescape(mt.group(1)).strip() or None) if mt else None
        out["author"] = (_xml_unescape(mc.group(1)).strip() or None) if mc else None
        out["language"] = (_xml_unescape(ml.group(1)).strip() or None) if ml else None
        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        hrefs = {}
        for item in _MANIFEST_ITEM.finditer(opf):
            mid, mh = _ATTR_ID.search(item.group(0)), _ATTR_HREF.search(item.group(0))
            if mid and mh:
                hrefs[mid.group(1)] = mh.group(1)
        spine = [hrefs[r] for r in _ITEMREF.findall(opf) if r in hrefs]
        out["n_spine"] = len(spine)
        texts = []
        for href in spine:
            try:
                doc = zf.read(base + href).decode("utf-8", "replace")
            except KeyError:
                continue
            body = _BODY.search(doc)
            raw = body.group(1) if body else doc
            txt = " ".join(_xml_unescape(_TAG.sub(" ", raw)).split())
            if txt:
                texts.append(txt)
            if sum(len(t) for t in texts) > max_chars:
                break
        out["text"] = "\n".join(texts)[:max_chars] or None
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out
