"""Legacy binary Office TEXT extraction: Word 97 (.doc) and Excel 97 (.xls).

Completes the OLE2 tier (``functions/ole2.py`` parses the container and
property sets; this module parses the document content streams) — the
reference hands these to Tika's POI parsers
(``TikaPayloadAnalyser.java:165-414``); POI doesn't ship here, so these are
real minimal implementations of the two public specs:

- [MS-DOC]: the WordDocument stream's FIB locates the Clx in the 0Table/
  1Table stream (``fWhichTblStm``); the Clx's ``clxtPlcfpcd`` holds the
  PIECE TABLE (PlcPcd): CP ranges + PCDs whose 30-bit ``fc`` encodes both
  the byte offset and the compression flag (bit 30 set → cp1252 bytes at
  ``fc/2``, clear → UTF-16LE at ``fc``).  Paragraph marks (0x0D) become
  newlines, cell marks (0x07) tabs.
- [MS-XLS]: the Workbook stream is a BIFF8 record walk — SST shared
  strings (XLUnicodeRichExtendedString: ``fHighByte`` single/double-byte,
  rich-run and ExtRst skipping), LABELSST cells referencing them, and
  NUMBER cells.  Cells come out rows tab-joined / rows newline-joined,
  the same shape as ``xlsx_extract``.

The ``build_doc`` / ``build_xls`` writers serialize the symmetric minimal
streams for fixtures (the AVI/MP4/CFBF hand-rolled-spec strategy); tests
assert the FIB/piece-table/BIFF layouts structurally so a symmetric bug
cannot hide behind a round trip.

Both parsers are bounded and total: they return ``None`` (caller falls
back to the stream listing) on anything that is not a parseable
Word/Excel stream — never raise.
"""

from __future__ import annotations

import struct

__all__ = ["doc_text", "doc_text_from_streams", "xls_cells", "xls_text",
           "ppt_text", "build_doc", "build_xls", "build_ppt"]

_FC_COMPRESSED = 0x40000000


def doc_text_from_streams(stream_bytes: dict) -> str | None:
    """Pick the table stream the FIB's ``fWhichTblStm`` flag names
    (1Table vs 0Table) and run :func:`doc_text`."""
    w = stream_bytes.get("WordDocument")
    if not w or len(w) < 0x0C:
        return None
    which = struct.unpack_from("<H", bytes(w), 0x0A)[0] & 0x0200
    table = stream_bytes.get("1Table" if which else "0Table")
    if table is None:
        return None
    return doc_text(w, table)


def doc_text(word_stream: bytes, table_stream: bytes,
             max_chars: int = 1 << 20) -> str | None:
    """Extract main-document text from a WordDocument + table stream pair
    via the [MS-DOC] piece table.  Returns None when the stream is not a
    Word 97+ binary document."""
    try:
        w = bytes(word_stream)
        if len(w) < 0x200 or struct.unpack_from("<H", w, 0)[0] != 0xA5EC:
            return None
        fc_clx, lcb_clx = struct.unpack_from("<II", w, 0x01A2)
        t = bytes(table_stream)
        if lcb_clx == 0 or fc_clx + lcb_clx > len(t):
            return None
        clx = t[fc_clx: fc_clx + lcb_clx]
        # walk Prcs (0x01 + cb:u16 + grpprl) until the 0x02 clxtPlcfpcd
        pos = 0
        while pos < len(clx) and clx[pos] == 0x01:
            cb = struct.unpack_from("<H", clx, pos + 1)[0]
            pos += 3 + cb
        if pos >= len(clx) or clx[pos] != 0x02:
            return None
        lcb = struct.unpack_from("<I", clx, pos + 1)[0]
        plc = clx[pos + 5: pos + 5 + lcb]
        n = (len(plc) - 4) // 12
        if n <= 0:
            return None
        cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
        out: list[str] = []
        total = 0
        for i in range(n):
            flags_fc_prm = plc[4 * (n + 1) + 8 * i: 4 * (n + 1) + 8 * i + 8]
            fc = struct.unpack_from("<I", flags_fc_prm, 2)[0]
            count = cps[i + 1] - cps[i]
            if count <= 0 or total > max_chars:
                continue
            if fc & _FC_COMPRESSED:
                off = (fc & 0x3FFFFFFF) >> 1
                raw = w[off: off + count]
                piece = raw.decode("cp1252", "replace")
            else:
                off = fc
                raw = w[off: off + 2 * count]
                piece = raw.decode("utf-16-le", "replace")
            out.append(piece)
            total += len(piece)
        text = "".join(out)[:max_chars]
        # [MS-DOC] control characters → plain text shape
        text = (text.replace("\r\n", "\n").replace("\r", "\n")
                .replace("\x07", "\t").replace("\x0b", "\n")
                .replace("\x0c", "\n"))
        return "".join(c for c in text if c == "\n" or c == "\t" or ord(c) >= 32)
    except Exception:
        return None


def _sst_strings(body: bytes) -> list[str]:
    """XLUnicodeRichExtendedString list from an SST record body (single
    record; strings spanning CONTINUE records end the walk gracefully)."""
    n_unique = struct.unpack_from("<I", body, 4)[0]
    out: list[str] = []
    pos = 8
    for _ in range(min(n_unique, 1 << 20)):
        if pos + 3 > len(body):
            break
        cch, flags = struct.unpack_from("<HB", body, pos)
        pos += 3
        n_runs = 0
        cb_ext = 0
        if flags & 0x08:  # fRichSt
            n_runs = struct.unpack_from("<H", body, pos)[0]
            pos += 2
        if flags & 0x04:  # fExtSt
            cb_ext = struct.unpack_from("<I", body, pos)[0]
            pos += 4
        if flags & 0x01:  # fHighByte: UTF-16LE
            raw = body[pos: pos + 2 * cch]
            pos += 2 * cch
            out.append(raw.decode("utf-16-le", "replace"))
        else:  # compressed: low bytes of UTF-16 (latin-1)
            raw = body[pos: pos + cch]
            pos += cch
            out.append(raw.decode("latin-1", "replace"))
        pos += 4 * n_runs + cb_ext
    return out


def _num_str(num: float) -> str:
    """Stored-value rendering shared by NUMBER/RK/MULRK: ``repr`` with a
    trailing ``.0`` trimmed (the ``xlsx_extract`` convention)."""
    s = repr(num)
    return s[:-2] if s.endswith(".0") else s


def _rk_num(rk: int) -> float:
    """[MS-XLS] RkNumber: bit0 = ×1/100 flag, bit1 = 30-bit signed int vs
    truncated IEEE double (high 30 bits of the mantissa/exponent)."""
    if rk & 2:  # fInt: signed 30-bit integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
        num = float(v)
    else:
        num = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return num / 100.0 if rk & 1 else num


def xls_cells(workbook_stream: bytes) -> list[tuple[int, int, str]] | None:
    """(row, col, value) cells from a BIFF8 Workbook stream: LABELSST via
    the SST, inline LABEL strings, and NUMBER / RK / MULRK numeric cells
    (trailing ``.0`` trimmed like ``xlsx_extract``'s stored-value
    convention — real Excel 97 writers store most numerics as RK/MULRK, so
    handling only NUMBER silently lost those cells; ADVICE r5).  None when
    the stream has no BIFF8 BOF."""
    try:
        d = bytes(workbook_stream)
        if len(d) < 4 or struct.unpack_from("<H", d, 0)[0] != 0x0809:
            return None
        sst: list[str] = []
        cells: list[tuple[int, int, str]] = []
        pos = 0
        while pos + 4 <= len(d):
            rid, rlen = struct.unpack_from("<HH", d, pos)
            body = d[pos + 4: pos + 4 + rlen]
            pos += 4 + rlen
            if rid == 0x00FC and len(body) >= 8:  # SST
                sst = _sst_strings(body)
            elif rid == 0x00FD and len(body) >= 10:  # LABELSST
                rw, col, _ixfe, isst = struct.unpack_from("<HHHI", body, 0)
                if isst < len(sst):
                    cells.append((rw, col, sst[isst]))
            elif rid == 0x0203 and len(body) >= 14:  # NUMBER
                rw, col, _ixfe = struct.unpack_from("<HHH", body, 0)
                num = struct.unpack_from("<d", body, 6)[0]
                cells.append((rw, col, _num_str(num)))
            elif rid == 0x027E and len(body) >= 10:  # RK
                rw, col, _ixfe = struct.unpack_from("<HHH", body, 0)
                rk = struct.unpack_from("<I", body, 6)[0]
                cells.append((rw, col, _num_str(_rk_num(rk))))
            elif rid == 0x00BD and len(body) >= 12:  # MULRK
                rw, col0 = struct.unpack_from("<HH", body, 0)
                n_cells = (len(body) - 6) // 6
                for i in range(n_cells):
                    rk = struct.unpack_from("<I", body, 4 + 6 * i + 2)[0]
                    cells.append((rw, col0 + i, _num_str(_rk_num(rk))))
            elif rid == 0x0204 and len(body) >= 9:  # inline LABEL
                rw, col, _ixfe, cch, flags = struct.unpack_from("<HHHHB", body, 0)
                if flags & 0x01:  # fHighByte: UTF-16LE
                    raw = body[9: 9 + 2 * cch]
                    cells.append((rw, col, raw.decode("utf-16-le", "replace")))
                else:
                    raw = body[9: 9 + cch]
                    cells.append((rw, col, raw.decode("latin-1", "replace")))
            elif rid == 0x000A:  # EOF of this substream
                continue
        return cells
    except Exception:
        return None


def xls_text(workbook_stream: bytes, max_chars: int = 1 << 20) -> str | None:
    """Cells rendered rows tab-joined / newline-joined (the
    ``xlsx_extract`` text shape)."""
    cells = xls_cells(workbook_stream)
    if cells is None:
        return None
    rows: dict[int, dict[int, str]] = {}
    for rw, col, v in cells:
        rows.setdefault(rw, {})[col] = v
    lines = []
    for rw in sorted(rows):
        cols = rows[rw]
        lines.append("\t".join(cols[c] for c in sorted(cols)))
    return "\n".join(lines)[:max_chars] or None


_PPT_TEXT_CHARS = 0x0FA0   # TextCharsAtom (UTF-16LE)
_PPT_TEXT_BYTES = 0x0FA8   # TextBytesAtom (low bytes of UTF-16)


def ppt_text(ppt_stream: bytes, max_chars: int = 1 << 20) -> str | None:
    """Extract text from a PowerPoint 97 ``PowerPoint Document`` stream:
    a recursive [MS-PPT] record walk (container records have recVer 0xF)
    collecting TextCharsAtom / TextBytesAtom payloads in stream order.
    Paragraph marks (0x0D) become newlines.  None when the stream has no
    PPT records at all."""
    try:
        d = bytes(ppt_stream)
        texts: list[str] = []

        def walk(lo: int, hi: int, depth: int) -> None:
            pos = lo
            while pos + 8 <= hi and sum(map(len, texts)) <= max_chars:
                ver_inst, rtype, rlen = struct.unpack_from("<HHI", d, pos)
                body_lo = pos + 8
                body_hi = min(body_lo + rlen, hi)
                if body_hi < body_lo:
                    return
                if (ver_inst & 0x0F) == 0x0F and depth < 16:
                    walk(body_lo, body_hi, depth + 1)  # container
                elif rtype == _PPT_TEXT_CHARS:
                    texts.append(
                        d[body_lo:body_hi].decode("utf-16-le", "replace"))
                elif rtype == _PPT_TEXT_BYTES:
                    texts.append(
                        d[body_lo:body_hi].decode("latin-1", "replace"))
                pos = body_lo + rlen

        walk(0, len(d), 0)
        if not texts:
            return None
        text = "\n".join(t.replace("\r", "\n").rstrip("\0") for t in texts)
        return text[:max_chars] or None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Minimal symmetric writers (fixtures)
# ---------------------------------------------------------------------------

def build_doc(pieces: list[tuple[str, bool]]) -> tuple[bytes, bytes]:
    """Serialize ``(text, compressed)`` pieces into (WordDocument stream,
    1Table stream) per [MS-DOC]: FIB with ``fWhichTblStm`` set, text
    placed from offset 0x800, piece table in the table stream's Clx."""
    fib = bytearray(0x600)
    struct.pack_into("<H", fib, 0, 0xA5EC)          # wIdent
    struct.pack_into("<H", fib, 2, 0x00C1)          # nFib (Word 97)
    struct.pack_into("<H", fib, 0x0A, 0x0200)       # fWhichTblStm → 1Table
    text_parts: list[bytes] = []
    cps = [0]
    pcds: list[bytes] = []
    fc = 0x800
    for text, compressed in pieces:
        cps.append(cps[-1] + len(text))
        if compressed:
            raw = text.encode("cp1252")
            enc_fc = _FC_COMPRESSED | (fc * 2)
        else:
            raw = text.encode("utf-16-le")
            enc_fc = fc
        pcds.append(struct.pack("<HIH", 0, enc_fc, 0))
        text_parts.append(raw)
        fc += len(raw)
    plc = b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(pcds)
    # one Prc ahead of the piece table so the Prcs walk is exercised
    prc = b"\x01" + struct.pack("<H", 2) + b"\0\0"
    clx = prc + b"\x02" + struct.pack("<I", len(plc)) + plc
    table = clx  # Clx at offset 0 of the table stream
    struct.pack_into("<II", fib, 0x01A2, 0, len(clx))  # fcClx, lcbClx
    word = bytes(fib) + b"\0" * (0x800 - len(fib)) + b"".join(text_parts)
    return word, table


def _biff(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def build_xls(rows: list[list[object]]) -> bytes:
    """Serialize cell rows into a BIFF8 Workbook stream: strings go
    through a deduplicated SST + LABELSST cells, numbers become NUMBER
    records.  Unicode strings get ``fHighByte`` automatically."""
    strings: list[str] = []
    index: dict[str, int] = {}
    cells: list[bytes] = []
    n_refs = 0
    for rw, row in enumerate(rows):
        for col, v in enumerate(row):
            if isinstance(v, str):
                if v not in index:
                    index[v] = len(strings)
                    strings.append(v)
                n_refs += 1
                cells.append(_biff(0x00FD, struct.pack(
                    "<HHHI", rw, col, 0, index[v])))
            else:
                cells.append(_biff(0x0203, struct.pack(
                    "<HHH", rw, col, 0) + struct.pack("<d", float(v))))
    sst_body = struct.pack("<II", n_refs, len(strings))
    for s in strings:
        high = any(ord(c) > 0xFF for c in s)
        sst_body += struct.pack("<HB", len(s), 0x01 if high else 0x00)
        sst_body += s.encode("utf-16-le") if high else s.encode("latin-1")
    out = _biff(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))  # BOF
    out += _biff(0x00FC, sst_body)
    out += b"".join(cells)
    out += _biff(0x000A, b"")  # EOF
    return out


def build_ppt(slides: list[list[str]]) -> bytes:
    """Serialize slide text lists into a PowerPoint Document stream: one
    Document container (recType 0x03E8) holding per-slide SlideListWithText
    containers (0x0FF0) of TextCharsAtom/TextBytesAtom records (unicode
    picked automatically)."""
    def rec(ver_inst: int, rtype: int, body: bytes) -> bytes:
        return struct.pack("<HHI", ver_inst, rtype, len(body)) + body

    slide_blobs = []
    for texts in slides:
        atoms = b""
        for t in texts:
            if any(ord(c) > 0xFF for c in t):
                atoms += rec(0x0000, _PPT_TEXT_CHARS, t.encode("utf-16-le"))
            else:
                atoms += rec(0x0000, _PPT_TEXT_BYTES, t.encode("latin-1"))
        slide_blobs.append(rec(0x000F, 0x0FF0, atoms))  # SlideListWithText
    return rec(0x000F, 0x03E8, b"".join(slide_blobs))   # Document
