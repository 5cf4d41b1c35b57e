"""OLE2 / CFBF (Compound File Binary Format) reader + minimal writer.

The legacy Microsoft Office container (.doc/.xls/.ppt, MSI, MSG): the
reference routes these through Tika's POI parsers
(``TikaPayloadAnalyser.java:165-414`` maps ``title``/``author`` and friends
into Solr fields); Tika/POI jars don't ship here, so this is a real
pure-stdlib implementation of the two public specs involved:

- [MS-CFB]: the FAT-filesystem-in-a-file container — header, DIFAT, FAT
  sector chains, directory entries (UTF-16LE names, red-black sibling tree
  walked linearly), and the mini-stream/miniFAT tier for streams under the
  4096-byte cutoff.
- [MS-OLEPS]: the ``\\x05SummaryInformation`` property-set stream —
  section/PID offset table, VT_LPSTR (codepage strings), VT_LPWSTR,
  VT_FILETIME, VT_I2/I4.  PIDSI ids: 2 title, 3 subject, 4 author,
  12 create time, 13 save time, 18 application name, 1 codepage.

``build_cfbf`` is the symmetric minimal writer (used by tests and the
correctness gate to synthesize deterministic fixtures — the same
hand-rolled-spec-fixture strategy as the AVI/MP4 tiers): it lays sectors
out in a fixed order (directory, miniFAT, mini stream, large streams, FAT
last) so the byte image is reproducible.

Both sides are bounded and total: malformed input returns ``parse_error``
instead of raising — the per-record recovery contract shared by every
parser in this repo.
"""

from __future__ import annotations

import datetime as _dt
import struct

__all__ = ["ole2_extract", "build_cfbf"]

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_END = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF
_SUMMARY = "\x05SummaryInformation"
_MAX_SECTORS = 1 << 20  # 512 MiB ceiling — loop/bomb guard
_MAX_INPUT = 64 << 20


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


def _filetime_iso(ft: int) -> str | None:
    """FILETIME (100 ns ticks since 1601-01-01 UTC) → ISO string."""
    if not ft:
        return None
    try:
        t = _dt.datetime(1601, 1, 1) + _dt.timedelta(microseconds=ft // 10)
        return t.strftime("%Y-%m-%dT%H:%M:%SZ")
    except OverflowError:
        return None


def _chain(fat: list[int], start: int) -> list[int]:
    """Follow a FAT/miniFAT chain; bounded by the table size (cycle-safe)."""
    out, sec = [], start
    while sec not in (_END, _FREE) and len(out) <= len(fat):
        if sec >= len(fat):
            raise ValueError(f"chain references sector {sec} beyond FAT")
        out.append(sec)
        sec = fat[sec]
    if len(out) > len(fat):
        raise ValueError("FAT chain cycle")
    return out


def _props_from_summary(data: bytes, out: dict) -> None:
    """[MS-OLEPS] SummaryInformation: pull the PIDSI properties we map."""
    if len(data) < 48 or _u16(data, 0) != 0xFFFE:
        return
    n_sets = _u32(data, 24)
    if n_sets < 1:
        return
    sec_off = _u32(data, 44)  # offset of first section (after FMTID+offset)
    if sec_off + 8 > len(data):
        return
    n_props = _u32(data, sec_off + 4)
    codepage = 1252
    props: dict[int, int] = {}
    for i in range(min(n_props, 256)):
        base = sec_off + 8 + i * 8
        if base + 8 > len(data):
            break
        props[_u32(data, base)] = sec_off + _u32(data, base + 4)

    def read_prop(off: int):
        if off + 4 > len(data):
            return None
        vt = _u32(data, off)
        if vt == 30:  # VT_LPSTR
            n = _u32(data, off + 4)
            raw = data[off + 8: off + 8 + n].split(b"\0", 1)[0]
            if codepage == 1200:
                enc = "utf-16-le"
            else:
                # honor the declared codepage (932/1251/… in non-Western
                # docs would otherwise decode as cp1252 mojibake; ADVICE r5)
                import codecs

                try:
                    codecs.lookup(f"cp{codepage}")
                    enc = f"cp{codepage}"
                except LookupError:
                    enc = "cp1252"
            return raw.decode(enc, "replace")
        if vt == 31:  # VT_LPWSTR (length in UTF-16 code units)
            n = _u32(data, off + 4)
            raw = data[off + 8: off + 8 + 2 * n]
            return raw.decode("utf-16-le", "replace").split("\0", 1)[0]
        if vt == 64:  # VT_FILETIME
            return struct.unpack_from("<Q", data, off + 4)[0]
        if vt in (2, 3):  # VT_I2 / VT_I4
            return struct.unpack_from("<h" if vt == 2 else "<i", data, off + 4)[0]
        return None

    if 1 in props:  # PID_CODEPAGE first — it governs VT_LPSTR decoding
        cp = read_prop(props[1])
        if isinstance(cp, int) and cp > 0:
            codepage = cp & 0xFFFF
    for pid, key in ((2, "title"), (3, "subject"), (4, "author"),
                     (18, "app_name")):
        if pid in props:
            v = read_prop(props[pid])
            if isinstance(v, str):
                out[key] = v.strip() or None
    for pid, key in ((12, "created"), (13, "modified")):
        if pid in props:
            v = read_prop(props[pid])
            if isinstance(v, int):
                out[key] = _filetime_iso(v)


def ole2_extract(data: bytes | None,
                 content_for: tuple[str, ...] = ()) -> dict:
    """Parse an OLE2/CFBF container: directory stream listing + the
    ``\\x05SummaryInformation`` properties.  Returns ``{streams,
    n_streams, title, subject, author, app_name, created, modified,
    parse_error}`` — ``streams`` is the directory-order list of stream
    names (storage entries get a trailing ``/``).  When ``content_for``
    names streams, their bytes are additionally returned under
    ``stream_bytes`` (for the Word/Excel content parsers,
    ``functions/docbinary.py``)."""
    out = {"streams": None, "n_streams": None, "title": None, "subject": None,
           "author": None, "app_name": None, "created": None,
           "modified": None, "parse_error": None}
    if content_for:
        out["stream_bytes"] = {}
    if data is None:
        out["parse_error"] = "null payload"
        return out
    data = bytes(data[:_MAX_INPUT])
    try:
        if len(data) < 512 or data[:8] != _MAGIC:
            raise ValueError("not a CFBF container (bad magic)")
        sector_shift = _u16(data, 30)
        mini_shift = _u16(data, 32)
        if sector_shift not in (9, 12) or mini_shift != 6:
            raise ValueError(f"unsupported sector shift {sector_shift}")
        sec_size = 1 << sector_shift
        n_fat = _u32(data, 44)
        first_dir = _u32(data, 48)
        cutoff = _u32(data, 56)
        first_minifat = _u32(data, 60)
        n_minifat = _u32(data, 64)
        first_difat = _u32(data, 68)
        n_difat = _u32(data, 72)
        if n_fat > _MAX_SECTORS or n_difat > _MAX_SECTORS:
            raise ValueError("FAT size exceeds cap")

        def sector(i: int) -> bytes:
            off = 512 + i * sec_size
            if off + sec_size > len(data):
                raise ValueError(f"sector {i} beyond EOF")
            return data[off: off + sec_size]

        # DIFAT: 109 header entries + chained DIFAT sectors
        difat = [_u32(data, 76 + 4 * i) for i in range(109)]
        dsec = first_difat
        for _ in range(n_difat):
            if dsec in (_END, _FREE):
                break
            blk = sector(dsec)
            difat += [_u32(blk, 4 * i) for i in range(sec_size // 4 - 1)]
            dsec = _u32(blk, sec_size - 4)
        fat_sectors = [s for s in difat if s != _FREE][:n_fat]
        fat: list[int] = []
        for s in fat_sectors:
            blk = sector(s)
            fat += [_u32(blk, 4 * i) for i in range(sec_size // 4)]

        def read_chain(start: int, size: int | None = None) -> bytes:
            if start in (_END, _FREE):
                return b""
            raw = b"".join(sector(s) for s in _chain(fat, start))
            return raw if size is None else raw[:size]

        # directory entries, linear walk of the directory chain
        dir_raw = read_chain(first_dir)
        entries = []
        for off in range(0, len(dir_raw) - 127, 128):
            ent = dir_raw[off: off + 128]
            nlen = _u16(ent, 64)
            etype = ent[66]
            if etype == 0 or nlen < 2:
                continue
            name = ent[: min(nlen - 2, 64)].decode("utf-16-le", "replace")
            entries.append({
                "name": name, "type": etype,
                "start": _u32(ent, 116),
                "size": struct.unpack_from("<Q", ent, 120)[0],
            })
        if not entries or entries[0]["type"] != 5:
            raise ValueError("no root directory entry")
        root = entries[0]

        # mini tier: miniFAT chain + the root entry's mini stream
        minifat: list[int] = []
        msec = first_minifat
        for _ in range(n_minifat):
            if msec in (_END, _FREE):
                break
            blk = sector(msec)
            minifat += [_u32(blk, 4 * i) for i in range(sec_size // 4)]
            msec = fat[msec] if msec < len(fat) else _END
        mini_stream = read_chain(root["start"], root["size"])

        def read_stream(ent: dict) -> bytes:
            if ent["size"] == 0:
                return b""
            if ent["size"] < cutoff and ent is not root:
                secs = _chain(minifat, ent["start"])
                raw = b"".join(
                    mini_stream[s * 64: (s + 1) * 64] for s in secs)
                return raw[: ent["size"]]
            return read_chain(ent["start"], ent["size"])

        names = []
        for ent in entries[1:]:
            names.append(ent["name"] + ("/" if ent["type"] == 1 else ""))
            if ent["name"] == _SUMMARY and ent["type"] == 2:
                _props_from_summary(read_stream(ent), out)
            elif ent["name"] in content_for and ent["type"] == 2:
                out["stream_bytes"][ent["name"]] = read_stream(ent)
        out["streams"] = names
        out["n_streams"] = len(names)
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


# ---------------------------------------------------------------------------
# Minimal symmetric writer (fixtures; deterministic layout)
# ---------------------------------------------------------------------------

def _dir_entry(name: str, etype: int, start: int, size: int,
               left: int = _NOSTREAM, right: int = _NOSTREAM,
               child: int = _NOSTREAM) -> bytes:
    raw = name.encode("utf-16-le")
    if len(raw) > 62:
        raise ValueError("directory name too long")
    ent = raw + b"\0" * (64 - len(raw))
    ent += struct.pack("<HBB", len(raw) + 2, etype, 1)
    ent += struct.pack("<III", left, right, child)
    ent += b"\0" * 16 + b"\0" * 4 + b"\0" * 16  # CLSID, state, times
    ent += struct.pack("<IQ", start, size)
    assert len(ent) == 128
    return ent


def build_cfbf(streams: dict[str, bytes]) -> bytes:
    """Serialize ``streams`` into a v3 (512-byte-sector) CFBF image.
    Streams under the 4096-byte cutoff go to the mini stream via the
    miniFAT; the rest get FAT chains.  Sector layout is fixed
    (directory, miniFAT, mini stream, large streams, FAT) so output is
    deterministic."""
    SEC, MINI, CUTOFF = 512, 64, 4096
    names = list(streams)
    minis = [n for n in names if len(streams[n]) < CUTOFF]
    bigs = [n for n in names if len(streams[n]) >= CUTOFF]

    # mini tier
    minifat: list[int] = []
    mini_start: dict[str, int] = {}
    mini_parts: list[bytes] = []
    for n in minis:
        d = streams[n]
        nsec = max(1, -(-len(d) // MINI))
        mini_start[n] = len(minifat)
        minifat += list(range(len(minifat) + 1, len(minifat) + nsec)) + [_END]
        mini_parts.append(d + b"\0" * (nsec * MINI - len(d)))
    mini_data = b"".join(mini_parts)

    n_dir = -(-(1 + len(names)) // 4) or 1
    n_minifat_sec = -(-len(minifat) // (SEC // 4)) if minifat else 0
    n_ministream = -(-len(mini_data) // SEC) if mini_data else 0
    big_secs = {n: max(1, -(-len(streams[n]) // SEC)) for n in bigs}
    n_data = n_dir + n_minifat_sec + n_ministream + sum(big_secs.values())
    n_fat = 1
    while -(-(n_data + n_fat) // (SEC // 4)) > n_fat:
        n_fat += 1

    # sector ids
    dir_first = 0
    minifat_first = n_dir if n_minifat_sec else _END
    ministream_first = n_dir + n_minifat_sec if n_ministream else _END
    big_first: dict[str, int] = {}
    cur = n_dir + n_minifat_sec + n_ministream
    for n in bigs:
        big_first[n] = cur
        cur += big_secs[n]
    fat_first = cur
    total = cur + n_fat

    fat = [_FREE] * (n_fat * (SEC // 4))

    def chain(first: int, count: int) -> None:
        for i in range(count):
            fat[first + i] = first + i + 1 if i < count - 1 else _END

    chain(dir_first, n_dir)
    if n_minifat_sec:
        chain(minifat_first, n_minifat_sec)
    if n_ministream:
        chain(ministream_first, n_ministream)
    for n in bigs:
        chain(big_first[n], big_secs[n])
    for i in range(n_fat):
        fat[fat_first + i] = _FATSECT

    # directory: root (child = first entry), then a right-sibling chain
    entries = [_dir_entry(
        "Root Entry", 5, ministream_first, len(mini_data),
        child=1 if names else _NOSTREAM)]
    for i, n in enumerate(names):
        start = mini_start[n] if n in mini_start else big_first[n]
        if not streams[n] and n in mini_start:
            pass  # zero-length streams still get one mini sector
        entries.append(_dir_entry(
            n, 2, start, len(streams[n]),
            right=i + 2 if i + 1 < len(names) else _NOSTREAM))
    dir_data = b"".join(entries)
    dir_data += b"\0" * (n_dir * SEC - len(dir_data))

    minifat_data = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_data += b"\xff" * (n_minifat_sec * SEC - len(minifat_data))
    mini_data += b"\0" * (n_ministream * SEC - len(mini_data))
    big_data = b"".join(
        streams[n] + b"\0" * (big_secs[n] * SEC - len(streams[n]))
        for n in bigs)
    fat_data = b"".join(struct.pack("<I", v) for v in fat)

    if n_fat > 109:
        raise ValueError("fixture writer caps at 109 FAT sectors")
    header = _MAGIC + b"\0" * 16
    header += struct.pack("<HHHHH", 0x3E, 3, 0xFFFE, 9, 6)
    header += b"\0" * 6
    header += struct.pack("<IIIIIIIII", 0, n_fat, dir_first, 0, CUTOFF,
                          minifat_first, n_minifat_sec, _END, 0)
    difat = [fat_first + i for i in range(n_fat)]
    difat += [_FREE] * (109 - len(difat))
    header += b"".join(struct.pack("<I", v) for v in difat)
    assert len(header) == 512
    image = header + dir_data + minifat_data + mini_data + big_data + fat_data
    assert len(image) == 512 + total * SEC
    return image


def build_summary_information(title: str | None = None,
                              subject: str | None = None,
                              author: str | None = None,
                              app_name: str | None = None,
                              created_filetime: int = 0,
                              modified_filetime: int = 0) -> bytes:
    """Serialize a minimal [MS-OLEPS] SummaryInformation stream
    (codepage 1252, one section)."""
    props: list[tuple[int, bytes]] = [(1, struct.pack("<Ih", 2, 1252) + b"\0\0")]
    for pid, v in ((2, title), (3, subject), (4, author), (18, app_name)):
        if v is not None:
            raw = v.encode("cp1252", "replace") + b"\0"
            pad = (4 - len(raw) % 4) % 4
            props.append((pid, struct.pack("<II", 30, len(raw)) + raw + b"\0" * pad))
    for pid, ft in ((12, created_filetime), (13, modified_filetime)):
        if ft:
            props.append((pid, struct.pack("<IQ", 64, ft)))
    table_len = 8 + 8 * len(props)
    offs, body, cur = [], b"", table_len
    for pid, blob in props:
        offs.append((pid, cur))
        body += blob
        cur += len(blob)
    section = struct.pack("<II", table_len + len(body), len(props))
    section += b"".join(struct.pack("<II", pid, off) for pid, off in offs)
    section += body
    fmtid = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")  # FMTID_SummaryInformation
    head = struct.pack("<HHI", 0xFFFE, 0, 0x0002_0105) + b"\0" * 16
    head += struct.pack("<I", 1) + fmtid + struct.pack("<I", 48)
    return head + section
