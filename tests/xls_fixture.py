"""Synthesize minimal-but-valid legacy .xls fixtures (CFB + BIFF8).

Test-side counterpart of sources/xls_biff.py: writes just enough of
MS-CFB and MS-XLS for a spec-conformant file — independent record
layouts, not a mirror of the reader's parse tables — so the round-trip
test exercises real container geometry: regular-FAT streams (>= 4096
bytes), ministream streams (< 4096), an SST that spans a CONTINUE
record WITH a mid-string split + option-byte restart, wide (UTF-16)
strings, and every cell record the reader claims (NUMBER, RK both
encodings, MULRK, LABELSST, LABEL, BOOLERR, FORMULA cached
number/string/bool + STRING).
"""

from __future__ import annotations

import struct

FREE = 0xFFFFFFFF
ENDCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _xl_string(s: str) -> bytes:
    """XLUnicodeString (u16 length) — compressed when latin-1 fits."""
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(s), 0x00) + raw
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 0x01) + s.encode("utf-16-le")


def _short_string(s: str) -> bytes:
    raw = s.encode("latin-1")
    return struct.pack("<BB", len(raw), 0x00) + raw


def _bof(dt: int) -> bytes:
    # vers, dt, rupBuild, rupYear, bfh, sfo
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))


def _sst(strings: list[str], split_last: bool) -> bytes:
    """SST record; if split_last, the final string's characters break
    across a CONTINUE record with the mandatory fresh option byte."""
    head = struct.pack("<II", len(strings), len(strings))
    if not split_last:
        return _rec(0x00FC, head + b"".join(_xl_string(s)
                                            for s in strings))
    body = b"".join(_xl_string(s) for s in strings[:-1])
    last = strings[-1]
    cut = max(1, len(last) // 2)
    first = struct.pack("<HB", len(last), 0x00) \
        + last[:cut].encode("latin-1")
    cont = bytes([0x00]) + last[cut:].encode("latin-1")
    return _rec(0x00FC, head + body + first) + _rec(0x003C, cont)


def _cell_number(r: int, c: int, v: float) -> bytes:
    return _rec(0x0203, struct.pack("<HHHd", r, c, 0, v))


def _rk(v: float, as_int: bool, x100: bool = False) -> int:
    if as_int:
        iv = round(v * 100) if x100 else int(v)
        return ((iv & 0x3FFFFFFF) << 2) | (0x01 if x100 else 0) | 0x02
    dv = v * 100 if x100 else v
    bits = struct.unpack("<Q", struct.pack("<d", dv))[0]
    return int((bits >> 32) & ~0x3) | (0x01 if x100 else 0)


def _cell_rk(r: int, c: int, rk: int) -> bytes:
    return _rec(0x027E, struct.pack("<HHHI", r, c, 0, rk))


def _cell_mulrk(r: int, c0: int, rks: list[int]) -> bytes:
    body = struct.pack("<HH", r, c0)
    for rk in rks:
        body += struct.pack("<HI", 0, rk)
    body += struct.pack("<H", c0 + len(rks) - 1)
    return _rec(0x00BD, body)


def _cell_labelsst(r: int, c: int, isst: int) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))


def _cell_label(r: int, c: int, s: str) -> bytes:
    return _rec(0x0204, struct.pack("<HHH", r, c, 0) + _xl_string(s))


def _cell_boolerr(r: int, c: int, val: bool | None) -> bytes:
    if val is None:  # error cell (#DIV/0!)
        return _rec(0x0205, struct.pack("<HHHBB", r, c, 0, 0x07, 1))
    return _rec(0x0205, struct.pack("<HHHBB", r, c, 0, int(val), 0))


def _cell_formula_num(r: int, c: int, v: float) -> bytes:
    # grbit, chn, cce=0 (empty parsed formula)
    return _rec(0x0006, struct.pack("<HHHd", r, c, 0, v)
                + struct.pack("<HIH", 0, 0, 0))


def _cell_formula_str(r: int, c: int, s: str) -> bytes:
    cached = b"\x00" + b"\x00" * 5 + b"\xff\xff"
    return (_rec(0x0006, struct.pack("<HHH", r, c, 0) + cached
                 + struct.pack("<HIH", 0, 0, 0))
            + _rec(0x0207, _xl_string(s)))


def build_workbook_stream(sheets: list[tuple[str, list[bytes]]],
                          sst_strings: list[str],
                          split_sst: bool = False,
                          pad_to: int = 0) -> bytes:
    """Assemble the BIFF8 Workbook stream: globals substream
    (BOF + BOUNDSHEETs with patched positions + SST + EOF) followed by
    one substream per sheet. `pad_to` appends harmless trailing bytes
    AFTER the final EOF to force regular-FAT storage."""
    sheet_blobs = [
        _bof(0x0010) + b"".join(cells) + _rec(0x000A, b"")
        for _, cells in sheets]
    # globals length depends on BOUNDSHEET name lengths only
    bs_stubs = [_rec(0x0085, struct.pack("<IBB", 0, 0, 0)
                     + _short_string(name)) for name, _ in sheets]
    globals_len = (len(_bof(0x0005)) + sum(len(b) for b in bs_stubs)
                   + len(_sst(sst_strings, split_sst))
                   + len(_rec(0x000A, b"")))
    positions = []
    acc = globals_len
    for blob in sheet_blobs:
        positions.append(acc)
        acc += len(blob)
    bss = [_rec(0x0085, struct.pack("<IBB", pos, 0, 0)
                + _short_string(name))
           for (name, _), pos in zip(sheets, positions)]
    stream = (_bof(0x0005) + b"".join(bss)
              + _sst(sst_strings, split_sst) + _rec(0x000A, b"")
              + b"".join(sheet_blobs))
    if pad_to > len(stream):
        stream += b"\x00" * (pad_to - len(stream))
    return stream


def _dir_entry(name: str, etype: int, start: int, size: int,
               child: int = FREE) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0:len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, FREE, FREE, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<I", e, 120, size)
    return bytes(e)


def build_cfb(stream: bytes, stream_name: str = "Workbook") -> bytes:
    """Wrap a payload stream in a v3 CFB container (512-byte sectors,
    64-byte mini sectors, 4096 cutoff). Streams under the cutoff are
    stored in the ministream via the mini-FAT, as the spec requires —
    which is exactly the path a small linelist exercises."""
    ssz, msz, cutoff = 512, 64, 4096

    def sectors(b: bytes, size: int) -> list[bytes]:
        out = [b[i:i + size] for i in range(0, len(b), size)]
        if out and len(out[-1]) < size:
            out[-1] = out[-1] + b"\x00" * (size - len(out[-1]))
        return out

    mini = len(stream) < cutoff
    fat: list[int] = [FATSECT]  # sector 0: the FAT itself
    body: list[bytes] = []

    fat.append(ENDCHAIN)  # sector 1: directory (single sector)
    dir_sector_idx = 1

    if mini:
        ministream = stream
        mini_secs = sectors(ministream, msz)
        minifat = [i + 1 for i in range(len(mini_secs) - 1)] + [ENDCHAIN]
        minifat += [FREE] * (ssz // 4 - len(minifat))
        fat.append(ENDCHAIN)  # sector 2: mini-FAT (single sector)
        minifat_start, n_minifat = 2, 1
        body.append(struct.pack(f"<{ssz // 4}I", *minifat))
        ms_secs = sectors(ministream, ssz)
        first_ms = len(fat)
        fat += [first_ms + i + 1 for i in range(len(ms_secs) - 1)] \
            + [ENDCHAIN]
        body += ms_secs
        root = _dir_entry("Root Entry", 5, first_ms, len(ministream),
                          child=1)
        wb = _dir_entry(stream_name, 2, 0, len(stream))
    else:
        minifat_start, n_minifat = ENDCHAIN, 0
        st_secs = sectors(stream, ssz)
        first_st = len(fat)
        fat += [first_st + i + 1 for i in range(len(st_secs) - 1)] \
            + [ENDCHAIN]
        body += st_secs
        root = _dir_entry("Root Entry", 5, ENDCHAIN, 0, child=1)
        wb = _dir_entry(stream_name, 2, first_st, len(stream))

    directory = root + wb + b"\x00" * (ssz - 256)
    fat += [FREE] * (ssz // 4 - len(fat))

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)    # sector/mini shifts
    struct.pack_into("<I", header, 44, 1)        # 1 FAT sector
    struct.pack_into("<I", header, 48, dir_sector_idx)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into("<II", header, 60, minifat_start, n_minifat)
    struct.pack_into("<II", header, 68, ENDCHAIN, 0)  # no extra DIFAT
    struct.pack_into("<I", header, 76, 0)        # DIFAT[0] = FAT sector
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + i * 4, FREE)

    return (bytes(header)
            + struct.pack(f"<{ssz // 4}I", *fat)
            + directory
            + b"".join(body))


def write_linelist_xls(path: str, *, big: bool = False) -> None:
    """The canonical fixture: a 2-sheet workbook whose 'Linelist'
    sheet holds one of every cell record; `big` pads the stream past
    the 4096 cutoff to exercise regular-FAT storage (otherwise it
    lands in the ministream)."""
    sst = ["specimen_id", "collected", "status", "naïve-résumé ✓",
           "a-shared-string-long-enough-to-split-over-a-continue"]
    linelist = [
        _cell_labelsst(0, 0, 0), _cell_labelsst(0, 1, 1),
        _cell_labelsst(0, 2, 2), _cell_label(0, 3, "note"),
        # row 1: strings incl. wide + the CONTINUE-split one
        _cell_labelsst(1, 0, 3), _cell_labelsst(1, 1, 4),
        _cell_label(1, 2, "Pending"), _cell_boolerr(1, 3, True),
        # row 2: numerics in every encoding
        _cell_number(2, 0, 3.25), _cell_rk(2, 1, _rk(7, as_int=True)),
        _cell_rk(2, 2, _rk(1.27, as_int=True, x100=True)),
        _cell_rk(2, 3, _rk(2.5, as_int=False)),
        # row 4 (row 3 intentionally absent): MULRK + formulas + error
        _cell_mulrk(4, 0, [_rk(10, as_int=True), _rk(11, as_int=True),
                           _rk(0.005, as_int=False, x100=True)]),
        _cell_formula_num(4, 3, 42.0),
        _cell_formula_str(5, 0, "calc"), _cell_boolerr(5, 1, None),
    ]
    other = [_cell_label(0, 0, "ignore-me")]
    stream = build_workbook_stream(
        [("Linelist", linelist), ("Notes", other)], sst,
        split_sst=True, pad_to=5000 if big else 0)
    with open(path, "wb") as f:
        f.write(build_cfb(stream))
