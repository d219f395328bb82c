"""Minimal legacy .xls (BIFF8-in-CFB) reader — stdlib `struct` only.

A legacy Excel file is an OLE2/CFB compound document (MS-CFB) whose
"Workbook" (or "Book") stream holds BIFF8 records (MS-XLS). The
reference world still receives old Excel linelists (read_all_data's
extension dispatch routes *.xls, read_all_data.Rmd:51-64), and this
container has no pandas xls engine — so the read path vendors the
subset of both specs a linelist actually needs:

  CFB:  header, DIFAT -> FAT, directory, regular sector chains, and
        the mini-FAT/ministream (streams under the 4096-byte cutoff
        live there — which is exactly where a small linelist lands).
  BIFF: BOUNDSHEET sheet discovery, the SST shared-string table
        including CONTINUE spanning (with the per-boundary option-byte
        restart the format is infamous for), and the cell records
        LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR / BLANK /
        FORMULA (cached numeric/bool/STRING results).

Output contract: `xls_grid(path, sheet)` returns the same rectangular
all-string grid `_xlsx_grid` produces for modern files — rows in sheet
order, absent cells None, numerics rendered the way SpreadsheetML
would serialize them — so `read_any` post-processes both formats
through one code path (header mangling, NA vocabulary, provenance).

Every value decode is pure and total: malformed records raise
ValueError with the record offset, never a struct.error, so a corrupt
submission names itself instead of failing as noise.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


def _chain(buf: bytes, table: list[int], start: int, sect: int,
           base: int) -> bytes:
    """Concatenate a sector chain; cycle-guarded (a corrupt FAT loop
    must error, not hang the executor)."""
    out = bytearray()
    s = start
    seen = 0
    while s not in (_ENDCHAIN, _FREE):
        if s >= len(table) or seen > len(table):
            raise ValueError(f"broken CFB sector chain at sector {s}")
        out += buf[base + s * sect: base + (s + 1) * sect]
        s = table[s]
        seen += 1
    return bytes(out)


def cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first stream whose name is in `names` from a CFB
    compound document (regular or ministream storage)."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (bad magic)")
    sector_shift, mini_shift = struct.unpack_from("<HH", data, 30)
    ssz, msz = 1 << sector_shift, 1 << mini_shift
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    difat_start, num_difat = struct.unpack_from("<II", data, 68)
    per = ssz // 4
    difat = list(struct.unpack_from("<109I", data, 76))
    s = difat_start
    for _ in range(num_difat):
        ents = struct.unpack_from(f"<{per}I", data, 512 + s * ssz)
        difat += ents[:-1]
        s = ents[-1]
        if s in (_ENDCHAIN, _FREE):
            break
    fat: list[int] = []
    for fs in difat:
        if fs in (_FREE, _ENDCHAIN, _FATSECT, _DIFSECT):
            continue
        fat += struct.unpack_from(f"<{per}I", data, 512 + fs * ssz)

    directory = _chain(data, fat, dir_start, ssz, 512)
    root = None
    target = None
    for off in range(0, len(directory) - 127, 128):
        e = directory[off:off + 128]
        nlen = struct.unpack_from("<H", e, 64)[0]
        name = e[:max(0, nlen - 2)].decode("utf-16-le", "ignore")
        etype = e[66]
        estart = struct.unpack_from("<I", e, 116)[0]
        esize = struct.unpack_from("<I", e, 120)[0]
        if etype == 5:
            root = (estart, esize)
        elif etype == 2 and name in names and target is None:
            target = (estart, esize)
    if target is None:
        raise ValueError(f"CFB stream {names} not found")
    start, size = target
    if size >= mini_cutoff:
        return _chain(data, fat, start, ssz, 512)[:size]
    if root is None:
        raise ValueError("CFB ministream without a root entry")
    ministream = _chain(data, fat, root[0], ssz, 512)
    raw = _chain(data, fat, minifat_start, ssz, 512)
    minifat = list(struct.unpack_from(f"<{len(raw) // 4}I", raw, 0))
    return _chain(ministream, minifat, start, msz, 0)[:size]


def _records(stream: bytes):
    """Yield (opcode, payload_start, payload_len) over a BIFF stream."""
    i = 0
    n = len(stream)
    while i + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, i)
        if i + 4 + ln > n:
            raise ValueError(f"truncated BIFF record 0x{op:04x} at {i}")
        yield op, i + 4, ln
        i += 4 + ln


class _Parts:
    """Reader over SST + CONTINUE payload fragments. Plain reads span
    fragment boundaries transparently; string-character reads restart
    the compressed/wide option byte at each boundary (MS-XLS 2.5.293:
    every CONTINUE fragment begins with a fresh grbit when it starts
    mid-string) — the one place BIFF is not a flat byte stream."""

    def __init__(self, frags: list[bytes]):
        self.frags = frags
        self.fi = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.off

    def _advance(self) -> None:
        while self.fi < len(self.frags) and self._avail() == 0:
            self.fi += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise ValueError("SST ran past its CONTINUE fragments")
            take = min(n, self._avail())
            f = self.frags[self.fi]
            out += f[self.off:self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        wide = flags & 0x01
        rich = struct.unpack("<H", self.read(2))[0] if flags & 0x08 else 0
        ext = struct.unpack("<I", self.read(4))[0] if flags & 0x04 else 0
        chars: list[str] = []
        left = cch
        while left > 0:
            self._advance()
            if self.fi >= len(self.frags):
                raise ValueError("string ran past its CONTINUE fragments")
            if self.off == 0 and chars:
                # mid-string fragment boundary: fresh option byte
                wide = self.read(1)[0] & 0x01
            take = min(left, self._avail() // (2 if wide else 1))
            if take == 0:  # a lone byte of a wide char can't split
                raise ValueError("char split across CONTINUE fragments")
            raw = self.read(take * (2 if wide else 1))
            chars.append(raw.decode("utf-16-le" if wide else "latin-1"))
            left -= take
        if rich:
            self.read(rich * 4)
        if ext:
            self.read(ext)
        return "".join(chars)


def _short_string(payload: bytes, off: int) -> str:
    """ShortXLUnicodeString (u8 length) — sheet names."""
    cch = payload[off]
    flags = payload[off + 1]
    if flags & 0x01:
        return payload[off + 2:off + 2 + cch * 2].decode("utf-16-le")
    return payload[off + 2:off + 2 + cch].decode("latin-1")


def _num_str(v: float) -> str:
    """Render a BIFF double the way SpreadsheetML serializes it (the
    xlsx path's raw <v> text): integers bare, else shortest float."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _rk_value(rk: int) -> float:
    v: float
    if rk & 0x02:  # 30-bit signed integer
        iv = rk >> 2
        if iv >= 1 << 29:
            iv -= 1 << 30
        v = float(iv)
    else:  # high 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return v / 100.0 if rk & 0x01 else v


def _sheet_entries(wb: bytes) -> tuple[list[tuple[str, int]], list[str]]:
    """One pass over the workbook-globals substream: worksheet
    BOUNDSHEETs as (name, stream_pos) plus the SST string list."""
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    sst_frags: list[bytes] = []
    sst_open = False
    unique = 0
    for op, start, ln in _records(wb):
        if sst_open and op == 0x003C:  # CONTINUE
            sst_frags.append(wb[start:start + ln])
            continue
        if sst_open:
            sst_open = False
            parts = _Parts(sst_frags)
            sst = [parts.read_string() for _ in range(unique)]
        if op == 0x0085:  # BOUNDSHEET
            pos = struct.unpack_from("<I", wb, start)[0]
            sheet_type = wb[start + 5]
            if sheet_type == 0x00:  # worksheet (not chart/macro)
                sheets.append((_short_string(wb, start + 6), pos))
        elif op == 0x00FC:  # SST
            unique = struct.unpack_from("<I", wb, start + 4)[0]
            sst_frags = [wb[start + 8:start + ln]]
            sst_open = True
        elif op == 0x000A:  # EOF of the globals substream
            break
    if sst_open:
        parts = _Parts(sst_frags)
        sst = [parts.read_string() for _ in range(unique)]
    return sheets, sst


def _sheet_cells(wb: bytes, pos: int,
                 sst: list[str]) -> dict[tuple[int, int], str]:
    """Scan one worksheet substream into {(row, col): text}."""
    sub = wb[pos:]
    cells: dict[tuple[int, int], str] = {}
    pending_formula: tuple[int, int] | None = None
    for op, start, ln in _records(sub):
        if op == 0x00FD:  # LABELSST
            r, c, _, isst = struct.unpack_from("<HHHI", sub, start)
            cells[(r, c)] = sst[isst]
        elif op == 0x0204:  # LABEL (inline BIFF8 string)
            r, c = struct.unpack_from("<HH", sub, start)
            cells[(r, c)] = _Parts([sub[start + 6:start + ln]]) \
                .read_string()
        elif op == 0x0203:  # NUMBER
            r, c, _, v = struct.unpack_from("<HHHd", sub, start)
            cells[(r, c)] = _num_str(v)
        elif op == 0x027E:  # RK
            r, c, _, rk = struct.unpack_from("<HHHI", sub, start)
            cells[(r, c)] = _num_str(_rk_value(rk))
        elif op == 0x00BD:  # MULRK: run of RK cells in one row
            r, c0 = struct.unpack_from("<HH", sub, start)
            n = (ln - 6) // 6
            for j in range(n):
                rk = struct.unpack_from("<I", sub, start + 4 + j * 6 + 2)[0]
                cells[(r, c0 + j)] = _num_str(_rk_value(rk))
        elif op == 0x0205:  # BOOLERR
            r, c, _, val, err = struct.unpack_from("<HHHBB", sub, start)
            if not err:  # error cells read as absent, like xlsx
                cells[(r, c)] = "True" if val else "False"
        elif op == 0x0006:  # FORMULA: 8-byte cached result
            r, c = struct.unpack_from("<HH", sub, start)
            res = sub[start + 6:start + 14]
            if res[6:8] == b"\xff\xff":
                kind = res[0]
                if kind == 0x00:  # string result in the next STRING rec
                    pending_formula = (r, c)
                elif kind == 0x01:
                    cells[(r, c)] = "True" if res[2] else "False"
                elif kind == 0x03:
                    cells[(r, c)] = ""
                # 0x02 (error) reads as absent
            else:
                cells[(r, c)] = _num_str(
                    struct.unpack("<d", res)[0])
        elif op == 0x0207 and pending_formula is not None:  # STRING
            cells[pending_formula] = _Parts([sub[start:start + ln]]) \
                .read_string()
            pending_formula = None
        elif op == 0x000A:  # EOF of this sheet
            break
    return cells


def xls_grid(path: str, sheet: str | int = 0) -> list[list[str | None]]:
    """Legacy-.xls counterpart of `_xlsx_grid`: the selected worksheet
    as a rectangular grid of str/None in sheet-row order, absent and
    error cells None, rows Excel never serialized materialized as
    all-None (the blank-row alignment rule the xlsx path documents)."""
    with open(path, "rb") as f:
        data = f.read()
    wb = cfb_stream(data, ("Workbook", "Book"))
    sheets, sst = _sheet_entries(wb)
    if not sheets:
        raise ValueError(f"no worksheets in {path}")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f"sheet index {sheet} out of range "
                             f"({len(sheets)} sheets)")
        _, pos = sheets[sheet]
    else:
        hits = [p for n, p in sheets if n == sheet]
        if not hits:
            raise ValueError(f"sheet {sheet!r} not found; workbook has "
                             f"{[n for n, _ in sheets]}")
        pos = hits[0]
    cells = _sheet_cells(wb, pos, sst)
    if not cells:
        return []
    nrows = max(r for r, _ in cells) + 1
    width = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(width)]
            for r in range(nrows)]
