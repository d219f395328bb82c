"""Multimodal column pattern: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas (SURVEY north-star extension;
the reference's closest analog is raw-JSON archival F20
functions.R:229-236 — payload travels as an opaque column with
lineage).

The decode step is REAL: a pure-stdlib (struct + zlib) byte-level
parser for BMP (BITMAPINFOHEADER / BITMAPCOREHEADER), PNG (magic +
IHDR with CRC verification) and JPEG (marker-segment scan to the
SOFn frame header) recovers true width/height/bit-depth from actual
file bytes — no PIL required. The payload SYNTHESIS is the fixture
half (this container ships no image files): `synth_image_bytes`
writes byte-exact spec-conformant BMP/PNG/JPEG files, so the decoder
is exercised against real formats end to end. Swap the synthesizer
for `spark.read.format("binaryFile")` on a cluster with real assets;
the decode stage is production code as-is. Audio/video codecs would
follow the same mapInPandas shape with a library decoder.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of the real decoder
DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("bit_depth", T.IntegerType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out: str = "payload") -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text column stand in
    for an opaque blob (binary type + metadata columns)."""
    return df.withColumn(out, F.encode(F.col(text_col), "utf-8"))


def _px(x: int, y: int) -> int:
    """Deterministic pixel value — makes every synthesized image
    byte-unique per (w, h) without any RNG."""
    return (x * 7 + y * 13) % 256


def synth_image_bytes(width: int, height: int, fmt: str) -> bytes:
    """Write a real, spec-conformant image file from scratch.

    fmt='bmp': 24-bit BITMAPINFOHEADER BMP with 4-byte row padding.
    fmt='png': 8-bit grayscale PNG — signature, IHDR (+CRC), one
    zlib-deflated IDAT of filter-0 scanlines, IEND.
    fmt='jpeg': baseline JFIF — SOI, APP0, DQT, SOF0 (8-bit, 3
    components), DHT, SOS, deterministic entropy bytes (never 0xFF,
    so no fake markers), EOI.
    """
    if fmt == "bmp":
        row = (width * 3 + 3) // 4 * 4
        size = 54 + row * height
        header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                          row * height, 2835, 2835, 0, 0)
        px = bytearray()
        for y in range(height):          # BMP stores rows bottom-up
            for x in range(width):
                px += bytes((_px(x, y),)) * 3
            px += b"\x00" * (row - width * 3)
        return header + dib + bytes(px)
    if fmt == "png":
        def chunk(typ: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + typ + data
                    + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        raw = b"".join(
            b"\x00" + bytes(_px(x, y) for x in range(width))
            for y in range(height))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    if fmt == "jpeg":
        def seg(marker: int, data: bytes) -> bytes:
            return (bytes((0xFF, marker)) + struct.pack(">H", len(data) + 2)
                    + data)
        app0 = seg(0xE0, b"JFIF\x00" + bytes((1, 1, 0))
                   + struct.pack(">HH", 1, 1) + bytes((0, 0)))
        dqt = seg(0xDB, bytes((0,))
                  + bytes((_px(i, 0) % 254) + 1 for i in range(64)))
        sof0 = seg(0xC0, struct.pack(">BHH", 8, height, width)
                   + bytes((3,))
                   + b"".join(bytes((cid, 0x11, 0)) for cid in (1, 2, 3)))
        dht = seg(0xC4, bytes((0x00, 1)) + bytes(15) + bytes((0,)))
        sos = seg(0xDA, bytes((3,))
                  + b"".join(bytes((cid, 0x00)) for cid in (1, 2, 3))
                  + bytes((0, 63, 0)))
        entropy = bytes(_px(x, y) % 0xFF            # in [0,254]: no 0xFF
                        for y in range(height) for x in range(min(width, 8)))
        return b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + entropy \
            + b"\xff\xd9"
    raise ValueError(f"unknown format {fmt!r}")


#: SOFn frame-header markers — C0-CF minus DHT (C4), JPG (C8), DAC (CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def decode_image_bytes(payload: bytes) -> tuple[str, int | None,
                                                int | None, int | None]:
    """Parse real image bytes -> (format, width, height, bit_depth).

    PNG: 8-byte signature, then IHDR must be the first chunk (per
    spec); its CRC is verified with zlib.crc32 — a corrupt header
    yields ('png_corrupt', None, None, None) rather than garbage
    dimensions; zero or >2^31-1 dimensions are corrupt too (a
    CRC-valid crafted IHDR must not overflow the IntegerType Arrow
    conversion and kill the task). BMP: 'BM' magic; BITMAPINFOHEADER
    (dib >= 40, signed dims, |height| handles top-down files) or the
    legacy BITMAPCOREHEADER (dib == 12, unsigned 16-bit dims). JPEG:
    SOI magic, then a marker-segment walk to the first SOFn frame
    header (skipping fill bytes and standalone markers, validating
    every segment length against the payload) — reaching SOS/EOI or
    running out of bytes without a frame header is 'jpeg_corrupt';
    height 0 (the DNL deferred-height form) is treated as corrupt.
    Anything else is ('unknown', ...) — decode failures are data, not
    exceptions, so one bad blob never kills a 100 TB scan task."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 33:
        (length,) = struct.unpack(">I", payload[8:12])
        # a lying/truncating chunk length must degrade to corrupt, not
        # crash the unpack below on an empty CRC slice
        if length < 10 or 20 + length > len(payload):
            return ("png_corrupt", None, None, None)
        typ, data = payload[12:16], payload[16:16 + length]
        (crc,) = struct.unpack(">I", payload[16 + length:20 + length])
        if typ != b"IHDR" \
                or zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            return ("png_corrupt", None, None, None)
        w, h, depth, _color = struct.unpack(">IIBB", data[:10])
        if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
            return ("png_corrupt", None, None, None)
        return ("png", w, h, depth)
    if payload[:2] == b"\xff\xd8":
        pos, n = 2, len(payload)
        while True:
            if pos + 4 > n or payload[pos] != 0xFF:
                return ("jpeg_corrupt", None, None, None)
            marker = payload[pos + 1]
            if marker == 0xFF:               # fill byte, resync
                pos += 1
                continue
            if marker in (0xD9, 0xDA):       # EOI/SOS before any SOF
                return ("jpeg_corrupt", None, None, None)
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", payload[pos + 2:pos + 4])
            if seglen < 2 or pos + 2 + seglen > n:
                return ("jpeg_corrupt", None, None, None)
            if marker in _SOF_MARKERS:
                if seglen < 7:
                    return ("jpeg_corrupt", None, None, None)
                prec, h, w = struct.unpack(">BHH", payload[pos + 4:pos + 9])
                if w == 0 or h == 0:
                    return ("jpeg_corrupt", None, None, None)
                return ("jpeg", w, h, prec)
            pos += 2 + seglen
    if payload[:2] == b"BM" and len(payload) >= 26:
        (dib,) = struct.unpack("<I", payload[14:18])
        if dib >= 40 and len(payload) >= 30:
            w, h = struct.unpack("<ii", payload[18:26])
            (bpp,) = struct.unpack("<H", payload[28:30])
            # negative height is the legitimate top-down encoding;
            # non-positive width (or zero height) is only ever corrupt
            if w <= 0 or h == 0:
                return ("bmp_corrupt", None, None, None)
            return ("bmp", w, abs(h), bpp)
        if dib == 12:
            w, h, _planes, bpp = struct.unpack("<HHHH", payload[18:26])
            if w == 0 or h == 0:
                return ("bmp_corrupt", None, None, None)
            return ("bmp", w, h, bpp)
    return ("unknown", None, None, None)


def synth_image_payload(df: DataFrame, id_col: str = "doc_id",
                        out: str = "payload") -> DataFrame:
    """Fixture payload synthesis: one REAL image file per row, geometry
    derived from the id (width = 1 + id % 64, height = 1 + id % 48,
    id % 3 routes PNG / BMP / JPEG) — deterministic, so an oracle can
    predict what the decoder must recover. mapInPandas keeps synthesis
    distributed (Arrow batches, no driver materialization)."""
    id_name = id_col
    schema = T.StructType([
        T.StructField(id_name, T.LongType()),
        T.StructField(out, T.BinaryType()),
    ])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            ids = pdf[id_name].astype("int64")
            blobs = [synth_image_bytes(1 + int(i) % 64, 1 + int(i) % 48,
                                       ("png", "bmp", "jpeg")[int(i) % 3])
                     for i in ids]
            yield pd.DataFrame({id_name: ids.values, out: blobs})

    return df.select(id_col).mapInPandas(run, schema)


def decode_image(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode stage: Arrow batches of binary blobs in,
    typed feature rows out (n_bytes, md5, format, width, height,
    bit_depth) via the byte-level parser above. One Python worker per
    partition, vectorized transfer — the production shape for
    decode/resize/feature-extract over a multimodal corpus."""
    id_name, payload_name = id_col, payload_col

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_name], pdf[payload_name]):
                b = bytes(p)
                fmt, w, h, depth = decode_image_bytes(b)
                rows.append((int(i), len(b),
                             hashlib.md5(b).hexdigest(), fmt, w, h, depth))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "n_bytes", "payload_md5", "format",
                "width", "height", "bit_depth"])

    return df.select(id_col, payload_col).mapInPandas(run, DECODE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, payload_col: str,
                 every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per N-byte window
    (what video frame extraction looks like shape-wise: one input row
    -> many output rows, exploded on the Spark side)."""
    n_frames = (F.length(F.col(payload_col)) / every_n_bytes).cast("int") + 1
    return (df.select(id_col, payload_col)
              .withColumn("frame_idx",
                          F.explode(F.sequence(F.lit(0), n_frames - 1)))
              .withColumn("frame_md5",
                          F.md5(F.concat(
                              F.col(payload_col),
                              F.encode(F.col("frame_idx").cast("string"),
                                       "utf-8"))))
              .select(id_col, "frame_idx", "frame_md5"))
