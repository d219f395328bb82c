"""Audio (WAV/RIFF) and video (MP4/ISO-BMFF) multimodal family:
byte-level round trips, spec edge cases (odd-chunk pad byte, mvhd
version 1, 64-bit largesize), and corrupt-degrades-to-data contracts.
Extends the reference's opaque-payload pattern (functions.R:229-236)
to audio/video containers, per the SURVEY north-star extension."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.operators import (
    multimodal as mm,
)


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_all_geometries():
    for i in range(0, 30):
        fmt, ch, rate, bits, nf, samples = mm.decode_wav_bytes(
            mm.synth_wav_bytes(i))
        ech, erate, enf = mm.audio_geometry(i)
        assert (fmt, ch, rate, bits, nf) == ("wav", ech, erate, 16, enf)
        assert samples == [mm.audio_sample(i, k) for k in range(ech * enf)]


def test_wav_odd_list_chunk_pad_byte():
    # every 5th fixture carries a 7-byte LIST chunk; without honoring
    # the RIFF pad byte the data chunk after it would misparse
    b = mm.synth_wav_bytes(10)
    assert b"LIST" in b
    assert mm.decode_wav_bytes(b)[0] == "wav"


def test_wav_corrupt_paths():
    assert mm.decode_wav_bytes(b"junk")[0] == "unknown"
    assert mm.decode_wav_bytes(b"RIFF\x00\x00\x00\x00WAVE")[0] \
        == "wav_corrupt"                        # no chunks at all
    good = bytearray(mm.synth_wav_bytes(4))
    lying = bytearray(good)
    lying[16] = 200                             # fmt size overruns payload
    assert mm.decode_wav_bytes(bytes(lying))[0] == "wav_corrupt"
    # truncated mid-data: data size now overruns -> corrupt, not crash
    assert mm.decode_wav_bytes(bytes(good[:-10]))[0] == "wav_corrupt"
    # zero channels in fmt
    zero_ch = bytearray(good)
    struct.pack_into("<H", zero_ch, 22, 0)
    assert mm.decode_wav_bytes(bytes(zero_ch))[0] == "wav_corrupt"
    # block_align inconsistent with channels*2: frames*channels*2
    # would overrun the data chunk -> corrupt, not struct.error
    bad_align = bytearray(good)
    struct.pack_into("<H", bad_align, 32, 1)    # block_align = 1
    assert mm.decode_wav_bytes(bytes(bad_align))[0] == "wav_corrupt"


def test_wav_nonpcm_keeps_metadata():
    b = bytearray(mm.synth_wav_bytes(6))
    struct.pack_into("<H", b, 20, 3)            # format tag 3 = IEEE float
    fmt, ch, rate, bits, nf, samples = mm.decode_wav_bytes(bytes(b))
    ech, erate, enf = mm.audio_geometry(6)
    assert fmt == "wav_nonpcm" and samples is None
    assert (ch, rate, nf) == (ech, erate, enf)


def test_wav_data_before_fmt_is_corrupt():
    pcm = struct.pack("<4h", 1, -2, 3, -4)
    body = b"WAVE" + b"data" + struct.pack("<I", len(pcm)) + pcm
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    assert mm.decode_wav_bytes(raw)[0] == "wav_corrupt"


# ---------------------------------------------------------------- MP4


def test_mp4_roundtrip_both_mvhd_versions():
    for i in range(0, 12):                      # covers v0 and v1
        c, dur, trk = mm.probe_mp4_bytes(mm.synth_mp4_bytes(i))
        ver, ts, du, nt = mm.mp4_geometry(i)
        assert c == "mp4" and trk == nt
        assert dur == du * 1000 // ts == (i % 5000 + 1) * 100


def test_mp4_largesize_and_size0_boxes():
    # rebuild moov with a size-1 + 64-bit largesize header, and make
    # the trailing mdat a size-0 run-to-EOF box — both must parse
    i = 2
    ver, ts, du, nt = mm.mp4_geometry(i)
    base = mm.synth_mp4_bytes(i)
    # locate the moov box in the synthesized layout: ftyp is first
    (ftyp_size,) = struct.unpack(">I", base[:4])
    moov_start = ftyp_size
    (moov_size,) = struct.unpack(">I", base[moov_start:moov_start + 4])
    moov_payload = base[moov_start + 8:moov_start + moov_size]
    rebuilt = (base[:moov_start]
               + struct.pack(">I", 1) + b"moov"
               + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload
               + struct.pack(">I", 0) + b"mdat" + b"\x00\x07")
    c, dur, trk = mm.probe_mp4_bytes(rebuilt)
    assert c == "mp4" and trk == nt and dur == du * 1000 // ts


def test_mp4_corrupt_paths():
    assert mm.probe_mp4_bytes(b"not media")[0] == "unknown"
    good = bytearray(mm.synth_mp4_bytes(3))
    lying = bytearray(good)
    lying[0] = 0xFF                             # ftyp size overruns
    assert mm.probe_mp4_bytes(bytes(lying))[0] == "mp4_corrupt"
    # ftyp alone, no moov/mvhd
    assert mm.probe_mp4_bytes(
        struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 512)
    )[0] == "mp4_corrupt"
    # zero timescale
    zt = bytearray(mm.synth_mp4_bytes(2))       # even id -> v0 mvhd
    idx = zt.find(b"mvhd")
    struct.pack_into(">I", zt, idx + 4 + 4 + 8, 0)
    assert mm.probe_mp4_bytes(bytes(zt))[0] == "mp4_corrupt"


# ------------------------------------------------------- Spark stages


def test_decode_audio_stage_and_hof_features(spark):
    df = spark.createDataFrame([(7,), (8,)], "doc_id long")
    dec = mm.decode_audio(mm.synth_audio_payload(df, "doc_id"),
                          "doc_id", "payload")
    rows = {r["doc_id"]: r for r in dec.collect()}
    for i in (7, 8):
        ech, erate, enf = mm.audio_geometry(i)
        r = rows[i]
        assert (r["format"], r["channels"], r["sample_rate"],
                r["bit_depth"], r["n_frames"]) == ("wav", ech, erate,
                                                   16, enf)
        assert list(r["samples"]) == [mm.audio_sample(i, k)
                                      for k in range(ech * enf)]
    # channel-0 deinterleave via indexed HOF filter matches python
    ch0 = dec.select(
        "doc_id",
        F.filter("samples",
                 lambda x, i: i % F.col("channels") == 0).alias("c0"))
    got = {r["doc_id"]: list(r["c0"]) for r in ch0.collect()}
    for i in (7, 8):
        ech, _, enf = mm.audio_geometry(i)
        assert got[i] == [mm.audio_sample(i, f * ech) for f in range(enf)]


def test_probe_media_mixed_pile(spark):
    df = spark.createDataFrame([(4,), (5,), (6,), (7,)], "doc_id long")
    out = {r["doc_id"]: r for r in mm.probe_media(
        mm.synth_media_payload(df, "doc_id"), "doc_id",
        "payload").collect()}
    assert out[4]["container"] == "wav" and out[4]["n_streams"] == 1
    assert out[5]["container"] == "mp4" \
        and out[5]["duration_ms"] == (5 % 5000 + 1) * 100 \
        and out[5]["n_streams"] == 1 + 5 % 3
    assert out[6]["container"] == "png" \
        and out[6]["duration_ms"] is None
    assert out[7]["container"] == "unknown"


def test_probe_media_corrupt_blob_degrades(spark):
    # a corrupt WAV in the pile must yield a wav_corrupt ROW, not a
    # task failure — the 100 TB contract
    import pandas as pd
    schema = "doc_id long, payload binary"
    pdf = pd.DataFrame({"doc_id": [1],
                        "payload": [b"RIFF\xff\xff\xff\xffWAVE"]})
    df = spark.createDataFrame(pdf, schema)
    out = mm.probe_media(df, "doc_id", "payload").collect()
    assert out[0]["container"] == "wav_corrupt"
    assert out[0]["duration_ms"] is None


def test_dhash_brightness_invariance_and_corrupt(spark):
    from pyspark.sql import functions as F
    from sequencing_integration_pipeline1_0_spark.operators import (
        multimodal as mm,
    )
    # doc ids 48 apart share a geometry class but differ in brightness
    df = spark.createDataFrame([(0,), (48,), (96,), (5,)], "doc_id long")
    dec = mm.decode_bmp_gray(
        mm.synth_shaded_bmp_payload(df, "doc_id"), "doc_id", "payload")
    out = {r["doc_id"]: r for r in dec.select(
        "doc_id", "format", "width", "height",
        mm.dhash_bits(F.col("gray"), F.col("width"),
                      F.col("height")).alias("dhash")).collect()}
    assert out[0]["format"] == "bmp"
    assert out[0]["dhash"] == out[48]["dhash"] == out[96]["dhash"]
    assert out[5]["width"] == 14 and out[5]["height"] == 13
    # decoded luma must equal the synth formula (bit-exact pixels)
    gray = dec.where(F.col("doc_id") == 5).collect()[0]["gray"]
    w, h = mm.shaded_geometry(5)
    assert gray == [mm.shaded_pixel(5, x, y)
                    for y in range(h) for x in range(w)]
    # corrupt blob degrades to a row, not a task death
    bad = spark.createDataFrame([(1, bytearray(b"BMgarbage"))],
                                "doc_id long, payload binary")
    row = mm.decode_bmp_gray(bad, "doc_id", "payload").collect()[0]
    assert row["format"] == "bmp_corrupt" and row["gray"] is None


# -------------------------------------------------------------- video px


def test_video_roundtrip_geometries_and_pixels():
    for i in range(0, 25):
        fmt, w, h, nf, fb = mm.decode_video_bytes(mm.synth_video_bytes(i))
        ew, eh, enf = mm.video_geometry(i)
        assert (fmt, w, h, nf) == ("video", ew, eh, enf)
        assert len(fb) == ew * eh * enf
        # spot-check pixels across frames against the formula
        for f in (0, enf - 1):
            for (x, y) in ((0, 0), (ew - 1, eh - 1), (3, 2)):
                assert fb[f * ew * eh + y * ew + x] \
                    == mm.video_pixel(i, f, x, y)


def test_video_corrupt_paths():
    assert mm.decode_video_bytes(b"junk")[0] == "unknown"
    good = bytearray(mm.synth_video_bytes(4))
    # truncated mid-frames: mdat declared size overruns -> corrupt
    assert mm.decode_video_bytes(bytes(good[:-5]))[0] == "video_corrupt"
    # foreign mdat payload (no RAWV magic)
    bad_magic = bytearray(good)
    idx = bytes(good).find(b"RAWV")
    bad_magic[idx:idx + 4] = b"ZZZZ"
    assert mm.decode_video_bytes(bytes(bad_magic))[0] == "video_corrupt"
    # zero frame count in the RAWV header
    zero_nf = bytearray(good)
    struct.pack_into(">H", zero_nf, idx + 8, 0)
    assert mm.decode_video_bytes(bytes(zero_nf))[0] == "video_corrupt"
    # lying box size
    lying = bytearray(good)
    struct.pack_into(">I", lying, 0, 3)         # ftyp size < 8
    assert mm.decode_video_bytes(bytes(lying))[0] == "video_corrupt"
    # plain mp4 without a RAWV track degrades, not crashes
    assert mm.decode_video_bytes(mm.synth_mp4_bytes(3))[0] \
        == "video_corrupt"


def test_video_frame_stage_samples_stride_and_degrades(spark):
    df = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    frames = mm.decode_video_frames(
        mm.synth_video_payload(df, "doc_id"), "doc_id", "payload",
        stride=3).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i in range(12):
        ew, eh, enf = mm.video_geometry(i)
        got = sorted(r.frame_idx for r in by_doc[i])
        assert got == list(range(0, enf, 3))
        r0 = next(r for r in by_doc[i] if r.frame_idx == 0)
        assert (r0.width, r0.height) == (ew, eh)
        assert len(r0.gray) == ew * eh
    # corrupt blob -> one degraded row, task survives
    bad = spark.createDataFrame([(99, bytearray(b"not a container"))],
                                "doc_id LONG, payload BINARY")
    rows = mm.decode_video_frames(bad, "doc_id", "payload").collect()
    assert len(rows) == 1 and rows[0].format == "unknown"
    assert rows[0].gray is None


def test_audio_fingerprint_gain_invariance_defect_and_corrupt(spark):
    """The perceptual audio fingerprint must be gain-invariant
    (same-pattern docs with different gains share a fingerprint), the
    planted slice defect must flip at most 2 bits, and a corrupt blob
    must degrade to a null fingerprint instead of killing the task."""
    P = mm.AUDIO_FP_PATTERNS
    ids = [i for i in range(1, 4 * P) if i % P == 1 and i % 5 != 0]
    gains = {1 + i % 3 for i in ids}
    assert len(gains) >= 2           # fixture really varies the gain
    df = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
    fp = {r.doc_id: r.fp for r in mm.decode_audio(
        mm.synth_fp_audio_payload(df, "doc_id"), "doc_id", "payload")
        .select("doc_id",
                mm.audio_fingerprint_bits(F.col("samples")).alias("fp"))
        .collect()}
    assert len(set(fp.values())) == 1          # gain cancelled

    # defect doc (same pattern, % 5 == 0) flips at most 2 bits
    did = next(i for i in range(1, 6 * P) if i % P == 1 and i % 5 == 0)
    ddf = spark.createDataFrame([(did,)], "doc_id LONG")
    dfp = mm.decode_audio(
        mm.synth_fp_audio_payload(ddf, "doc_id"), "doc_id", "payload") \
        .select(mm.audio_fingerprint_bits(F.col("samples")).alias("fp")) \
        .collect()[0].fp
    base = next(iter(fp.values()))
    ham = sum(a != b for a, b in zip(base, dfp))
    assert 1 <= ham <= 2

    # corrupt blob -> wav_corrupt row with null samples / null fp
    bad = spark.createDataFrame([(9, bytearray(b"RIFFxxxxWAVEbroken"))],
                                "doc_id LONG, payload BINARY")
    rows = (mm.decode_audio(bad, "doc_id", "payload")
            .select("format",
                    mm.audio_fingerprint_bits(F.col("samples"))
                      .alias("fp")).collect())
    assert rows[0].format == "wav_corrupt" and rows[0].fp is None
