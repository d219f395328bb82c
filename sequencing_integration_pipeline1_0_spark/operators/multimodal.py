"""Multimodal column pattern: opaque binary payloads + typed metadata,
processed via Arrow-batched mapInPandas (SURVEY north-star extension;
the reference's closest analog is raw-JSON archival F20
functions.R:229-236 — payload travels as an opaque column with
lineage).

The image/audio decode libraries are NOT in this container, so the
decode step is STUBBED (deterministic fake features) behind
`decode_stub`; the Spark-side plumbing — schema, batch iteration,
partitioning, UDF signature — is real and tested. Swap `_fake_decode`
for a real PIL/librosa call on a cluster that has them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of the stubbed decoder
DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("fake_width", T.IntegerType()),
    T.StructField("fake_height", T.IntegerType()),
])


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          out: str = "payload") -> DataFrame:
    """Demo payload builder: utf-8 bytes of the text column stand in
    for an image/audio blob (binary type + metadata columns)."""
    return df.withColumn(out, F.encode(F.col(text_col), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic fake 'decode': byte length, md5, and fake
    dimensions derived from the hash. A real implementation would be
    `PIL.Image.open(io.BytesIO(payload)).size` — not available here."""
    md5 = hashlib.md5(payload).hexdigest()
    w = 64 + int(md5[:2], 16)
    h = 64 + int(md5[2:4], 16)
    return len(payload), md5, w, h


def decode_stub(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode: Arrow batches in, feature rows out — the
    real plumbing for a decode/resize/feature-extract stage. One
    Python worker per partition, vectorized transfer."""
    id_name, payload_name = id_col, payload_col

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf[payload_name]]
            out = pd.DataFrame(feats,
                               columns=["n_bytes", "payload_md5",
                                        "fake_width", "fake_height"])
            out.insert(0, "doc_id", pdf[id_name].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, DECODE_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, payload_col: str,
                 every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: emit one row per N-byte window
    (what video frame extraction looks like shape-wise: one input row
    -> many output rows, exploded on the Spark side, decode stubbed).
    """
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
