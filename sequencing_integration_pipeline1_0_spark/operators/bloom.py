"""Portable Bloom-filter sketch for membership prefilters.

The 100 TB decontamination problem: the benchmark gram set may be too
big to broadcast as an exact hash set (tens of millions of grams), but
a Bloom filter over it is ~10 bits/element — always broadcastable. The
pattern here is PREFILTER, NOT DECIDE: the corpus side drops every
gram the Bloom rejects (map-side, zero shuffle), and only the tiny
surviving fraction proceeds to the exact verify join. Bloom filters
have no false negatives, so the composition is provably lossless —
`decontam_bloom_prefilter` is certified against the SAME oracle as the
exact path.

Representation: a broadcastable 1-row DENSE array<long> of
m_bits/64 words (128 KiB at the default geometry), built with one
distinct + one bit_or aggregation padded over the word range. Dense
on purpose: Spark's element_at on a MAP literal is a LINEAR scan of
the entries (the r4 bench caught the sparse-map variant spending 14 s
scanning a 16k-entry map per probed gram), while array element_at is
O(1) indexing. k index positions per element come from
xxhash64(value, seed_i); both build and probe are pure JVM
expressions (no UDFs), and the probe is a conjunction of k masked
lookups the optimizer keeps inside whole-stage codegen.

Spark-side only by design: the sketch never crosses engines (the
oracle sees the exact semantics, not the filter), so engine-private
xxhash64 is safe here — unlike oracle-visible keys, which must stay
engine-portable (see dedupe_scale.lcg_bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default filter geometry: 2^20 bits (128 KiB dense) / 3 probes —
#: ~1% false-positive rate at ~100k elements; FPs only cost verify
#: work, never correctness
M_BITS = 1 << 20
K_HASHES = 3


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a value: xxhash64 seeded by probe index."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def bloom_build(df: DataFrame, value_col: str, *,
                m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """Build a Bloom filter over a column: 1-row DataFrame with a
    `__bloom` DENSE array<long> (word 0..m_bits/64-1 -> bitmask).
    Shape: explode to k positions per value, distinct (map-side
    combinable), bit_or per 64-bit word, pad over the full word range
    (spark.range join — tiny), collect in word order into one array
    row — the only driver-visible object is the final broadcastable
    array, and probing it is O(1) indexing (a map here would make
    every probe a linear scan of the entry list)."""
    pos = (df.select(F.explode(F.array(
               *_positions(F.col(value_col), m_bits, k))).alias("p"))
             .distinct()
             .select(F.floor(F.col("p") / 64).cast("long").alias("w"),
                     (F.col("p") % 64).cast("int").alias("b"))
             .select("w", F.expr(
                 "shiftleft(CAST(1 AS BIGINT), b)").alias("bit")))
    words = pos.groupBy("w").agg(F.bit_or("bit").alias("mask"))
    # ceil-div: a non-multiple-of-64 m_bits still owns a final partial
    # word — flooring would drop it from the pad range and the inner
    # side of the left join would silently discard its set bits
    # (probe-side false negatives, the forbidden failure mode)
    allw = (df.sparkSession.range((m_bits + 63) // 64)
              .select(F.col("id").cast("long").alias("w")))
    padded = (allw.join(words, "w", "left")
                  .select("w", F.coalesce("mask", F.lit(0).cast("long"))
                               .alias("mask")))
    # geometry rides WITH the sketch: probing with mismatched
    # (m_bits, k) would silently produce false negatives — the one
    # failure mode a Bloom prefilter must never have — so
    # bloom_prefilter hard-fails on a mismatch instead
    return padded.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("w", "mask"))),
                    lambda s: s["mask"]).alias("__bloom"),
        F.lit(m_bits).alias("__m_bits"), F.lit(k).alias("__k"))


def bloom_prefilter(df: DataFrame, value_col: str, bloom: DataFrame, *,
                    m_bits: int = M_BITS, k: int = K_HASHES) -> DataFrame:
    """Keep only rows whose value the Bloom filter MIGHT contain.
    Guaranteed superset of the true members (no false negatives);
    callers follow with an exact join to drop the false positives.
    The filter itself is a broadcast of the 1-row map + k masked
    lookups per row — map-side, no shuffle of df."""
    out = df.join(F.broadcast(bloom))
    # geometry guard: a sketch built with different (m_bits, k) would
    # miss true members map-side — raise instead. assert_true returns
    # NULL on success, so isNull() folds it INTO the filter condition
    # (a standalone unused column would be pruned away by Catalyst)
    checks = [F.assert_true(
        (F.col("__m_bits") == F.lit(m_bits)) & (F.col("__k") == F.lit(k)),
        F.lit("bloom geometry mismatch: probe (m_bits, k) differs from "
              "the sketch's build geometry")).isNull()]
    for i, p in enumerate(_positions(F.col(value_col), m_bits, k)):
        # array element_at is 1-based and O(1) on the dense sketch
        out = (out.withColumn(f"__w{i}",
                              (F.floor(p / 64) + 1).cast("int"))
                  .withColumn(f"__b{i}", (p % 64).cast("int")))
        checks.append(F.expr(
            f"(element_at(__bloom, __w{i})"
            f" & shiftleft(CAST(1 AS BIGINT), __b{i})) != 0"))
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    drop = ["__bloom", "__m_bits", "__k"] \
        + [f"__w{i}" for i in range(k)] + [f"__b{i}" for i in range(k)]
    return out.filter(cond).drop(*drop)
