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

Representation: a broadcastable 1-row map<long, long> from 64-bit-word
index to bitmask, built with one distinct + one bit_or aggregation —
only words with at least one set bit are materialized, so a sparse
filter costs proportional to its set bits, not to m_bits. k index
positions per element come from xxhash64(value, seed_i); both build
and probe are pure JVM expressions (no UDFs), and the probe is a
conjunction of k masked lookups the optimizer keeps inside
whole-stage codegen.

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
    `__bloom` map<long,long> (word index -> bitmask). Shape: explode
    to k positions per value, distinct (map-side combinable), bit_or
    per 64-bit word, collect the non-zero words into one map row —
    the only driver-visible object is the final broadcastable map."""
    pos = (df.select(F.explode(F.array(
               *_positions(F.col(value_col), m_bits, k))).alias("p"))
             .distinct()
             .select(F.floor(F.col("p") / 64).cast("long").alias("w"),
                     (F.col("p") % 64).cast("int").alias("b"))
             .select("w", F.expr(
                 "shiftleft(CAST(1 AS BIGINT), b)").alias("bit")))
    words = pos.groupBy("w").agg(F.bit_or("bit").alias("mask"))
    # geometry rides WITH the sketch: probing with mismatched
    # (m_bits, k) would silently produce false negatives — the one
    # failure mode a Bloom prefilter must never have — so
    # bloom_prefilter hard-fails on a mismatch instead
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "mask")))
         .alias("__bloom"),
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
        out = (out.withColumn(f"__w{i}",
                              F.floor(p / 64).cast("long"))
                  .withColumn(f"__b{i}", (p % 64).cast("int")))
        checks.append(F.expr(
            f"(coalesce(element_at(__bloom, __w{i}), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), __b{i})) != 0"))
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    drop = ["__bloom", "__m_bits", "__k"] \
        + [f"__w{i}" for i in range(k)] + [f"__b{i}" for i in range(k)]
    return out.filter(cond).drop(*drop)
