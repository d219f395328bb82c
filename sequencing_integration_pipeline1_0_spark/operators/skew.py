"""Skew-mitigation operators: salted two-phase aggregation and a
salted replicate join.

AQE's skew-join splitting (enabled in session.py) handles skewed SORT/
hash joins at runtime, but two cases still need explicit shape at
100 TB: (a) aggregation skew — a hot group key funnels into one reducer
regardless of AQE — and (b) joins where the skewed side can't be
split because the other side must be replicated. Both fixes are pure
plan rewrites; results are bit-identical to the unsalted form (the
oracle-checked `skew_salted_agg` query proves it).

The reference never needed this (single-node R), but its fuzzy-join
blocking (fuzzy.Rmd:560-603, dense DOB-year blocks) is the same idea:
spread one hot key's work across workers, then recombine.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates that decompose as agg(agg(partial)) — phase 2 applies the
#: same function to phase-1 partials.
_SELF_DECOMPOSABLE = {"sum", "min", "max", "count"}


def _salt(cols: Sequence[str], buckets: int) -> Column:
    """Deterministic pseudo-random salt in [0, buckets): xxhash64 of the
    non-key columns. Deterministic (no rand()) so plans are replayable
    and retried tasks produce identical output."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_group_agg(df: DataFrame, keys: Sequence[str],
                     aggs: Mapping[str, tuple[str, str]],
                     buckets: int = 32) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    aggs: out_name -> (fn, col) with fn in {sum, min, max, count}.
    Phase 1 groups by (keys + salt) — the hot key's rows spread over
    `buckets` reducers; phase 2 groups by keys to combine partials.
    count re-combines as sum of partial counts.
    """
    for fn, _ in aggs.values():
        if fn not in _SELF_DECOMPOSABLE:
            raise ValueError(f"{fn} is not decomposable; use avg=sum/count")
    other = [c for c in df.columns if c not in set(keys)]
    salted = df.withColumn("__salt", _salt(other or list(keys), buckets))
    p1 = salted.groupBy(*keys, "__salt").agg(*[
        getattr(F, fn)(col).alias(out) for out, (fn, col) in aggs.items()])
    p2 = p1.groupBy(*keys).agg(*[
        (F.sum(out) if fn == "count" else getattr(F, fn)(out)).alias(out)
        for out, (fn, col) in aggs.items()])
    return p2


def salted_avg(df: DataFrame, keys: Sequence[str], col: str,
               out: str = "avg", buckets: int = 32) -> DataFrame:
    """Skew-safe average via the sum/count decomposition."""
    parts = salted_group_agg(
        df, keys, {"__s": ("sum", col), "__n": ("count", col)}, buckets)
    return parts.withColumn(out, F.col("__s") / F.col("__n")) \
                .drop("__s", "__n")


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Replicate-join for a skewed fact side: the fact gets a
    deterministic salt in [0, buckets); the small side is exploded once
    per bucket so (key, salt) is an equi-key with no hot reducer.

    Use when the small side is too big to broadcast outright but small
    enough to replicate `buckets` times; otherwise prefer broadcast or
    AQE skew-join.
    """
    other = [c for c in skewed.columns if c != key]
    left = skewed.withColumn("__salt", _salt(other or [key], buckets))
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    out = left.join(right, [key, "__salt"], how)
    return out.drop("__salt")


def spread_for_compute(df: DataFrame,
                       parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow input so expression-heavy
    projections (regex batteries, multi-format date parsing) use every
    core instead of inheriting the scan's split count.

    A small parquet file with one row group is a single input split, so
    every downstream regex/parse in that stage runs on ONE task no
    matter how many cores the session has. For CPU-bound scalar
    pipelines the exchange (a few MB of packed rows) costs far less
    than the serialized compute it unblocks. The guard self-disables at
    cluster scale: a large scan already has >= parallelism splits, so
    the repartition — and its shuffle — never happens exactly when the
    input is big enough not to need it.

    Same idiom as the fuzzy join's probe-side spread
    (fuzzy.blocked_distance_join); results are row-identical (round
    robin reorders rows only, and no operator downstream of a
    repartition may depend on row order).

    The "is it narrow?" probe reads Catalyst's optimized-plan size
    estimate (analysis-only) instead of ``df.rdd.getNumPartitions()``,
    which forces a full RDD plan conversion per call. An input smaller
    than ~8 MB/core can't have enough scan splits to feed every core;
    anything larger already does, so the repartition — and its shuffle —
    never fires on a big input.
    """
    sc = df.sparkSession.sparkContext
    target = parallelism or sc.defaultParallelism
    try:
        est = int(df._jdf.queryExecution().optimizedPlan()
                  .stats().sizeInBytes())
    except Exception:  # non-JVM backends (connect): spread unconditionally
        return df.repartition(target)
    if est < target * 8 * 1024 * 1024:
        return df.repartition(target)
    return df
