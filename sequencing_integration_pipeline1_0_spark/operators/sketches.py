"""Mergeable cardinality / frequency sketches: HyperLogLog distinct
estimation and Count-Min frequency estimation (SURVEY north-star
extension; generalizes the reference's exact distinct-count QA —
A2 template_submitters.Rmd:700-704 `n_distinct`, and the QA duplicate
tallies QA_DUPLICATES.Rmd:94-101 — to the fixed-size sketches a
100 TB pipeline actually ships between stages).

Why sketches are first-class at scale: an exact COUNT(DISTINCT key)
over 100 TB shuffles every distinct key once; an exact per-term
frequency table is vocabulary-sized. Both sketches here are
FIXED-size (m registers / d*w counters), one map-side pass each, and
— the property that matters operationally — MERGEABLE: per-shard
sketches combine with register-max / counter-add into exactly the
sketch a single global pass would have built. The HLL query PROVES
that merge identity in its own output (est == est_merged is
hash-gated), so the incremental/parallel story is certified, not
asserted.

Determinism: hashes are md5-prefix 60-bit ints (the dedupe_scale
convention — stable across engines; NOT xxhash64, which DuckDB
lacks); register ranks are integer bit-length arithmetic via bin()
(no libm); HLL's harmonic sum is scaled by 2^RANK_MAX so it is an
exact BIGINT sum (order-free); the only floating-point steps are the
final literal/BIGINT divisions, identical IEEE ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedupe_scale import words

#: HLL geometry: p=8 -> m=256 registers; the md5-prefix hash is 60
#: bits, so 52 bits remain after the register index and rank values
#: live in [1, 53] (53 = "all 52 remaining bits are zero").
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_RANK_MAX = 53
#: Standard HLL bias constant alpha_m for m >= 128.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: Numerator of the estimate with the 2^RANK_MAX scaling folded in:
#: est = HLL_NUMER / S where S = sum_j 2^(RANK_MAX - M_j) (exact int).
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RANK_MAX)

#: Count-Min geometry: d=4 independent hash rows, w=512 buckets.
CMS_D = 4
CMS_W = 512
CMS_TOPK = 20


def md5_60bit(col: Column) -> Column:
    """md5-prefix 60-bit int (dedupe_scale token convention): 15 hex
    chars -> BIGINT. Oracle twin: ('0x'||substr(md5(x),1,15))::BIGINT.
    The input is cast to string first (bigints render identically in
    both engines), matching the oracle's CAST(x AS VARCHAR)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
             .cast("long"))


def hll_rank(w: Column) -> Column:
    """Position of the first 1-bit in the 52-bit value `w`, counting
    from the most significant of the 52 bits, plus 1 — the HLL
    register update. Pure integer arithmetic: bit length via
    length(bin(w)) (both engines render unpadded binary), w = 0 maps
    to RANK_MAX (all bits zero)."""
    return (F.when(w == 0, F.lit(HLL_RANK_MAX))
             .otherwise(F.lit(HLL_RANK_MAX) - F.length(F.bin(w)))
             .cast("int"))


def hll_registers(df: DataFrame, key: Column, *extra_group: str) -> DataFrame:
    """One map-side pass -> per-register max rank: (*extra_group, reg,
    mj). The register table is the sketch: m rows per group, mergeable
    by max(mj)."""
    # register index / remaining bits via mask + shift — NOT `/`,
    # which is double division in both engines and a 60-bit value
    # does not fit a 53-bit mantissa
    h = md5_60bit(key)
    base = df.select(*extra_group,
                     h.bitwiseAND(F.lit(HLL_M - 1)).cast("int").alias("reg"),
                     hll_rank(F.shiftright(h, HLL_P)).alias("rank"))
    return (base.groupBy(*extra_group, "reg")
                .agg(F.max("rank").alias("mj")))


def _hll_estimate(regs: DataFrame) -> DataFrame:
    """(est, nonzero) from a register table. The harmonic sum is the
    EXACT integer S = sum_present 2^(RANK_MAX - mj) + absent * 2^RANK_MAX
    (absent registers contribute rank 0); the estimate is one double
    division of a plan-time literal by S."""
    s_present = F.sum(F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {HLL_RANK_MAX} - mj)"))
    n_present = F.count(F.lit(1))
    return regs.agg(
        (s_present
         + (F.lit(HLL_M).cast("long") - n_present)
         * F.lit(1 << HLL_RANK_MAX).cast("long")).alias("s_int"),
        n_present.cast("int").alias("nonzero"))


def hll_estimate_expr(s_int: Column, nonzero: Column,
                      *, round_to: int = 4) -> Column:
    """The full HLL estimator from a sketch's exact-integer harmonic
    sum and nonzero-register count: raw harmonic-mean estimate above
    the 2.5m small-range cutoff, Flajolet linear counting
    (m * ln(m/zero_registers)) below it — the regime correction
    without which estimates at n << m overshoot ~50%. ln rides the
    bm25 rounding precedent; everything upstream is exact integers."""
    zeros = F.lit(HLL_M) - nonzero
    raw = F.lit(HLL_NUMER) / s_int
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M))
                                     / zeros.cast("double"))
    return F.round(
        F.when((zeros > 0) & (raw <= F.lit(HLL_LC_CUTOFF)), lc)
         .otherwise(raw), round_to)


def hll_distinct(df: DataFrame, key_col: str, group_col: str,
                 *, round_to: int = 4) -> DataFrame:
    """HyperLogLog distinct-count with a certified merge identity.

    Builds the m=256 register sketch over `key_col` twice — once in a
    single global pass, once as per-`group_col` shard sketches merged
    by register max — and returns ONE row:
      (m, nonzero_regs, est, est_merged, merge_exact,
       exact_distinct, rel_err_pct)
    merge_exact = 1 iff the merged sketch is register-identical to
    the global one (max is associative/commutative, so it always is —
    the hash gate certifies the property, it does not hope for it).
    exact_distinct / rel_err_pct are the verification baseline; at
    100 TB only the sketch passes run.

    Scale shape: two linear map passes (the direct build is the
    merged build's semantics — a production run keeps only the
    sharded one); the groupBy keys are m and shards*m — fixed-size
    aggs with map-side combine regardless of input rows; the final
    assembly is three 1-row aggregates cross-joined (scalar
    broadcasts)."""
    direct = _hll_estimate(hll_registers(df, F.col(key_col)))
    shard = hll_registers(df, F.col(key_col), group_col)
    merged = _hll_estimate(
        shard.groupBy("reg").agg(F.max("mj").alias("mj")))
    exact = df.agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct"))
    est = hll_estimate_expr(F.col("s_int"), F.col("nonzero"),
                            round_to=round_to)
    est_m = hll_estimate_expr(F.col("s_merged"), F.col("nz_merged"),
                              round_to=round_to)
    return (direct
            .crossJoin(merged.select(F.col("s_int").alias("s_merged"),
                                     F.col("nonzero").alias("nz_merged")))
            .crossJoin(exact)
            .select(F.lit(HLL_M).alias("m"), "nonzero",
                    est.alias("est"), est_m.alias("est_merged"),
                    ((F.col("s_int") == F.col("s_merged"))
                     & (F.col("nonzero") == F.col("nz_merged")))
                    .cast("int").alias("merge_exact"),
                    "exact_distinct",
                    F.round((est - F.col("exact_distinct"))
                            / F.col("exact_distinct") * 100, round_to)
                     .alias("rel_err_pct")))


#: raw-estimate cutoff below which HLL switches to linear counting
#: (the standard 2.5m small-range correction boundary)
HLL_LC_CUTOFF = 2.5 * HLL_M


def hll_distinct_by_group(df: DataFrame, key_col: str,
                          group: Column, group_name: str,
                          *, round_to: int = 4) -> DataFrame:
    """HLL as a GROUP BY aggregate — the shape production dashboards
    actually run (distinct users per day, distinct keys per tenant):
    one m-register sketch PER group, estimates from the full HLL
    estimator including the small-range correction. Returns one row
    per group:
      (group_name, est, exact_distinct, rel_err_pct, used_linear)
    used_linear = 1 when the raw estimate fell below 2.5m and zero
    registers existed, in which case est = m * ln(m / zero_registers)
    (Flajolet et al. 2007's linear-counting branch — the regime
    per-group cardinalities usually live in). exact_distinct /
    rel_err_pct are the verification baseline; production keeps only
    the sketch pass, whose state is m small ints per group no matter
    how many rows hit the group.

    Determinism: registers and the scaled harmonic sum are exact
    integers (hll_registers); the raw estimate is one literal/BIGINT
    division; ln rides the bm25 precedent (both engines' libm agree
    once the result is rounded — here to 1e-4)."""
    regs = hll_registers(df.select(group.alias(group_name),
                                   F.col(key_col)),
                         F.col(key_col), group_name)
    per = (regs.groupBy(group_name)
               .agg(F.sum(F.expr(
                       f"shiftleft(CAST(1 AS BIGINT), "
                       f"{HLL_RANK_MAX} - mj)")).alias("s_present"),
                    F.count(F.lit(1)).alias("n_present")))
    s_int = (F.col("s_present")
             + (F.lit(HLL_M).cast("long") - F.col("n_present"))
             * F.lit(1 << HLL_RANK_MAX).cast("long"))
    zeros = F.lit(HLL_M) - F.col("n_present")
    raw = F.lit(HLL_NUMER) / s_int
    use_lc = (zeros > 0) & (raw <= F.lit(HLL_LC_CUTOFF))
    est = hll_estimate_expr(s_int, F.col("n_present"), round_to=round_to)
    exact = (df.select(group.alias(group_name), F.col(key_col))
               .groupBy(group_name)
               .agg(F.countDistinct(key_col).cast("long")
                     .alias("exact_distinct")))
    return (per.join(exact, group_name)
               .select(group_name, est.alias("est"), "exact_distinct",
                       F.round((est - F.col("exact_distinct"))
                               / F.col("exact_distinct") * 100, round_to)
                        .alias("rel_err_pct"),
                       use_lc.cast("int").alias("used_linear")))


def hll_set_algebra(df: DataFrame, key: Column,
                    a_pred: Column, b_pred: Column,
                    *, round_to: int = 4) -> DataFrame:
    """HLL sketch set algebra: estimate |A|, |B|, |A ∪ B| and
    |A ∩ B| for two row-predicate-defined key sets from three
    sketches — union is the REGISTER MAX of A's and B's sketches (no
    data repass: the union sketch of two HLLs is exactly the HLL of
    the union), intersection is inclusion-exclusion over the three
    ROUNDED estimates. Returns one row:
      (est_a, est_b, est_union, est_intersect,
       exact_a, exact_b, exact_union, exact_intersect)
    exact_* are the verification baseline; a production pipeline
    keeps only the sketches, which is the point — set overlap between
    two 100 TB key sets (e.g. train-corpus vs eval-corpus doc ids)
    from two fixed-size register tables that were built independently.

    Scale shape: one linear pass builds both sketches (rows tagged
    'a'/'b' map-side, a (set, reg) agg of at most 2m keys); the union
    sketch is an m-key rollup of that result; estimates are
    literal/BIGINT divisions. Exact baselines are the distinct-shuffle
    path the sketches replace."""
    tagged = df.select(
        key.alias("k"),
        F.explode(F.array_compact(F.array(
            F.when(a_pred, F.lit("a")),
            F.when(b_pred, F.lit("b"))))).alias("s"))
    regs = hll_registers(tagged, F.col("k"), "s")

    def est_of(r: DataFrame, out: str) -> DataFrame:
        e = _hll_estimate(r)
        return e.select(
            hll_estimate_expr(F.col("s_int"), F.col("nonzero"),
                              round_to=round_to).alias(out))

    ea = est_of(regs.filter(F.col("s") == "a").drop("s"), "est_a")
    eb = est_of(regs.filter(F.col("s") == "b").drop("s"), "est_b")
    eu = est_of(regs.groupBy("reg").agg(F.max("mj").alias("mj")),
                "est_union")
    exact = tagged.agg(
        F.countDistinct(F.when(F.col("s") == "a", F.col("k")))
         .cast("long").alias("exact_a"),
        F.countDistinct(F.when(F.col("s") == "b", F.col("k")))
         .cast("long").alias("exact_b"),
        F.countDistinct("k").cast("long").alias("exact_union"))
    return (ea.crossJoin(eb).crossJoin(eu).crossJoin(exact)
              .select("est_a", "est_b", "est_union",
                      F.round(F.col("est_a") + F.col("est_b")
                              - F.col("est_union"), round_to)
                       .alias("est_intersect"),
                      "exact_a", "exact_b", "exact_union",
                      (F.col("exact_a") + F.col("exact_b")
                       - F.col("exact_union")).alias("exact_intersect")))


#: equi-width histogram sketch geometry and the quantiles it serves
HIST_BUCKETS = 64
HIST_QS = (0.5, 0.9, 0.99)


def histogram_quantiles(df: DataFrame, col: str, *,
                        n_buckets: int = HIST_BUCKETS,
                        qs: tuple[float, ...] = HIST_QS,
                        round_to: int = 4) -> DataFrame:
    """Equi-width histogram quantile estimation — the mergeable
    fixed-size alternative to an exact distributed sort: bucket
    counts are plain integers that ADD across shards (the t-digest /
    percentile_approx role, with deterministic cross-engine
    arithmetic instead of a sketch library). Returns one row per
    requested quantile:
      (q, est, exact, rel_err_pct)
    est interpolates linearly inside the first bucket whose running
    count reaches q*n; exact is the true interpolated percentile —
    the verification baseline whose global sort the histogram
    replaces.

    Scale shape: one exact min/max/count pass (3 scalar aggs), one
    linear bucketing pass into an n_buckets-key agg with map-side
    combine (state never grows with rows), then all remaining work —
    running counts, quantile picks, interpolation — happens on the
    n_buckets-row table (window over 64 rows, the shrink-then-rank
    exemption). Everything is integer counts plus left-associative
    IEEE doubles mirrored token-for-token by the oracle."""
    c = F.col(col).cast("double")
    stats = df.agg(F.min(c).alias("mn"), F.max(c).alias("mx"),
                   F.count(c).cast("long").alias("n"),
                   F.percentile(c, F.array(*[F.lit(q) for q in qs]))
                    .alias("ex"))
    width = (F.col("mx") - F.col("mn")) / F.lit(n_buckets)
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(n_buckets - 1),
                F.floor((c - F.col("mn")) / width))).cast("int")
    counts = (df.crossJoin(F.broadcast(stats.select("mn", "mx")))
                .select(bucket.alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy(F.lit(1)).orderBy("bucket")
    cum = (counts.withColumn("cum", F.sum("cnt").over(w))
                 .withColumn("cum_before",
                             F.col("cum") - F.col("cnt")))
    qlit = F.explode(F.array(*[
        F.struct(F.lit(float(q)).alias("q"), F.lit(i).alias("qi"))
        for i, q in enumerate(qs)])).alias("qq")
    probes = (cum.crossJoin(F.broadcast(stats))
                 .select("bucket", "cnt", "cum", "cum_before",
                         "mn", "mx", "n", "ex", qlit)
                 .select("bucket", "cnt", "cum", "cum_before",
                         "mn", "mx", "n", "ex",
                         F.col("qq.q").alias("q"),
                         F.col("qq.qi").alias("qi"))
                 .where(F.col("cum").cast("double")
                        >= F.col("q") * F.col("n")))
    pick = (probes.groupBy("q")
                  .agg(F.min(F.struct("bucket", "cnt", "cum_before",
                                      "mn", "mx", "n", "ex", "qi"))
                        .alias("p")))
    mn, mx = F.col("p.mn"), F.col("p.mx")
    wexp = (mx - mn) / F.lit(n_buckets)
    tq = F.col("q") * F.col("p.n")
    est = F.round(
        mn + wexp * (F.col("p.bucket")
                     + (tq - F.col("p.cum_before")) / F.col("p.cnt")),
        round_to)
    exact = F.element_at(F.col("p.ex"), F.col("p.qi") + 1)
    return pick.select(
        "q", est.alias("est"),
        F.round(exact, round_to).alias("exact"),
        F.round((est - F.round(exact, round_to))
                / F.round(exact, round_to) * 100, round_to)
         .alias("rel_err_pct"))


def cms_heavy_hitters(df: DataFrame, text_col: str, *,
                      d: int = CMS_D, w: int = CMS_W,
                      topk: int = CMS_TOPK,
                      salt_buckets: int = 8) -> DataFrame:
    """Count-Min heavy hitters: estimate the corpus frequency of the
    exact top-`topk` words from a fixed d x w counter sketch and
    report the (always >= 0) overestimate per word. Returns
    (rnk, word, exact_cnt, cms_est, overest) ordered by
    (exact_cnt desc, word).

    The sketch: counter[i][h_i(t) % w] += count(t), h_i = md5-prefix
    of "i|t" — d*w = 2048 integers total, built from the DISTINCT-word
    count table (vocabulary-sized, not corpus-sized), mergeable by
    counter addition (sums commute; the HLL query certifies the merge
    identity for the max-merge family, this one rides plain SUM).
    A word's estimate is the MIN over its d counters — never below
    the true count (every occurrence lands in all d of its buckets),
    so overest >= 0 for every row is part of the hashed output.

    Scale shape: one corpus tokenize pass collapses to word counts
    (map-side combine); the sketch explodes d rows per DISTINCT word
    into a d*w-key agg; candidates come from a TWO-phase top-k (local
    top-k per hash bucket first, the bm25 pattern — no global window
    over the vocabulary); the candidate-sketch meet is a broadcast
    join of topk*d probe rows against 2048 counter rows."""
    ws = F.filter(words(F.coalesce(F.col(text_col), F.lit(""))),
                  lambda x: x != "")
    wc = (df.select(F.explode(ws).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    rows = (wc.select("word", "cnt", F.explode(F.array(*[
                F.lit(i) for i in range(d)])).alias("row_i"))
              .withColumn("bucket", F.pmod(
                  md5_60bit(F.concat(F.col("row_i").cast("string"),
                                     F.lit("|"), F.col("word"))),
                  F.lit(w)).cast("int")))
    sketch = (rows.groupBy("row_i", "bucket")
                  .agg(F.sum("cnt").alias("c")))
    lw = Window.partitionBy("bkt").orderBy(F.col("cnt").desc(), "word")
    gw = Window.partitionBy(F.lit(1)).orderBy(F.col("cnt").desc(),
                                               "word")
    cand = (wc.withColumn("bkt", F.pmod(F.xxhash64("word"),
                                        F.lit(salt_buckets)))
              .withColumn("lr", F.row_number().over(lw))
              .filter(F.col("lr") <= topk)
              .withColumn("rnk", F.row_number().over(gw))
              .filter(F.col("rnk") <= topk)
              .select("rnk", "word", F.col("cnt").alias("exact_cnt")))
    probes = (cand.select("rnk", "word", "exact_cnt",
                          F.explode(F.array(*[F.lit(i)
                                              for i in range(d)]))
                           .alias("row_i"))
                  .withColumn("bucket", F.pmod(
                      md5_60bit(F.concat(F.col("row_i").cast("string"),
                                         F.lit("|"), F.col("word"))),
                      F.lit(w)).cast("int")))
    return (probes.join(F.broadcast(sketch), ["row_i", "bucket"])
                  .groupBy("rnk", "word", "exact_cnt")
                  .agg(F.min("c").alias("cms_est"))
                  .select("rnk", "word", "exact_cnt", "cms_est",
                          (F.col("cms_est") - F.col("exact_cnt"))
                          .alias("overest")))
