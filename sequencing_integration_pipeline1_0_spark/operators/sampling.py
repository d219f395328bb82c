"""Deterministic corpus-sampling operators (training-data mixing).

A pretraining pipeline controls its domain mix by up/down-sampling
per-source slices. At 100 TB the only acceptable shape is: a TINY
per-domain aggregate (broadcast), then a pure map-side keep/drop
predicate on the fact rows — no shuffle of the corpus, no rand()
(engine-private, not reproducible across reruns or engines), no
driver-side row loops.

Selection uses lcg_bucket (dedupe_scale): an id-seeded, engine-portable
pseudo-random bucket, so the SAME rows are kept on every run, any
engine — sampling becomes a reproducible, auditable transformation,
which is what makes dataset cards and ablations honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedupe_scale import lcg_bucket, words

#: bucket space for keep-rates; rate resolution = 1/4096
RATE_DENOM = 4096

#: sample_temperature's default corpus-budget fraction — module-level
#: so the SQL oracle (catalog._TEMPERATURE_SQL) interpolates the SAME
#: value the keyword default binds (advice r4: no hand-copied literal)
TEMPERATURE_BUDGET_FRAC = 0.5


def sample_balanced(df: DataFrame, domain_col: str, id_col: str, *,
                    rate_denom: int = RATE_DENOM) -> DataFrame:
    """Downsample every domain to ~the smallest domain's row count
    (uniform mix). keep_buckets(domain) = max(1,
    floor(min_count * rate_denom / count)); a row survives when
    lcg_bucket(id, rate_denom) < keep_buckets.

    Plan shape: groupBy(domain) count -> 1-row global min (scalar
    broadcast) -> per-domain rate dim (broadcast) -> map-side filter.
    The corpus itself never shuffles. max(1, ...) guarantees no domain
    is silently annihilated (a domain >rate_denom× larger than the
    smallest keeps a 1/rate_denom sliver — log it, don't lose it).

    min_count * rate_denom stays exact in double up to 2^53 (rate_denom
    is a power of two, so the product only shifts the mantissa)."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    min_n = counts.agg(F.min("__n").alias("__min_n"))
    rates = (counts.join(F.broadcast(min_n))
             .select(domain_col,
                     F.greatest(
                         F.lit(1),
                         F.floor(F.col("__min_n") * rate_denom / F.col("__n")))
                      .alias("__keep_buckets")))
    return (df.join(F.broadcast(rates), domain_col)
              .filter(lcg_bucket(F.col(id_col), rate_denom)
                      < F.col("__keep_buckets"))
              .drop("__keep_buckets"))


def sample_fraction(df: DataFrame, id_col: str, fraction: float, *,
                    rate_denom: int = RATE_DENOM) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep ~fraction of rows,
    same rows every run/engine (id-seeded bucket < fraction *
    rate_denom). Zero-shuffle, pure map-side."""
    keep = int(fraction * rate_denom)
    return df.filter(lcg_bucket(F.col(id_col), rate_denom) < F.lit(keep))


def sample_stratified_exact(df: DataFrame, stratum_col: str, id_col: str,
                            n_per_stratum: int, *,
                            salt_buckets: int = 16,
                            rate_denom: int = RATE_DENOM) -> DataFrame:
    """Exact-N-per-stratum sample: within each stratum keep the N rows
    with the smallest id-seeded LCG draw (ties -> lower id) — the
    deterministic analogue of dplyr's slice_sample(n=) the reference
    leans on for review batches, and the exact-count complement of
    sample_balanced's rate-based mix.

    Scale shape: a naive window over the stratum key puts each whole
    stratum (100 TB / #strata) through ONE task. Instead, two lossless
    stages: (1) rank within (stratum, hash(id) % salt_buckets) — wide
    parallelism — and keep each salted slice's top N; the global
    per-stratum top N by (draw, id) must survive, because a row beaten
    by N rows in its own slice is beaten by N rows globally; (2)
    re-rank the <= salt_buckets * N survivors per stratum — tiny.
    Output: (id, stratum, sample_rank), sample_rank in draw order."""
    from pyspark.sql import Window
    draw = lcg_bucket(F.col(id_col), rate_denom)
    t = df.select(F.col(id_col).alias("id"),
                  F.col(stratum_col).alias("stratum"),
                  draw.alias("__draw"))
    w1 = (Window.partitionBy("stratum",
                             F.pmod(F.xxhash64("id"), F.lit(salt_buckets)))
                .orderBy("__draw", "id"))
    cand = (t.withColumn("__rn", F.row_number().over(w1))
             .filter(F.col("__rn") <= n_per_stratum))
    w2 = Window.partitionBy("stratum").orderBy("__draw", "id")
    return (cand.withColumn("sample_rank",
                            F.row_number().over(w2).cast("int"))
                .filter(F.col("sample_rank") <= n_per_stratum)
                .select("id", "stratum", "sample_rank"))


def pack_token_budget(df: DataFrame, id_col: str, text_col: str,
                      shard_col: str, budget: int) -> DataFrame:
    """Greedy sequential context-window packing: docs are laid end to
    end in (shard, id) order and each doc joins the pack its START
    token offset falls into — pack_id = floor(exclusive-prefix-sum /
    budget). The classic pretraining batch-construction step, expressed
    as one window prefix sum.

    Scale shape: the running sum is PER SHARD (one shuffle on the shard
    key) — a single global ordering would funnel 100 TB through one
    partition, so callers pick a shard key that bounds per-shard volume
    (date, source, hash-prefix); packs are then globally unique as
    (shard, pack_id). budget is a power of two in the callers we ship,
    keeping floor(x / budget) an exact mantissa shift in any engine."""
    from pyspark.sql import Window
    from .dedupe_scale import words
    n_tokens = F.size(words(text_col)).cast("long")
    t = df.select(F.col(id_col), F.col(shard_col),
                  n_tokens.alias("n_tokens"))
    w = (Window.partitionBy(shard_col).orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.withColumn("pack_id",
                        F.floor(start / F.lit(budget)).cast("long"))


def sample_temperature(df: DataFrame, domain_col: str, id_col: str, *,
                       alpha: float = 0.5,
                       budget_frac: float = TEMPERATURE_BUDGET_FRAC,
                       rate_denom: int = RATE_DENOM) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-LM alpha-
    sampling rule): target share of domain d is n_d^alpha normalized —
    alpha < 1 flattens the mixture toward low-resource domains without
    the uniform mix's brutal downsampling of the head. Every row is
    emitted with its decision (domain count, keep_buckets, kept flag),
    including rows whose domain is NULL (null-safe join; NULL is a
    domain like any other), so the sample is auditable, re-runnable,
    and engine-portable.

    Budget handling: domains whose n^alpha share exceeds their size
    cap at keep-everything, and ONE redistribution round hands their
    unused budget to the uncapped domains (exact waterfilling when at
    most one cap round triggers — the common case; a second-round cap
    keeps everything in that domain too, slightly under-filling the
    budget rather than over-drawing). The no-annihilation floor of
    sample_balanced applies: no domain drops below 1/rate_denom.

    Determinism: alpha=0.5 rides F.sqrt (IEEE correctly-rounded, so
    bit-identical across engines — pow() is NOT and would flake a
    cross-engine gate; other alphas are supported but carry that
    caveat). sqrt values quantize to 1e-6 and sum in DECIMAL (the
    house partition-order-exact pattern); the keep decision is the
    engine-portable lcg_bucket, never rand().

    Plan shape: ONE pass over the corpus for the per-domain counts
    (the budget derives from their sum, not a second scan), scalar +
    dim broadcasts back, map-side keep predicate; the corpus never
    shuffles."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = F.sqrt(F.col("cnt")) if alpha == 0.5 \
        else F.pow(F.col("cnt"), F.lit(alpha))
    sq = counts.select(F.col(domain_col).alias("__dom"), "cnt",
                       F.round(w, 6).cast("decimal(18,6)").alias("sq"))
    tot = sq.agg(
        F.sum("sq").alias("total_dec"),
        F.expr(f"CAST(floor(sum(cnt) * {budget_frac}) AS BIGINT)")
         .alias("budget"))
    r0 = (sq.join(F.broadcast(tot))
            .withColumn("rate0",
                        (F.col("budget") * F.col("sq").cast("double")
                         / F.col("total_dec").cast("double"))
                        / F.col("cnt")))
    capped = F.col("rate0") >= 1.0
    adj = r0.agg(
        F.coalesce(F.sum(F.when(capped, F.col("cnt"))),
                   F.lit(0).cast("long")).alias("cap_n"),
        F.coalesce(F.sum(F.when(capped, F.col("sq"))),
                   F.lit(0).cast("decimal(18,6)")).alias("cap_sq"))
    rate = F.round(
        F.least(F.lit(1.0),
                ((F.col("budget") - F.col("cap_n"))
                 * F.col("sq").cast("double")
                 / (F.col("total_dec") - F.col("cap_sq")).cast("double"))
                / F.col("cnt")), 6)
    rates = (r0.join(F.broadcast(adj))
               .select("__dom", "cnt",
                       F.when(capped, F.lit(rate_denom).cast("long"))
                        .otherwise(F.greatest(
                            F.lit(1).cast("long"),
                            F.floor(rate * rate_denom).cast("long")))
                        .alias("keep_buckets")))
    return (df.join(F.broadcast(rates),
                    F.col(domain_col).eqNullSafe(F.col("__dom")))
              .select(F.col(id_col),
                      F.col(domain_col).alias("domain"),
                      F.col("cnt").cast("long").alias("n_domain"),
                      "keep_buckets",
                      (lcg_bucket(F.col(id_col), rate_denom)
                       < F.col("keep_buckets")).cast("int").alias("kept")))


#: DSIR defaults; the oracle SQL (catalog._DSIR_SQL) interpolates the
#: SAME values the keyword defaults bind
DSIR_N_BUCKETS = 64
DSIR_TOPK = 100


def dsir_log_weights(df: DataFrame, id_col: str, text_col: str,
                     is_target, *, n_buckets: int = DSIR_N_BUCKETS,
                     round_to: int = 6) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how much more likely its hashed-unigram features are
    under a TARGET domain's token distribution than under the raw
    corpus's. Tokens hash into n_buckets buckets (the paper's hashed
    n-gram feature space — collisions are the point: the model stays
    a fixed-size broadcastable dim no matter the vocabulary), both
    distributions are Laplace-smoothed bucket frequencies over a full
    bucket spine, and a doc's weight is the sum over its tokens of
    round(ln p_target(b) - ln p_raw(b), round_to).

    `is_target` is a boolean Column over df's rows marking the target
    exemplars (they stay in the raw pool too, as in the paper: raw =
    the whole crawl, target = the trusted slice).

    Returns (id, n_tokens, w) for every doc with >=1 token; w is the
    DECIMAL(28,r) exact sum of quantized per-bucket log-ratios, so it
    is partition-order independent and oracle-exact (the house
    unigram_doc_score discipline). Token-less docs drop out — they
    carry no evidence either way and a selector takes top-k anyway.

    Scale shape: the bucket LM is one n_buckets-row agg (map-side
    combinable) finished by bounded spine windows; it broadcast-joins
    back onto the exploded corpus (map-side), then one groupBy(id)
    partial-aggregating sum. The corpus text never shuffles."""
    tok_bucket = (F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10)
                   .cast("int") % n_buckets)
    toks = df.select(
        F.col(id_col).alias("__id"),
        is_target.alias("__is_t"),
        F.explode(F.filter(words(text_col), lambda x: x != ""))
         .alias("tok"))
    b = toks.select("__id", "__is_t", tok_bucket.alias("bkt"))
    spine = (df.sparkSession.range(0, n_buckets)
               .select(F.col("id").cast("int").alias("bkt")))
    cnt = (b.groupBy("bkt")
            .agg(F.sum(F.col("__is_t").cast("long")).alias("n_t"),
                 F.count(F.lit(1)).alias("n_r")))
    cnt = (spine.join(cnt, "bkt", "left")
                .select("bkt",
                        F.coalesce("n_t", F.lit(0).cast("long"))
                         .alias("n_t"),
                        F.coalesce("n_r", F.lit(0).cast("long"))
                         .alias("n_r")))
    from pyspark.sql import Window
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    tt = F.sum("n_t").over(w_all)
    tr = F.sum("n_r").over(w_all)
    bb = float(n_buckets)
    lr = F.round(F.log((F.col("n_t") + 1.0) / (tt + bb))
                 - F.log((F.col("n_r") + 1.0) / (tr + bb)),
                 round_to).cast(f"decimal(18,{round_to})")
    lm = cnt.select("bkt", lr.alias("lr"))
    return (b.join(F.broadcast(lm), "bkt")
             .groupBy("__id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                  F.sum("lr").alias("w"))
             .select(F.col("__id").alias(id_col), "n_tokens", "w"))


def dsir_select_topk(df: DataFrame, id_col: str, text_col: str,
                     is_target, *, n_buckets: int = DSIR_N_BUCKETS,
                     k: int = DSIR_TOPK,
                     round_to: int = 6) -> DataFrame:
    """DSIR selection: the k raw documents whose hashed-unigram
    importance weight (dsir_log_weights) is highest — the docs that
    look most like the target domain. Deterministic rank (weight
    desc, id asc) stands in for the paper's Gumbel-top-k resampling:
    add engine-portable Gumbel noise (-ln(-ln(u)) with u from
    lcg_bucket) to w before ranking to get the sampled variant;
    certification pins the noiseless rank.

    Scale shape: orderBy(...).limit(k) compiles to TakeOrdered —
    per-partition top-k then a k-row driver merge; the full weight
    table never globally sorts."""
    scored = dsir_log_weights(df, id_col, text_col, is_target,
                              n_buckets=n_buckets, round_to=round_to)
    return (scored.orderBy(F.col("w").desc(), id_col)
                  .limit(k)
                  .select(id_col, "n_tokens",
                          F.round(F.col("w").cast("double"), round_to)
                           .alias("logratio")))


#: Gumbel resampling defaults (oracle-interpolated)
DSIR_GUMBEL_DENOM = 4096
DSIR_GUMBEL_TAU = 1.0


def dsir_gumbel_topk(df: DataFrame, id_col: str, text_col: str,
                     is_target, *, n_buckets: int = DSIR_N_BUCKETS,
                     k: int = DSIR_TOPK, tau: float = DSIR_GUMBEL_TAU,
                     denom: int = DSIR_GUMBEL_DENOM,
                     round_to: int = 6) -> DataFrame:
    """DSIR's actual resampling step (Xie et al. 2023 §3): sample k
    docs WITHOUT replacement with probability proportional to
    exp(w/tau) via the Gumbel-top-k trick — rank by w + tau * g where
    g = -ln(-ln(u)) is standard Gumbel noise. u comes from lcg_bucket
    (id-seeded, engine-portable), u = (bucket + 0.5) / denom — strictly
    inside (0,1), so g is always finite — making the SAMPLE itself
    reproducible across reruns and engines (the module-header rand()
    ban), hence certifiable: the oracle draws the same noise.
    tau -> 0 degenerates to dsir_select_topk's argmax rank; larger tau
    admits more diversity from the raw pool.

    Returns (id, n_tokens, logratio, gumbel_key) for the k sampled
    docs, key ties broken by id.

    Scale shape: dsir_log_weights (broadcast bucket LM, one groupBy)
    + a map-side noise column + TakeOrdered."""
    scored = dsir_log_weights(df, id_col, text_col, is_target,
                              n_buckets=n_buckets, round_to=round_to)
    u = ((lcg_bucket(F.col(id_col), denom) + 0.5)
         / F.lit(float(denom)))
    g = -F.log(-F.log(u))
    key = F.round(F.col("w").cast("double") + F.lit(tau) * g, round_to)
    return (scored.select(id_col, "n_tokens",
                          F.round(F.col("w").cast("double"), round_to)
                           .alias("logratio"),
                          key.alias("gumbel_key"))
                  .orderBy(F.col("gumbel_key").desc(), id_col)
                  .limit(k))


#: training-shard manifest defaults; oracle SQL interpolates these
TRAIN_N_SHARDS = 16


def train_shard_manifest(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", *,
                         n_shards: int = TRAIN_N_SHARDS) -> DataFrame:
    """Deterministic global corpus shuffle + shard layout — the step
    that turns a curated corpus into training shards (WebDataset/MDS
    style): every doc gets a shard by id-hash, a pseudo-random
    position within its shard (ordering by the md5 hash IS the
    shuffle — reproducible, seedless, and independent of input
    order), its token count, and the exclusive prefix-sum token
    offset a sequential shard writer would place it at.

    Scale shape: ONE hash shuffle of slim (id, hash, n_tokens) rows
    into n_shards groups, then a per-shard sort — never a global
    ordering (a single total order funnels 100 TB through one
    partition; per-shard order is exactly what a shard writer needs).
    md5-hex order is engine-portable (lowercase hex compares
    identically as binary in Spark and DuckDB)."""
    from pyspark.sql import Window

    from .dedupe_scale import words
    h = F.md5(F.col(id_col).cast("string"))
    n_tokens = F.size(
        words(F.coalesce(F.col(text_col), F.lit("")))).cast("int")
    t = df.select(
        F.col(id_col),
        h.alias("h"),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
         % n_shards).cast("int").alias("shard_id"),
        n_tokens.alias("n_tokens"))
    w = Window.partitionBy("shard_id").orderBy("h", id_col)
    prefix = w.rowsBetween(Window.unboundedPreceding, -1)
    return (t.select(
                id_col, "shard_id",
                (F.row_number().over(w) - 1).cast("int")
                 .alias("pos_in_shard"),
                "n_tokens",
                F.coalesce(F.sum("n_tokens").over(prefix), F.lit(0))
                 .cast("bigint").alias("token_offset")))
