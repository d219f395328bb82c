"""Large-scale deduplication operators: exact, MinHash+LSH, n-gram
Jaccard, SimHash (SURVEY §7 phase 6 — generalizations of the
reference's by-hand patterns: J6 similarity join, U3/U7 dedup, F1
normalization).

Design for 100 TB:
  - everything is expression-level (codegen) or one explode+shuffle;
    no driver-side state, no collect
  - MinHash signatures are computed per-row (map-only); LSH banding
    turns near-dup detection into an equi-join on (band_idx, band_key)
    — the same "block key turns a theta-join into a hash join" move as
    the reference's DOB-year blocking (fuzzy.Rmd:560-603)
  - hashes use md5 (stable across engines/runs; NOT xxhash64, whose
    values differ between Spark and the DuckDB oracle)

Determinism note: a md5-lexicographic-min is a valid MinHash family
(min over a random permutation of shingle space); k independent
functions come from salting the shingle with the function index.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bind_once(col: Column, fn) -> Column:
    """Evaluate `col` ONCE per row and hand the bound value to `fn` as
    a lambda variable. Higher-order-function lambdas run interpreted
    (outside whole-stage codegen, outside subexpression elimination),
    so an expression referenced k times inside one is re-evaluated k
    times PER ELEMENT — an n-gram transform that indexes a words()
    split n times re-runs the regex split n times per gram (the r4
    bench caught decontamination spending 13 s re-splitting 5000 docs
    ~275x each). The one-element transform trick turns the expression
    into a lambda-bound value: computed once, then O(1) references."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct). n=1 -> distinct words."""
    w = words(col)
    if n == 1:
        return F.array_distinct(w)

    def grams(ws: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(ws) - n)
        sh = F.transform(idx, lambda i: F.concat_ws(" ", *[
            F.element_at(ws, (i + j + 1).cast("int")) for j in range(n)]))
        return F.array_distinct(
            F.when(F.size(ws) >= n, sh)
             .otherwise(F.array(F.concat_ws(" ", ws))))

    return bind_once(w, grams)


def minhash_signature(shingles: Column, k: int = 8) -> Column:
    """k-wide MinHash signature: for each salt i, min over shingles of
    md5(i || '|' || shingle). Returns array<string> length k."""
    def salted(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return F.array(*[F.array_min(F.transform(shingles, salted(i)))
                     for i in range(k)])


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of (band_idx, band_key) structs where
    band_key = md5 of the band's slice — docs agreeing on ANY band are
    candidate pairs (standard LSH banding)."""
    out = []
    for b in range(bands):
        sl = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        out.append(F.struct(F.lit(b).alias("band_idx"),
                            F.md5(F.concat_ws("|", sl)).alias("band_key")))
    return F.array(*out)


def _shingle_fingerprint(sh: Column) -> Column:
    """Collapse key for byte-identical shingle arrays (md5 over the
    \\x01-joined elements — same value from DuckDB's
    md5(array_to_string(sh, chr(1))) for the oracle side)."""
    return F.md5(F.concat_ws("\x01", sh))


def _collapse_key(sh: Column, id_col: Column) -> Column:
    """Exact-first collapse key: the fingerprint for documents with at
    least one shingle; a SINGLETON key (own id) for NULL/empty shingle
    arrays. Without the guard, a NULL-text doc and an empty-text doc
    both concat_ws to '' and collapse into one 'byte-identical' group,
    whose intra pair (hardcoded jaccard 1.0) the exact_first=False
    baseline never emits — breaking the documented output-identical
    contract. Degenerate docs can't near-dup in the baseline (0/0
    jaccard is excluded), so each keeps to itself here too."""
    return (F.when(F.size(sh) >= 1, _shingle_fingerprint(sh))
             .otherwise(F.concat(F.lit("\x02id:"), id_col.cast("string"))))


def gram_tokens(sh: Column) -> Column:
    """Compress string shingles to 64-bit tokens: md5-prefix (15 hex
    chars = 60 bits) to long, ONCE per document. Every downstream
    per-pair set op then works on 8-byte longs instead of ~40-byte gram
    strings — at 100 TB this cuts the pair-verify shuffle and the
    per-pair hashing cost ~4-5×. Cross-engine exact: DuckDB's
    CAST(('0x' || substr(md5(g),1,15)) AS BIGINT) yields the identical
    token, so even the ~(n_grams²/2^61) chance of a collision merges
    the same two grams on both engines — outputs stay bit-identical."""
    hashed = F.transform(
        sh, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
                       .cast("long"))
    return F.array_distinct(hashed)


def minhash_lsh_candidates(df: DataFrame, id_col: str, text_col: str, *,
                           shingle_n: int = 1, k: int = 8,
                           bands: int = 4,
                           max_bucket: int | None = 256,
                           exact_first: bool = True) -> DataFrame:
    """End-to-end LSH candidate pairs: shingle -> minhash -> band ->
    explode -> self-equi-join on band -> distinct (id_a < id_b) pairs,
    shingles re-attached for the verify.

    Scale-critical shape: the band self-join and the pair dedup move
    ONLY (id_a, id_b) — 16 bytes a pair. A dense band bucket of B docs
    still emits B²/2 pairs, but slim ones; the wide shingle arrays are
    joined back per-id afterwards (two hash joins against the doc-count
    sized side). Carrying the arrays through the pair shuffle instead
    multiplies the shuffle by the document size — measured 190× slower
    at a 10× scale-up on template-heavy corpora (SCALING.md history).

    exact_first (DEFAULT True): collapse byte-identical shingle sets to
    one representative BEFORE banding, pair representatives, then expand
    back (rep-pair -> full bipartite between the two groups, plus all
    intra-group pairs). This is a LOSSLESS plan rewrite — identical
    texts share every band, so the expanded pair set equals the
    uncollapsed one exactly — but the quadratic band join runs on
    distinct texts only. On a corpus that is 50% exact-dup (common for
    web scrapes) the candidate join shrinks 4×.

    max_bucket (DEFAULT 256): band buckets larger than this are dropped
    BEFORE pairing (a B=10k bucket alone is 50M pairs; measured here:
    one template cluster put 3.2k docs in one bucket = 5.1M pairs at
    sf0.1, 99.4% of ALL candidates). Standard industrial recall
    tradeoff: mega-buckets are boilerplate clusters; their members
    still match through their other, more selective bands. With
    exact_first the cap counts DISTINCT texts, so exact duplicates
    can never blow a bucket past the cap. Pass None for exact LSH
    semantics (every bucket pairs)."""
    rows_per_band = k // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, shingle_n).alias("sh"),
    )
    docs = sig  # (id, sh) for the final re-attach
    members = None
    if exact_first:
        from pyspark.sql import Window
        rep = F.min("id").over(
            Window.partitionBy(_collapse_key(F.col("sh"), F.col("id"))))
        m = sig.withColumn("rep", rep)
        members = m.select("id", "rep")
        sig = m.filter(F.col("id") == F.col("rep")).select("id", "sh")
    banded = (sig.withColumn("sig", minhash_signature(F.col("sh"), k))
                 .select("id", F.explode(
                     lsh_bands(F.col("sig"), bands, rows_per_band)).alias("b")))
    if max_bucket is not None:
        from pyspark.sql import Window
        n_in_bucket = F.count(F.lit(1)).over(Window.partitionBy("b"))
        banded = (banded.withColumn("__n", n_in_bucket)
                        .filter(F.col("__n") <= max_bucket).drop("__n"))
    a = banded.select(F.col("id").alias("id_a"), F.col("b").alias("ba"))
    bd = banded.select(F.col("id").alias("id_b"), F.col("b").alias("bb"))
    pairs = (a.join(bd, (a.ba == bd.bb) & (a.id_a < bd.id_b))
              .select("id_a", "id_b")
              .dropDuplicates(["id_a", "id_b"]))
    if exact_first:
        # lossless expansion: group-vs-group bipartite for every rep
        # pair, plus within-group all-pairs. Groups are disjoint, so no
        # distinct needed; both joins ride the slim (id, rep) mapping.
        ma = members.select(F.col("rep").alias("id_a"), F.col("id").alias("xa"))
        mb = members.select(F.col("rep").alias("id_b"), F.col("id").alias("xb"))
        cross = (pairs.join(ma, "id_a").join(mb, "id_b")
                      .select(F.least("xa", "xb").alias("id_a"),
                              F.greatest("xa", "xb").alias("id_b")))
        intra = (members.alias("x")
                 .join(members.alias("y"),
                       (F.col("x.rep") == F.col("y.rep"))
                       & (F.col("x.id") < F.col("y.id")))
                 .select(F.col("x.id").alias("id_a"),
                         F.col("y.id").alias("id_b")))
        pairs = cross.unionByName(intra)
    # pin the verify stage's parallelism: slim pairs are few BYTES, so
    # AQE coalesces their exchange to 1-2 partitions — but each pair
    # costs an array-intersect downstream, so the verify would
    # serialize. An explicit numPartitions survives AQE coalescing.
    spread = min(32, df.sparkSession.sparkContext.defaultParallelism)
    pairs = pairs.repartition(spread)
    return (pairs
            .join(docs.select(F.col("id").alias("id_a"),
                              F.col("sh").alias("sh_a")), "id_a")
            .join(docs.select(F.col("id").alias("id_b"),
                              F.col("sh").alias("sh_b")), "id_b"))


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-element) arrays — single
    int/int division, cross-engine deterministic.

    Uses |A∩B| = |A|+|B|-|A∪B| (exact for distinct-element arrays) so
    only ONE hash-structure pass (array_union) runs per pair instead of
    intersect+union — this sits in the hot loop of every verify stage
    (millions of candidate pairs × ~100-element arrays)."""
    union = F.size(F.array_union(a, b))
    inter = F.size(a) + F.size(b) - union
    return inter.cast("double") / union


def minhash_near_dups(df: DataFrame, id_col: str, text_col: str, *,
                      shingle_n: int = 1, k: int = 8, bands: int = 4,
                      threshold: float = 0.7,
                      max_bucket: int | None = 256,
                      exact_first: bool = True) -> DataFrame:
    """MinHash LSH candidates verified with true Jaccard >= threshold.
    Returns (id_a, id_b, jaccard). Scale levers (exact-first collapse,
    finite bucket cap) are ON by default — see minhash_lsh_candidates."""
    pairs = minhash_lsh_candidates(df, id_col, text_col,
                                   shingle_n=shingle_n, k=k, bands=bands,
                                   max_bucket=max_bucket,
                                   exact_first=exact_first)
    return (pairs
            .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def prefix_filtered_candidates(base: DataFrame, *, threshold: float,
                               fanout: int) -> DataFrame:
    """Exact prefix-filtered candidate pairs for a Jaccard self-join
    (AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): order every doc's tokens by global document frequency
    (rarest first, ties on token value), take the prefix of length
    |d| - ceil(t*|d|) + 1, and generate candidates ONLY from pairs
    sharing a prefix token within a block. Exactness: if J(A,B) >= t
    and the prefixes were disjoint, the overlap could be at most
    ceil(t*|d|) - 1 < t*|d| <= t*|A∪B| — contradiction; so every
    qualifying pair shares a prefix token and no true pair is lost.

    Why it scales where bucketed all-pairs cannot: boilerplate tokens
    (high df) sort LAST, so prefixes hold each doc's distinctive
    tokens; candidate volume is sum over prefix tokens of df², driven
    by RARE tokens — near-linear on template-heavy corpora where the
    all-pairs join is quadratic.

    `base` is (id, blk, sh). Returns distinct (id_a, id_b) with
    id_a < id_b. Shuffle ledger: token-df agg (token-keyed), doc
    re-assembly (id-keyed), candidate join (token-keyed) — all linear
    in total gram volume."""
    toks = base.select("id", "blk", F.explode("sh").alias("tok"))
    tok_df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (toks.join(tok_df, "tok")
                  .groupBy("id", "blk")
                  .agg(F.transform(
                      F.array_sort(F.collect_list(F.struct("df", "tok"))),
                      lambda s: s["tok"]).alias("sorted_toks")))
    sz = F.size("sorted_toks")
    # ceil(sz * t) in EXACT integer arithmetic: float ceil overshoots
    # on binary-representation noise (0.55 * 100 -> 55.000000000000007
    # -> ceil 56), shortening the prefix below the exactness bound and
    # silently dropping qualifying pairs. t as a 1e9-denominator
    # rational + the SQL `div` integer division (NOT `/`, which is a
    # double divide that loses exactness past 2^53) is exact up to
    # ~9e9 distinct tokens per doc (int64 ceiling of sz * 1e9).
    # floor, NOT round: rounding UP (e.g. 2/3 -> 666666667e-9 > 2/3)
    # overestimates t exactly when sz*t is integral, making ceil_t one
    # too large and the prefix one too short — the silent-pair-drop
    # this rational encoding exists to prevent. Flooring only ever
    # UNDERestimates t, which lengthens the prefix: still lossless.
    # May differ from round() by at most 1e-9 (representation +
    # multiplication rounding can land one ulp below the integer),
    # always in the safe prefix-LENGTHENING direction.
    num = int(math.floor(float(threshold) * 10**9))
    den = 10**9
    ceil_t = F.expr(
        f"(CAST(size(sorted_toks) AS BIGINT) * {num} + {den - 1}) "
        f"div {den}")
    plen = (sz - ceil_t + 1).cast("int")
    prefix = (ranked.select("id", "blk",
                            F.explode(F.slice("sorted_toks", 1, plen))
                             .alias("ptok")))
    a = prefix.select(F.col("id").alias("id_a"), "blk", "ptok")
    b = prefix.select(F.col("id").alias("id_b"),
                      F.col("blk").alias("blk_b"),
                      F.col("ptok").alias("ptok_b"))
    return (a.join(b, (a.blk == b.blk_b) & (a.ptok == b.ptok_b)
                   & (a.id_a < b.id_b))
             .select("id_a", "id_b")
             .dropDuplicates(["id_a", "id_b"])
             .repartition(fanout))


def ngram_jaccard_join(df: DataFrame, id_col: str, text_col: str,
                       block_col: str, *, n: int = 3,
                       threshold: float = 0.1,
                       fanout: int | None = None,
                       exact_first: bool = True,
                       prefix_filter: bool | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity join within blocks (the
    brute-force verifier; LSH above is the scale path). Returns
    (id_a, id_b, jaccard >= threshold).

    Grams ride as 64-bit tokens (gram_tokens): hashed once per doc, so
    the quadratic per-pair set ops compare 8-byte longs, not gram
    strings — jaccard values are unchanged (cross-engine-identical
    hashing; see gram_tokens).

    prefix_filter (default: auto = threshold >= 0.2): route candidate
    generation through the exact AllPairs prefix filter
    (prefix_filtered_candidates) instead of the within-block all-pairs
    join. Identical output — the filter admits every pair that can
    reach the threshold — but candidate volume follows RARE-token df²,
    near-linear on boilerplate-heavy corpora. Below ~0.2 the prefix is
    nearly the whole doc and the plain bucketed all-pairs join is
    cheaper, hence the auto cutover.

    exact_first (DEFAULT True): byte-identical shingle sets within a
    block collapse to one representative before the quadratic join;
    rep pairs expand back bipartite (carrying the rep-level jaccard,
    which equals every member pair's) and within-group pairs emit
    jaccard 1.0 directly. Lossless — output set identical — so this is
    pure plan shape. Deliberately NO silent bucket/block cap here: this
    operator is the exactness baseline that measures the LSH path's
    recall; a cap would corrupt the measurement. The capped scale
    default lives in minhash_lsh_candidates.

    Skew shape: a within-block all-pairs join keyed on the block alone
    puts a B-row block's B²/2 comparisons on ONE task — AQE cannot
    split a single sort-merge key (measured: one 2.2k-doc language
    block ran 185 s while 31 cores idled). The replicated bucket join
    spreads it: side B gets bucket = hash(id) % R, side A is exploded
    over all R bucket values, and (block, bucket) becomes the equi-key
    — every pair still meets exactly once (at A's copy y = bucket(B)),
    per-key work drops to B²/R, and the only cost is replicating side
    A's shingle arrays R times (a constant). Identical output set —
    the DuckDB oracle never sees the salt.

    The probe side is also round-robin-spread first: a small parquet
    scan is ONE partition, and if Catalyst broadcasts the replicated
    side the probe's partitioning is the only parallelism left — a
    1-partition probe would serialize the whole block regardless of
    the bucket scheme."""
    from .skew import spread_for_compute
    raw = df.select(F.col(id_col).alias("id"),
                    F.col(block_col).alias("blk"),
                    gram_tokens(word_shingles(text_col, n)).alias("sh"))
    members = None
    if exact_first:
        from pyspark.sql import Window
        rep = F.min("id").over(Window.partitionBy(
            F.col("blk"), _collapse_key(F.col("sh"), F.col("id"))))
        m = raw.withColumn("rep", rep)
        members = m.select("id", "rep")
        raw = m.filter(F.col("id") == F.col("rep")).select("id", "blk", "sh")
    base = spread_for_compute(raw)
    spread = fanout or min(
        32, df.sparkSession.sparkContext.defaultParallelism)
    use_prefix = (prefix_filter if prefix_filter is not None
                  else threshold >= 0.2)
    if use_prefix:
        cand = prefix_filtered_candidates(base, threshold=threshold,
                                          fanout=spread)
        docs = base.select("id", "sh")
        rep_pairs = (cand
                     .join(docs.select(F.col("id").alias("id_a"),
                                       F.col("sh").alias("sh_a")), "id_a")
                     .join(docs.select(F.col("id").alias("id_b"),
                                       F.col("sh").alias("sh_b")), "id_b")
                     .withColumn("jaccard",
                                 jaccard(F.col("sh_a"), F.col("sh_b")))
                     .filter(F.col("jaccard") >= threshold)
                     .select("id_a", "id_b", "jaccard"))
    else:
        a = (base.select(F.col("id").alias("id_a"),
                         F.col("blk").alias("blk_a"),
                         F.col("sh").alias("sh_a"))
                 .withColumn("__y", F.explode(
                     F.array(*[F.lit(i) for i in range(spread)]))))
        b = (base.select(F.col("id").alias("id_b"),
                         F.col("blk").alias("blk_b"),
                         F.col("sh").alias("sh_b"))
                 .withColumn("__b", F.pmod(F.xxhash64("id_b"),
                                           F.lit(spread))))
        rep_pairs = (a.join(b, (a.blk_a == b.blk_b) & (a["__y"] == b["__b"])
                            & (a.id_a < b.id_b))
                      .withColumn("jaccard",
                                  jaccard(F.col("sh_a"), F.col("sh_b")))
                      .filter(F.col("jaccard") >= threshold)
                      .select("id_a", "id_b", "jaccard"))
    if not exact_first:
        return rep_pairs
    ma = members.select(F.col("rep").alias("id_a"), F.col("id").alias("xa"))
    mb = members.select(F.col("rep").alias("id_b"), F.col("id").alias("xb"))
    cross = (rep_pairs.join(ma, "id_a").join(mb, "id_b")
                      .select(F.least("xa", "xb").alias("id_a"),
                              F.greatest("xa", "xb").alias("id_b"),
                              "jaccard"))
    intra = (members.alias("x")
             .join(members.alias("y"),
                   (F.col("x.rep") == F.col("y.rep"))
                   & (F.col("x.id") < F.col("y.id")))
             .select(F.col("x.id").alias("id_a"),
                     F.col("y.id").alias("id_b"),
                     F.lit(1.0).alias("jaccard")))
    return cross.unionByName(intra)


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash over words: per-word 16-bit hash from md5 hex
    prefix; each bit contributes +1/-1; sign of the sum is the output
    bit. Near-dups differ in few bits (hamming distance).

    The per-word md5 array is lambda-bound (bind_once) before the 16
    per-bit folds — the 16 aggregate() calls would otherwise each
    re-hash every word (16x md5 per token per row)."""
    w = words(col)
    h = F.transform(w, lambda x: F.conv(F.substring(F.md5(x), 1, 4), 16, 10)
                    .cast("long"))

    def bit_contrib(mask: int):
        return lambda acc, v: acc + F.when(v.bitwiseAND(F.lit(mask)) > 0,
                                           F.lit(1)).otherwise(F.lit(-1))

    def total_of(hh: Column) -> Column:
        bits = []
        for j in range(16):
            mask = 1 << j
            contrib = F.aggregate(hh, F.lit(0), bit_contrib(mask))
            bits.append(F.when(contrib > 0, F.lit(mask)).otherwise(F.lit(0)))
        total = bits[0]
        for bcol in bits[1:]:
            total = total + bcol
        return total

    return bind_once(h, total_of)


def hamming16(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-bit simhashes (popcount of XOR
    via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_join(df: DataFrame, id_col: str, text_col: str, *,
                          max_hamming: int = 3,
                          bands: int = 4) -> DataFrame:
    """SimHash Hamming-ball join: (id_a, id_b, hamming) for every pair
    of documents whose 16-bit simhashes differ in <= max_hamming bits —
    the pairing half that dedup_simhash's fingerprints feed.

    Blocking is the pigeonhole trick: split the 16 bits into `bands`
    contiguous slices; two hashes within Hamming distance
    < bands MUST agree exactly on at least one slice, so candidates
    come from equi-joins on (band_index, band_bits) — never an
    all-pairs theta-join — and the exact hamming16 post-filter keeps
    the output identical to brute force whenever max_hamming < bands
    (the default 3 < 4 preserves exactness; larger radii trade recall,
    same contract as LSH). Each band's bits come from shiftright+mask
    (pure codegen); candidate dedup is on the slim (id, id) pair."""
    bits_per = 16 // bands
    mask = (1 << bits_per) - 1
    h = df.select(F.col(id_col).alias("id"),
                  simhash16(text_col).cast("long").alias("h"))
    slices = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftright(F.col("h"), i * bits_per)
                  .bitwiseAND(F.lit(mask)).alias("key"))
        for i in range(bands)])
    banded = h.select("id", "h", F.explode(slices).alias("s")) \
              .select("id", "h", F.col("s.band").alias("band"),
                      F.col("s.key").alias("key"))
    a = banded.select(F.col("id").alias("id_a"), F.col("h").alias("ha"),
                      "band", "key")
    b = banded.select(F.col("id").alias("id_b"), F.col("h").alias("hb"),
                      F.col("band").alias("band_b"),
                      F.col("key").alias("key_b"))
    return (a.join(b, (F.col("band") == F.col("band_b"))
                   & (F.col("key") == F.col("key_b"))
                   & (F.col("id_a") < F.col("id_b")))
             .select("id_a", "id_b",
                     hamming16(F.col("ha"), F.col("hb")).alias("hamming"))
             .filter(F.col("hamming") <= max_hamming)
             .dropDuplicates(["id_a", "id_b"]))


def dedup_lines_global(df: DataFrame, id_col: str, text_col: str, *,
                       min_chars: int = 1) -> DataFrame:
    """C4-style global line deduplication: every line that occurs more
    than once ANYWHERE in the corpus survives only at its first
    occurrence (lowest (doc_id, line_no)); all other copies are
    removed and each document is reassembled from its surviving lines
    in order. Returns (id, text, n_lines, n_removed) for every doc —
    a doc whose lines are all removed comes back with empty text, not
    dropped (drop accounting stays with the caller).

    Lines shorter than min_chars (after trim) are kept verbatim and
    never participate in dedup (blank separators would otherwise all
    collapse to one).

    Scale shape: posexplode to (id, line_no, line) is map-side; the
    keep/remove decision is ONE window over md5(line) — a slim
    128-bit key (collision odds ~n²/2^129, negligible even at 1e10+
    lines, unlike a 64-bit hash whose birthday collisions WOULD
    falsely delete unique lines at that scale); reassembly is a
    per-doc sort+concat on the (id)-keyed groupBy. Two shuffles
    total, both on high-cardinality keys."""
    from pyspark.sql import Window

    lines = (df.select(F.col(id_col).alias("__id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                        .alias("line_no", "line")))
    eligible = F.length(F.trim("line")) >= min_chars
    # Ineligible lines (blank separators, sub-min_chars) are kept
    # verbatim and must NOT share a window partition: every blank line
    # in the corpus has md5('') and would land in ONE task — the same
    # degenerate-key skew _collapse_key guards against for shingles.
    # Give each ineligible line its own singleton partition key.
    part_key = F.when(eligible, F.md5("line")).otherwise(
        F.concat_ws("\x01", F.col("__id").cast("string"),
                    F.col("line_no").cast("string")))
    w = Window.partitionBy(part_key).orderBy("__id", "line_no")
    first = F.row_number().over(w) == 1
    kept = (lines.withColumn("__keep", ~eligible | first)
                 .withColumn("__removed", (~F.col("__keep")).cast("long")))
    rebuilt = (kept.groupBy("__id")
                   .agg(F.concat_ws("\n", F.transform(
                            F.array_sort(F.collect_list(F.when(
                                F.col("__keep"),
                                F.struct("line_no", "line")))),
                            lambda s: s["line"])).alias("__text"),
                        F.count(F.lit(1)).cast("long").alias("n_lines"),
                        F.sum("__removed").cast("long").alias("n_removed")))
    return (df.select(F.col(id_col).alias("__id"))
              .join(rebuilt, "__id", "left")
              .select(F.col("__id").alias(id_col),
                      F.coalesce("__text", F.lit("")).alias(text_col),
                      F.coalesce("n_lines", F.lit(0).cast("long"))
                       .alias("n_lines"),
                      F.coalesce("n_removed", F.lit(0).cast("long"))
                       .alias("n_removed")))


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", *, max_iter: int = 15) -> DataFrame:
    """Duplicate-cluster resolution: min-label connected components over
    an undirected near-dup pair list -> (id, cluster_id), cluster_id =
    smallest member id (the deterministic canonical pick; generalizes
    the reference's sequential dedup-and-reroute, fuzzy.Rmd:907,1189).

    Each round does one-hop min-propagation over the edge list plus a
    pointer-jump (label <- label's label), so convergence is O(log
    diameter) rounds, not O(diameter). Every round is two equi-joins +
    one agg — all shuffles ride the node id. `localCheckpoint` truncates
    the iterative lineage (the plan would otherwise grow exponentially
    and re-execute from the scan each round); early-stop is a changed-
    label count, the only driver-visible number per round. At 100 TB
    scale swap the codebook-free early stop for a fixed log2(n) round
    budget to avoid the per-round action, or large-star/small-star if
    components themselves are huge.
    """
    e = pairs.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    edges = (e.union(e.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))
              .distinct().localCheckpoint())
    labels = (edges.select(F.col("src").alias("id")).distinct()
                   .select("id", F.col("id").alias("lab")).localCheckpoint())
    for _ in range(max_iter):
        nbr = (edges.join(labels, edges.src == labels.id)
                    .select(F.col("dst").alias("id"), "lab")
                    .groupBy("id").agg(F.min("lab").alias("nlab")))
        one_hop = (labels.join(nbr, "id", "left")
                         .select("id", F.least(
                             "lab", F.coalesce("nlab", F.col("lab"))).alias("lab")))
        a, b = one_hop.alias("a"), one_hop.alias("b")
        jumped = (a.join(b, F.col("a.lab") == F.col("b.id"), "left")
                   .select(F.col("a.id").alias("id"),
                           F.least(F.col("a.lab"),
                                   F.coalesce(F.col("b.lab"),
                                              F.col("a.lab"))).alias("lab")))
        new_labels = jumped.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), F.col("n.id") == F.col("o.id"))
                   .filter(F.col("n.lab") != F.col("o.lab")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("lab").alias("cluster_id"))


def minhash_index(df: DataFrame, id_col: str, text_col: str, *,
                  shingle_n: int = 1, k: int = 8, bands: int = 4) -> DataFrame:
    """Build the persistable LSH index of a corpus: one row per
    (band_idx, band_key, id) with the doc's shingle set attached.

    This is the incremental-dedup path at 100 TB: hash the corpus ONCE,
    persist this table bucketed on band_key (sinks.write_bucketed), and
    dedup each incoming batch by probing the index (query_minhash_index)
    — the corpus is never re-shingled, and the probe join co-locates on
    the bucketed band key with no corpus-side shuffle. Mirrors the
    reference's processed-ledger pattern (T1, phl.Rmd:776-779) applied
    to near-dup state instead of exact keys.
    """
    rows_per_band = k // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, shingle_n).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), k))
    return (sig.select(
                "id", "sh",
                F.explode(lsh_bands(F.col("sig"), bands, rows_per_band)).alias("b"))
            .select(F.col("b.band_idx").alias("band_idx"),
                    F.col("b.band_key").alias("band_key"), "id", "sh"))


def query_minhash_index(index: DataFrame, batch: DataFrame,
                        id_col: str, text_col: str, *,
                        shingle_n: int = 1, k: int = 8, bands: int = 4,
                        threshold: float = 0.7) -> DataFrame:
    """Probe a minhash_index with a new batch: band the batch with the
    SAME parameters, equi-join on (band_idx, band_key), verify true
    Jaccard >= threshold. Returns (batch_id, corpus_id, jaccard) — the
    batch rows to drop (or cluster) against the existing corpus.

    Batch and corpus ids must be disjoint; intra-batch dups are the
    batch's own minhash_near_dups pass."""
    probe = minhash_index(batch, id_col, text_col,
                          shingle_n=shingle_n, k=k, bands=bands)
    cand = (probe.alias("p")
            .join(index.alias("i"),
                  (F.col("p.band_idx") == F.col("i.band_idx"))
                  & (F.col("p.band_key") == F.col("i.band_key")))
            .select(F.col("p.id").alias("batch_id"),
                    F.col("i.id").alias("corpus_id"),
                    F.col("p.sh").alias("sh_b"), F.col("i.sh").alias("sh_c"))
            .dropDuplicates(["batch_id", "corpus_id"]))
    scored = cand.withColumn(
        "jaccard", F.round(jaccard(F.col("sh_b"), F.col("sh_c")), 6))
    return (scored.filter(F.col("jaccard") >= threshold)
                  .select("batch_id", "corpus_id", "jaccard"))


def lcg_bucket(col: Column, mod: int) -> Column:
    """Deterministic engine-portable pseudo-random bucket in [0, mod):
    bits 16+ of the ANSI-C LCG (1103515245 * x + 12345), taken mod
    `mod`. The LCG's LOW bits are famously degenerate (the multiplier
    is ≡5 mod 10, so raw % 10 only ever yields {0,5}) — slice the high
    bits exactly like C rand() does. Plain int64 arithmetic, so the
    same value falls out of Spark, DuckDB, or anything else —
    deliberately NOT Spark's hash()/rand(), which are engine-private.
    (x % (65536*mod)) // 65536 == (x >> 16) % mod; the remainder stays
    < 65536*mod so the double division is exact."""
    lcg = col * F.lit(1103515245) + F.lit(12345)
    return F.floor((lcg % F.lit(65536 * mod)) / F.lit(65536))


def leakage_safe_split(df: DataFrame, id_col: str, text_col: str, *,
                       train_buckets: int = 8, mod: int = 10,
                       split_col: str = "split") -> DataFrame:
    """Duplicate-cluster-aware train/holdout split: every row whose
    text is byte-identical lands on the SAME side, so exact duplicates
    can never leak from train into holdout (the train/eval-contamination
    failure mode of naive row-hash splits).

    Mechanics: group key = md5(text); cluster canonical = min(id) via a
    window (ONE shuffle on the 128-bit hash — never on the text, and no
    second join-back pass); side = lcg_bucket(canonical, mod) <
    train_buckets (see lcg_bucket for why the high-bit slice).

    Generalization of the reference's dedup-before-route invariant
    (read_all_data.Rmd:333-346: one canonical copy per GISAID_ID
    decides, partners follow)."""
    th = F.md5(F.col(text_col))
    from pyspark.sql import Window
    canonical = F.min(F.col(id_col)).over(Window.partitionBy(th))
    side = F.when(lcg_bucket(canonical, mod) < train_buckets,
                  F.lit("train")).otherwise(F.lit("holdout"))
    return df.select(F.col(id_col),
                     canonical.alias("canonical_doc_id"),
                     side.alias(split_col))


def minhash_calibration(df: DataFrame, id_col: str, text_col: str, *,
                        shingle_n: int = 1, k: int = 8, bands: int = 4,
                        max_bucket: int | None = 256,
                        round_to: int = 6) -> DataFrame:
    """Estimator-vs-truth calibration of the MinHash pipeline: for
    every LSH candidate pair, the signature-agreement Jaccard
    estimate (matching components / k — the unbiased MinHash
    estimator) next to the exact shingle Jaccard, with the signed
    error. This is the measurement that justifies k and the verify
    threshold: the estimator's stderr is sqrt(J(1-J)/k), so k=8 is
    only a coarse screen — the distribution of `err` over real
    candidates is what says whether banding alone could replace the
    exact verify (it can't at k=8; this query shows by how much).

    Returns (id_a, id_b, est_jaccard, true_jaccard, err) per
    candidate pair. Signatures come from a per-doc signature table
    joined by id (the minhash_index layout) — computed ONCE per doc,
    O(N * k * |shingles|) md5 work, not once per pair: on a
    template-heavy corpus a dense bucket emits B^2/2 pairs and a
    per-pair recompute would multiply signature cost by the pair
    fan-in."""
    pairs = minhash_lsh_candidates(df, id_col, text_col,
                                   shingle_n=shingle_n, k=k,
                                   bands=bands, max_bucket=max_bucket)
    sigs = df.select(
        F.col(id_col).alias("__sid"),
        minhash_signature(word_shingles(text_col, shingle_n), k)
         .alias("__sig"))
    pairs = (pairs
             .join(sigs.select(F.col("__sid").alias("id_a"),
                               F.col("__sig").alias("sig_a")), "id_a")
             .join(sigs.select(F.col("__sid").alias("id_b"),
                               F.col("__sig").alias("sig_b")), "id_b"))
    eq = F.size(F.filter(
        F.zip_with(F.col("sig_a"), F.col("sig_b"),
                   lambda x, y: x == y), lambda z: z))
    est = eq.cast("double") / F.lit(float(k))
    jac = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (pairs.select("id_a", "id_b",
                         est.alias("est_jaccard"),
                         F.round(jac, round_to).alias("true_jaccard"),
                         F.round(est - jac, round_to).alias("err")))


#: minhash_contamination broadcasts the BENCH (eval-set) side of its
#: bipartite band join by design — an eval set is MBs. The cap makes
#: that assumption self-enforcing (the all-pairs-baseline-gate
#: precedent, similarity.ALL_PAIRS_BASELINE_CAP): a caller passing a
#: corpus-sized frame as `bench` gets a clear error up front, not a
#: driver OOM when the broadcast build materializes.
BENCH_BROADCAST_CAP = 1_000_000


def minhash_contamination(corpus: DataFrame, bench: DataFrame,
                          id_col: str, text_col: str, *,
                          shingle_n: int = 1, k: int = 8,
                          bands: int = 4,
                          threshold: float = 0.7) -> DataFrame:
    """FUZZY benchmark decontamination: corpus documents that are
    near-duplicates of an eval-set document, found by a BIPARTITE
    MinHash band join — the screen that catches paraphrased or
    lightly-edited test-set leakage that exact n-gram overlap
    (ngram_contamination) misses. Returns (id, bench_id, jaccard)
    for every corpus/bench pair with true shingle Jaccard >=
    threshold.

    Scale shape: both sides exact-first COLLAPSE byte-identical
    shingle sets to a representative (lossless — identical texts
    share every band, and Jaccard depends only on the shingle set,
    so banding, verify, and the threshold all commute with the
    collapse; the minhash_lsh_candidates default applied bipartite),
    band independently, and the band join moves slim (rep, band)
    rows with the BENCH side broadcast (an eval set is MBs by
    definition — that asymmetry is the whole design), so candidate
    volume is bounded by DISTINCT-text bench bucket occupancy, not
    corpus^2 — on a template-heavy corpus the pair verify shrinks by
    the duplication factor. Dense band buckets are further pruned by
    the LENGTH-RATIO filter from the set-similarity-join literature,
    applied INSIDE the broadcast band join on a carried set-size
    column: J(A,B) = |A∩B|/|A∪B| <= min(|A|,|B|)/max(|A|,|B|), so
    any pair failing min/max >= threshold cannot reach the
    threshold and is dropped map-side — LOSSLESS for the thresholded
    output (the double-precision compare only errs permissive:
    float64(0.7) < 7/10), and it kills exactly the dense-bucket
    cross-size pairs that drive superlinear candidate growth.
    Shingle arrays re-attach per-rep for the exact-Jaccard verify
    (loss-free above the threshold for pairs sharing a band);
    members expand back through two slim joins AFTER the threshold,
    so the verify itself runs once per distinct pair. No bucket cap:
    that is a self-join lever — here every candidate touches the
    tiny side. The tiny-side assumption is ENFORCED: a bounded
    limit+count probe (never a full scan) raises when bench exceeds
    BENCH_BROADCAST_CAP rows."""
    from pyspark.sql import Window

    cap = BENCH_BROADCAST_CAP
    if bench.limit(cap + 1).count() > cap:
        raise ValueError(
            f"minhash_contamination broadcasts the bench side of its "
            f"bipartite band join and refuses bench inputs over {cap} "
            f"rows; swap the arguments (the corpus side is never "
            f"broadcast) or pre-partition the eval set.")
    rows_per_band = k // bands

    def prep(df: DataFrame, name: str) \
            -> tuple[DataFrame, DataFrame, DataFrame]:
        sig = df.select(F.col(id_col).alias(name),
                        word_shingles(text_col, shingle_n)
                         .alias(f"sh_{name}"))
        rep = F.min(name).over(Window.partitionBy(
            _collapse_key(F.col(f"sh_{name}"), F.col(name))))
        m = sig.withColumn("rep", rep)
        members = m.select(name, F.col("rep").alias(f"rep_{name}"))
        reps = (m.filter(F.col(name) == F.col("rep"))
                 .select(F.col(name).alias(f"rep_{name}"),
                         f"sh_{name}"))
        banded = (reps.withColumn(
                      "sig", minhash_signature(F.col(f"sh_{name}"), k))
                      .select(f"rep_{name}",
                              F.size(f"sh_{name}").alias(f"n_{name}"),
                              F.explode(
                          lsh_bands(F.col("sig"), bands, rows_per_band))
                           .alias("b")))
        return members, reps, banded

    cmem, creps, cband = prep(corpus, "id")
    bmem, breps, bband = prep(bench, "bench_id")
    # length-ratio prune inside the broadcast hash join: J >= t
    # forces min(|A|,|B|)/max(|A|,|B|) >= t, so the size compare
    # discards dense-bucket cross-size candidates before they ever
    # reach the distinct or the array re-attach. The 1e-9 slack
    # dwarfs any float rounding of t or of t*max, so the prune can
    # only err PERMISSIVE — the thresholded output is unchanged.
    size_ok = (F.least("n_id", "n_bench_id").cast("double")
               >= F.lit(float(threshold) - 1e-9)
               * F.greatest("n_id", "n_bench_id").cast("double"))
    rep_pairs = (cband.join(F.broadcast(bband), "b")
                      .filter(size_ok)
                      .select("rep_id", "rep_bench_id")
                      .dropDuplicates(["rep_id", "rep_bench_id"]))
    scored = (rep_pairs
              .join(creps, "rep_id")
              .join(F.broadcast(breps), "rep_bench_id")
              .withColumn("jaccard",
                          jaccard(F.col("sh_id"), F.col("sh_bench_id")))
              .filter(F.col("jaccard") >= threshold)
              .select("rep_id", "rep_bench_id", "jaccard"))
    return (scored
            .join(cmem, "rep_id")
            .join(F.broadcast(bmem), "rep_bench_id")
            .select("id", "bench_id", "jaccard"))
