"""Scaling probe: time representative queries at sf0.001 / sf0.01 /
sf0.1 (100× input range) and write SCALING.md with the measured
times and the sf0.01→sf0.1 growth factor (the informative one — at
sf0.001 fixed JVM/planning overhead dominates every query).

A query whose 10×-input growth factor stays well under 10× is
overhead-bound; near 10× is linear in data; above ~10× signals a
superlinear shape (a pair blowup or an unblocked join) — the thing
this engine's blocked/broadcast designs exist to prevent.

Usage: python tools/scale_probe.py  (~2-3 min; run nothing else)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

#: representative of each cost family: blocked theta-join, range join,
#: window dedup, QA composite, shuffle agg, map-side text pass, LSH
#: dedup, per-doc gram join
PROBES = [
    "j6_fuzzy_name_pairs",
    "j8_range_join",
    "w1_dedup_first",
    "qa_roster_filters",
    "a6_pivot_counts",
    "text_token_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_prefix",
    "dedup_cluster_canonical",
    "decontam_ngram_overlap",
    "pipe_wdrs_qa",
    "pipe_corpus_curation",
    "pipe_roster_compile_chunks",
    "dedup_semantic_cells",
    "pipe_incremental_corpus",
    "sample_stratified_exact",
    "evt_retention_cohorts",
    "evt_rollup_multigrain",
    # ANN family (round 5): embeddings is 500/500/2000 rows across the
    # three SFs, so the growth column sees a 4x (not 10x) input step —
    # but a pair-quadratic regression would still read as ~16x.
    "ann_ivf_trained_topk",
    "ann_pq_topk",
    "ann_pq_trained_topk",
    "ann_ivfpq_topk",
    # round-5 additions: Arrow decode stages (audio synth+decode,
    # mixed-container probe), vocabulary-collapsed BPE counting, and
    # the sharded-manifest window pass
    "mm_decode_audio",
    "mm_audio_features",
    "mm_probe_media",
    "bpe_merge_topk",
    "train_shard_manifest",
    # round-5 session 3: lexical retrieval, the closed BPE train loop,
    # and the interpolated bigram LM — all map-side-dominated shapes
    # whose growth should track the corpus linearly
    "bm25_topk",
    "bpe_train_step",
    "bigram_doc_score",
    # residual IVF-PQ: the full FAISS encoding; same skeleton as
    # ann_ivfpq_topk plus the per-(query,cell) residual LUT
    "ann_ivfpq_residual_topk",
    # image near-dup: BMP synth+decode Arrow chain feeding a hash
    # window (near_dup) and the distinct-hash band join + membership
    # expansion (hamming_pairs) — growth tracks decode + output pairs
    "mm_image_dhash_near_dup",
    "mm_image_dhash_hamming_pairs",
    # round-5 session 5: mergeable sketches (fixed-size agg state —
    # growth should be the pure scan slope) and the Z-order layout
    # planner (global-sort window by design; growth tracks the sort)
    "sketch_hll_distinct",
    "sketch_countmin_heavy",
    "evt_hll_daily_users",
    "layout_zorder_files",
    "sketch_histogram_quantiles",
    "bm25_index_probe",
    # iterative graph analytics: 3 unrolled rank-join rounds; growth
    # tracks the edge table (slim rank rows, decimal in-mass sums)
    "graph_pagerank_authority",
    # FS linkage rides the j6 blocked join at max_dist=3; growth
    # tracks the blocked candidate pairs
    "link_fellegi_sunter",
    # inverted-index sparse cosine: growth tracks the word-keyed pair
    # join under the df + absolute-posting caps (the prunes are what
    # keep it subquadratic)
    "sim_tfidf_cosine_topk",
    # round-6 additions: the composed-index incremental proof (frozen
    # codebooks; growth tracks batch encode + the salted cell join)
    # and cross-doc exact-substring runs (growth tracks the capped
    # gram-hash self-join + island windows)
    "ann_ivfpq_index_probe",
    "dedup_substring_global",
    # video frame decode: Arrow synth+decode chain emitting sampled
    # frame planes; growth tracks frames x pixels
    "mm_video_frame_decode",
    # tokenizer encode: rides the vocabulary table (growth tracks
    # distinct words, not the corpus), nested-fold application
    "bpe_encode_corpus",
    # the serving-shape search: frozen index + 1% query batch; growth
    # tracks index build (the batch is proportionally tiny)
    "ann_ivfpq_batch_search",
    # per-doc interval-union accounting over the capped run join
    "dedup_substring_acct",
    # IVF-SQ8: the certified cell meet with integer-dot scoring;
    # growth should track ann_ivfpq_topk's class
    "ann_ivfsq_topk",
    # round-7 additions: the SQ8 matrix completion (incremental proof
    # + frozen-index 1% batch serving), the substring REWRITE (run
    # join + per-doc index union + map-side rebuild), the audio
    # fingerprint band join (decode chain + vocabulary-bounded
    # distinct-fp pairing), and the sampled/adaptive-geometry IVF row
    # (training linear in the 10% sample; n_cells ~ n keeps per-cell
    # lists bounded — the production answer to ann_ivf_trained_topk's
    # fixed-8-cell growth)
    "ann_ivfsq_index_probe",
    "ann_ivfsq_batch_search",
    "dedup_substring_rewrite",
    "mm_audio_fingerprint_pairs",
    "ann_ivf_sampled_topk",
    # IVF-BQ: the lightest of the four quantized indexes (1 bit/dim);
    # growth should track the ivfsq class
    "ann_ivfbq_topk",
    # the cross-method dedup dashboard: the sum of its four certified
    # branches plus 1-row finishers
    "pipe_dedup_report",
    # round-7 session 2: DSIR selection (64-row bucket LM broadcast
    # onto the exploded corpus + TakeOrdered — growth tracks the token
    # scan), binned KS drift (scalar-extremes broadcast + 32-key agg —
    # pure scan slope), and the diagonal-Mahalanobis outlier screen
    # (posexplode + d-key stats + TakeOrdered — tracks n x d)
    "dsir_select_topk",
    "qa_ks_drift",
    "emb_mahalanobis_outliers",
    # PCA: one map-side outer-product pass + d^2-key agg; the 8
    # iteration sweeps are corpus-independent d^2-row joins, so
    # growth should track the single corpus scan
    "emb_pca_top_component",
    # char entropy: map-side HOF histogram, alphabet-bounded shuffle
    "text_char_entropy",
    # all-but-the-top: PCA machinery + ONE map-side corpus rewrite
    # (broadcast packed mu/v arrays) — growth tracks the corpus scan
    "emb_remove_top_component",
    # minhash calibration: rides the certified slim-pair LSH shape;
    # growth tracks candidate pairs (capped buckets)
    "dedup_minhash_calibration",
    # bipartite fuzzy decontamination: bench side broadcast, growth
    # tracks the corpus banding scan + bench bucket occupancy
    "decontam_minhash",
    # markov matrix: one per-user lead window then vocabulary-bounded
    # finishing — growth tracks the fact scan
    "evt_markov_transitions",
    # calibration: in-plan GD training dominates (8 corpus feature
    # passes in one lazy plan) — growth tracks the corpus x iters
    "quality_logreg_calibration",
    # round 8: the IVF-PQ refine/re-rank serving shape (stage 1 is
    # the certified cell meet; stage 2 is candidate-bounded float
    # re-rank — growth tracks the stage-1 search), top-2 PCA by
    # deflation (one corpus pass + two d^2-row sweep chains), the
    # sliding-window PSI monitor and the binned CvM screen (both
    # bounded-grid finishing over one fact-scan agg), and the
    # cross-method decontamination report (sum of its two certified
    # branches + slim id joins)
    "ann_ivfpq_rerank_topk",
    "emb_pca_top2_components",
    "qa_psi_sliding",
    "qa_cvm_drift",
    "pipe_decontam_report",
    # round 9: the semantic decontamination rung (broadcast-codebook
    # assignment + tiny-bench cell meet — growth tracks the corpus
    # assignment scan), the 1-row isotropy dashboard (exactly the
    # top-2 PCA state), and the stateless streaming IVF assignment
    # (growth tracks the arriving-batch scan + drain overhead)
    "decontam_semantic",
    "emb_isotropy_report",
    "st_ivf_assign",
    # round 10: probe-complete the bench set (VERDICT r9 item 3) —
    # the seven BENCH rows that previously had no SCALING cell, so
    # the bench≡probe cross-check covers every driver-recorded row
    "w4_argmin_per_group",
    "a4_share_of_total",
    "f13_date_window_flag",
    "f12_multiformat_dates",
    "t4_snapshot_diff",
    "dedup_exact_content_hash",
    "decontam_bloom_prefilter",
    # and the r10 streaming twin (TTL expiry on the arrival path)
    "st_keepna_ttl",
]

#: executions per (query, sf) cell — min-of-N. Three runs settle the
#: bench-noise adjudication loop the r6 verdict flagged: the driver's
#: single-shot bench can catch one GC pause; with the probe at N=3 the
#: repo's own record resolves any >1.3x bench move (five r6 'regressions'
#: were all probe-contradicted host noise).
REPEATS = 3


def main() -> None:
    from sequencing_integration_pipeline1_0_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("scale_probe")
    qs = entrymod.queries()

    # warm footers + JVM per SF dir so probes measure operators
    for sf in SFS:
        for t in ("orders", "lineitem", "customer", "documents",
                  "embeddings"):
            spark.read.parquet(os.path.join(sf, f"{t}.parquet")).count()

    # min of REPEATS executions per cell: the iterative ANN queries run
    # hundreds of small jobs, and a single GC pause in the long-lived
    # probe JVM can triple one measurement (observed: three probe runs,
    # each with a DIFFERENT ~3x ANN blip). min is the standard
    # noise-robust wall statistic; the growth column compares mins.
    results: dict[str, list[float]] = {}
    for name in PROBES:
        results[name] = []
        for sf in SFS:
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                qs[name](spark, sf).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[name].append(round(best, 3))

    lines = [
        "# SCALING — measured wall time vs scale factor",
        "",
        "Generated by `python tools/scale_probe.py` (local[32], min of",
        f"{REPEATS} executions per cell — a single GC pause in the",
        "long-lived probe JVM can triple one measurement of the",
        "iterative ANN queries; min-of-N is the noise-robust wall",
        "statistic the bench-noise adjudications use).",
        "Inputs grow 10× per column;",
        "`growth` is",
        "t(sf0.1)/t(sf0.01) — the sf0.001 column is overhead-dominated",
        "(JVM + planning floor ~0.3-0.5 s) and not meaningful for slope.",
        "A growth factor ≤ ~10× on 10× data means the plan scales at",
        "worst linearly (blocked joins hold; no pair blowup); well under",
        "10× means the op is still overhead/shuffle-floor bound at this",
        "size.",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | growth 0.01→0.1 |",
        "|---|---|---|---|---|",
    ]
    for name, ts in results.items():
        growth = ts[2] / ts[1] if ts[1] > 0 else float("nan")
        lines.append(f"| {name} | {ts[0]} | {ts[1]} | {ts[2]} | {growth:.1f}× |")
    lines += [
        "",
        "History — regressions this probe caught (then fixed):",
        "",
        "- `dedup_minhash_lsh` at **190×** growth (1.35 s → 257 s): the LSH",
        "  pair join shuffled both full shingle arrays through the candidate",
        "  dedup, multiplying a ~21M-pair shuffle by the document size.",
        "  Fixed by pairing slim (id_a, id_b) only, re-attaching shingles",
        "  per-id for the verify, and pinning the verify stage's",
        "  parallelism (AQE coalesces the byte-small pair exchange to 1-2",
        "  partitions, serializing the compute-heavy verify). Residual",
        "  >10× growth on the dedup queries is CANDIDATE volume, not plan",
        "  shape: this template-heavy corpus yields ~10M true candidate",
        "  pairs from 5k docs (quadratic in near-dup cluster size — LSH's",
        "  honest answer). The levers at real scale: exact-dedup first",
        "  (`dedup_exact_content_hash`) and `max_bucket` to cap degenerate",
        "  mega-buckets (documented recall note).",
        "- `dedup_ngram_jaccard` at **27×** (6.9 s → 185 s), and",
        "  `dedup_cluster_canonical` (38×) which consumes its pairs: the",
        "  within-block all-pairs join keyed on the block alone put one",
        "  2.2k-doc language block's 2.4M comparisons on a single task (AQE",
        "  cannot split one sort-merge key), and the 1-row-group scan left",
        "  the broadcast-probe side at 1 partition. Fixed with a replicated",
        "  bucket join — side B salted by hash(id) % R, side A exploded over",
        "  all R buckets, (block, bucket) as the equi-key — plus a",
        "  round-robin probe-side spread; identical output set, now ~2.5×",
        "  on 10× data.",
        "- Round 3: the scale levers became the DEFAULTS.",
        "  `minhash_lsh_candidates` now collapses byte-identical shingle",
        "  sets to a representative before banding (lossless — rep pairs",
        "  expand back bipartite + within-group) and drops band buckets",
        "  over 256 DISTINCT texts before pairing (measured: one template",
        "  cluster put 3.2k docs in one bucket = 5.1M of the 21M sf0.1",
        "  candidate pairs; 99.4% of all candidates came from buckets",
        "  >256). The DuckDB oracle models both, so the driver gate",
        "  certifies the production configuration. Growth fell 18× → ~1.6×.",
        "  `dedup_cluster_canonical` now clusters the verified LSH pairs",
        "  instead of the brute-force trigram join's — connected components",
        "  must ride the subquadratic candidate generator at 100 TB.",
        "  `dedup_ngram_jaccard` keeps exact all-pairs semantics ON",
        "  PURPOSE (its job is measuring the LSH path's recall; a silent",
        "  cap would corrupt the measurement) — its ~10× growth is the",
        "  honest cost of exactness and it is NOT on any scale path.",
        "- Round 4: `dedup_semantic_cells`'s cell-count lever became the",
        "  DEFAULT — n_cells = max(8, n // 128) from one metadata-scale",
        "  count() (previously pinned at 8, where embeddings 4× meant",
        "  within-cell pairs 16×). The oracle models the same formula, so",
        "  the driver certifies the adaptive geometry; measured growth is",
        "  now ~3× on the sf0.01→sf0.1 embedding step (SemDeDup's",
        "  n_cells ∝ n rule holds per-cell pairing constant as n grows).",
        "- Round 4: `decontam_bloom_prefilter` at **14.6 s** flat cost in",
        "  the new bench family — TWO independent causes. (a) HOF lambdas",
        "  run interpreted, outside codegen subexpression elimination, so",
        "  ngram_array's n element_at references re-ran the words() regex",
        "  split n times PER GRAM (~275 re-splits per doc); fixed by",
        "  lambda-binding the split once per row (dedupe_scale.bind_once,",
        "  applied to ngram_array / word_shingles / top_word_frac /",
        "  simhash16). (b) the Bloom sketch was a map<long,long>, and",
        "  Spark's map element_at is a LINEAR scan of entries — 3 probes x",
        "  16k entries per gram; fixed by a dense array<long> sketch with",
        "  O(1) indexing. 14.6 s → ~1.3 s at sf0.1.",
        "- Round 4: `pipe_corpus_curation` at 4.2× — lang_id's iterative",
        "  when(h > best.h, ...).otherwise(best) chain EMBEDDED each",
        "  language's hit expression in both branches of every later step,",
        "  doubling the expression tree per language (2^k copies, each",
        "  re-running the words() split; 2.8 s alone at sf0.1). Rewritten",
        "  as ONE lambda-bound array_max over (hits, -rank, lang) structs —",
        "  identical semantics incl. the alphabetical tie-break, verified",
        "  value-identical by the oracle. 3.2 s → ~1.0 s at sf0.1.",
        "- Round 5: the ANN family joined the probe (an ANN plan",
        "  regression previously would have reached the next round",
        "  unmeasured) — and the probe's FIRST run caught one: the",
        "  composed `ann_ivfpq_topk` measured 26 s at sf0.1, SLOWER than",
        "  the all-pairs `ann_pq_topk` (15.5 s) it exists to beat.",
        "  Decomposition: the cell restriction itself worked (1.998 M",
        "  candidate pairs vs 3.998 M all-pairs — exactly the",
        "  nprobe/n_cells = 4/8 cut; coarse training only 5.8 s) but the",
        "  v1 plan exploded candidates x m subspaces (32 M rows) through",
        "  a sort-merge join with a LUT just past the broadcast",
        "  threshold. Fix: pair-level plan — neighbors carry their m",
        "  codes as one ordered array, queries carry their m x k LUT as",
        "  one array-of-arrays, ADC is a map-side zip_with + O(1)",
        "  element_at + exact-decimal fold. Bit-identical output",
        "  (verified), frozen-codebook search 19.5 s -> 6.2 s. The",
        "  all-pairs `ann_pq_topk`/`ann_pq_trained_topk` rows keep their",
        "  documented explode-join shape on purpose (recall baseline;",
        "  pair-level there would need an explicit Cartesian).",
        "  Geometry note: at the certified 8-cell/nprobe-4 oracle",
        "  geometry the candidate cut is only 2x by construction; at",
        "  scale n_cells ~ sqrt(n) makes the cut ~n_cells/nprobe-fold.",
        "- Round 5 (session 2): the pair-level IVF-PQ plan was still",
        "  attaching the full m x k = 256-entry decimal LUT to every one",
        "  of the ~2M candidate rows (4 GB materialized per stage), and",
        "  AQE coalesced the byte-small join inputs so the whole ADC",
        "  fold ran in ONE task (measured 8-12 s serial). Fix: the true",
        "  FAISS inverted-list layout — codes groupBy(cell) into one",
        "  entries-list row per cell, probes round-robin spread",
        "  (user-specified partitioning AQE cannot coalesce), inv +",
        "  per-query LUTs broadcast (cells and the query batch are the",
        "  small side at any corpus size), ADC scored per (query,",
        "  probed-cell) row with a nested HOF over the whole list, slim",
        "  (qid, neighbor, dist) rows exploded after. LUT materializes",
        "  n_q x nprobe times instead of once per pair — a ~250x cut in",
        "  memory traffic. Same values; 11.3 s -> ~7-9 s end-to-end at",
        "  sf0.1 (rest is the iterative Lloyd chains' fixed small-job",
        "  latency, amortized at scale by training on a sample once).",
        '- Round 5 (session 3): the plan audit caught quality_logreg_train',
        '  at BroadcastNestedLoop x510 / 255 shuffles — the unrolled GD',
        "  recurrence referenced each iteration's weight frame TWICE",
        '  (gradient crossJoin + update select), doubling the plan per',
        '  iteration: 2^k subtree blowup, the lang_id lesson in join',
        '  form. Fix: thread the weights THROUGH the gradient aggregate',
        '  (max of a 1-row constant column = the value) so each',
        '  iteration references its predecessor exactly once — BNL x510',
        '  -> x8, ~15 s -> ~5 s at sf0.001, values bit-identical',
        "  (selfcheck re-green). ann_ivfpq_residual_topk's 3x growth is",
        '  subtree duplication of the shared coarse-Lloyd chain across',
        '  its three consumers — linear, not exponential; the honest',
        '  production lever (persist the trained codebooks; the catalog',
        '  contract forbids it) is documented on the operator.',
        '- Round 5 (session 4): ann_ivfpq_residual_topk inlined the',
        '  shared coarse-Lloyd chain THREE times (99-shuffle plan for a',
        '  ~10-shuffle chain) by rejoining base + broadcast codebook on',
        '  both the index and query sides. Fix: carry v/cv THROUGH the',
        '  assignment ranking window and slice subvectors inline, so the',
        '  chain has one reference — 48 shuffles, NLJ x32 -> x16, same',
        '  values. And mm_image_dhash_hamming_pairs banded FULL',
        '  membership: every member pair in a dup class paid the 64-char',
        '  string compare plus a member-quadratic distinct (22.6 s at',
        '  sf0.1). Fix: exact-first collapse — band join + hamming over',
        '  DISTINCT hashes only (54 at sf0.1, vocabulary-bounded),',
        '  self-pairs riding along as the hamming-0 classes, membership',
        '  expanded last through two slim broadcast equi-joins: 5.0 s,',
        '  and the member-quadratic regime is now a pure JVM hash-join',
        '  row emit.',
        "- Round 6: the r5 inverted-list plan's broadcast hints were the",
        "  round's flagged 100x-killer — in the registered SELF-search",
        "  form `inv` (every vector's packed codes) and `lut_q` (one",
        "  m x k LUT per query) are both O(corpus), so F.broadcast on",
        "  them builds the whole encoded corpus on the driver. Fix: LUT",
        "  joins on its qid equi-key FIRST (each probe row gains a",
        "  constant-size LUT before meeting the index), then a salted",
        "  SHUFFLE_HASH cell equi-join meets the inverted list, with",
        "  the probe-side exchange a user-numbered repartition on the",
        "  join keys (first cut let AQE coalesce the byte-small",
        "  pre-scoring rows and serialized the ADC fold: 27.5 s;",
        "  keyed user repartition restored 7.2 s — vs 5.5 s for the",
        "  unsafe broadcast, the price of nothing corpus-sized ever",
        "  crossing the driver). Same values (selfcheck re-green);",
        "  broadcast_query_luts=True keeps the hinted shape for genuinely",
        "  bounded query batches. The residual variant then got the",
        "  same packing its docstring promised (the exploded",
        "  (cell, subspace, code) join shuffled pairs x m rows — the",
        "  catalog's slowest query at 31.9 s sf0.1): per-(query,",
        "  probed-cell) LUTs pack to one array-of-arrays row, codes",
        "  pack per cell, and the meet is the same salted shuffle-hash",
        "  join — 31.9 s -> ~13 s warm at sf0.1, growth 4.4x -> ~1.3x.",
        "- Round 6: sim_tfidf_cosine_topk gained the ABSOLUTE posting",
        "  cap (256, the LSH max_bucket precedent, mirrored in the",
        "  oracle): the 10%-df prune alone lets a just-under-maxdf term",
        "  fan out (0.1n)^2 pairs — quadratic in corpus size. Terms",
        "  above the cap drop from the representation (norms recomputed,",
        "  cosine stays a true cosine of the pruned vectors); they are",
        "  the near-stopwords idf already discounts, and the cap bounds",
        "  per-term pair work at 256^2 regardless of n. Non-binding at",
        "  sf0.01 (maxdf 10% = 50 < 256), binding from ~2.5k docs up.",
        "  And mm_image_dhash_hamming_pairs' band groups no longer",
        "  collect_list distinct hashes into one row (fixture-bounded,",
        "  but real dHashes are ~unique per image -> one hot band OOMs",
        "  a task): the in-group pairing is now a (band_id, band)",
        "  equi-self-join — same pair set, streamed through a hash join",
        "  with no per-row state growing with the corpus.",
        "- Round 7: ann_ivf_sampled_topk answers the one remaining",
        "  'watch' row. ann_ivf_trained_topk (kept as the fixed-geometry",
        "  recall yardstick) re-derives in-plan Lloyd over the FULL",
        "  corpus per consumer and pins n_cells=8, so per-cell candidate",
        "  lists grow linearly with n — measured 16.4 s / 5.6x at sf0.1.",
        "  The sampled variant trains on a deterministic 10% sample with",
        "  adaptive n_cells = max(8, n // 64) (the semantic-dedup lever,",
        "  oracle-modeled exactly): 6.4 s / 2.2x on the same search —",
        "  2.6x faster and strongly sublinear, and the gap widens with n",
        "  since training is linear in the sample and per-cell work is",
        "  ~constant. Probe cells also went min-of-3 (REPEATS) so the",
        "  repo's own record settles driver-bench noise adjudications",
        "  (five r6 >1.3x bench moves were all probe-contradicted).",
        "- Round 8: lineage truncation became the trainers' DEFAULT.",
        "  train_ivf_codebook / pq_train_codebooks localCheckpoint per",
        "  Lloyd sweep and on return — the lazy recurrence referenced",
        "  each iteration's table twice (2^iters subtree blowup, the",
        "  lang_id lesson) and every CONSUMER reference re-ran the whole",
        "  corpus-scanning train (residual IVF-PQ inlined it 3x:",
        "  13.7 s -> ~10.5 s at sf0.1). PCA's covariance build fused",
        "  into ONE corpus pass (upper-triangle outer products — decimal",
        "  multiply commutes, so G(j,i) mirrors exactly — with the",
        "  per-dim linear terms riding the same flatten as j = -1 rows):",
        "  emb_pca_top_component 10.7 -> 5.9 s, emb_remove_top_component",
        "  11.4 -> 6.2 s. The IVF-PQ encode/LUT stages went MAP-SIDE",
        "  (m*k codebook packed into one broadcast row; each row",
        "  computes its codes / m x k LUT in one HOF pass), deleting",
        "  the explode(m) -> join -> two collect_list shuffles of",
        "  candidates x m rows. And decontam_minhash gained the",
        "  exact-first collapse BIPARTITE (both sides collapse",
        "  byte-identical shingle sets before banding; lossless, the",
        "  verify runs once per distinct pair): growth 7.0x -> ~3.5x on",
        "  this template-heavy corpus. All value-identical (full oracle",
        "  replica re-green).",
        "- Round 9: the IVF-PQ ADC meet UNROLLED its per-candidate fold",
        "  (aggregate(zip_with) -> a plain m-term sum over scale-6 LONG",
        "  LUT entries; exact arithmetic, values bit-identical):",
        "  ann_ivfpq_topk 7.8 -> 5.9 s, residual 9.2 -> 7.4 s, rerank",
        "  -> 6.8 s at sf0.1. (The tempting alternative — explode the",
        "  entries first and score in the codegen'd projection —",
        "  measured 35-40% SLOWER: the generator copies the m x k LUT",
        "  into every candidate row.) The power sweeps checkpoint their",
        "  d-row iterate every 3 sweeps AND on return (consumers",
        "  re-reference it ~5x): emb_pca_top2_components compiled",
        "  138 exchanges / 88 joins -> 16 / 12 and runs 10.0 -> 6.2 s.",
        "  And decontam_minhash gained the LOSSLESS length-ratio prune",
        "  (J >= t forces min/max set sizes >= t, checked inside the",
        "  broadcast band join). Its growth column needs adjudication,",
        "  not more pruning: at 10x input the TRUE result set grows",
        "  ~95x (1,032 -> 98,450 bipartite >= 0.7 pairs on this",
        "  template-heavy corpus — both sides' near-dup clusters grow,",
        "  so true cross pairs grow ~quadratically), which floors the",
        "  runtime ratio; 4.7x wall growth against 95x output growth",
        "  is strongly SUBLINEAR per result row, and the certified",
        "  exact-first collapse already makes the verify once-per-",
        "  distinct-pair. At real scale the output itself is the",
        "  product to bound (report per-bench-doc hit counts, not the",
        "  full pair expansion) — the pipe_decontam_report row does",
        "  exactly that.",
        "- Round 10: every remaining >4x growth row carries a MEASURED",
        "  denominator (the decontam_minhash discipline — wall growth",
        "  means nothing without the work the row is paid to do).",
        "  `mm_video_frame_decode`: output frames 1,497 -> 14,997",
        "  (10.0x on 10x docs; frames/doc is fixed by the stride), so",
        "  ~5x wall growth is ~0.5x per output frame — the Arrow",
        "  decode amortizes its per-batch setup as batches fill.",
        "  `mm_image_dhash_near_dup`: output rows 500 -> 5,000 (10x,",
        "  one per doc; dup rows 446 -> 4,946), wall ~4x — sublinear",
        "  per decoded image, and the hash-partitioned dedup window",
        "  never sees a cross-doc pair blowup. ",
        "  `sketch_histogram_quantiles`: output is ONE fixed-size row",
        "  by design, so the denominator is the input scan —",
        "  lineitem 60,000 -> 600,000 (10x) against ~5x wall: the",
        "  two linear passes are still partly floor-bound at sf0.1.",
        "  No row's work outgrows its output; nothing to fix.",
        "",
    ]
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "ivf_sweep_results.json")
    if os.path.exists(sweep_path):
        import json
        sw = json.load(open(sweep_path))
        lines += [
            "## IVF recall/latency vs nprobe",
            "",
            f"Generated by `python tools/ivf_recall_sweep.py` "
            f"({sw['n_vecs']} vectors at sf0.01, n_cells={sw['n_cells']}, "
            f"k-means-trained codebook, recall@5 vs brute force).",
            "",
            "| nprobe | recall@5 | wall (s) |",
            "|---|---|---|",
        ]
        for r in sw["sweep"]:
            lines.append(f"| {r['nprobe']} | {r['recall_at_5']} "
                         f"| {r['seconds']} |")
        lines += [
            "",
            "Read the knee, not the endpoints: nprobe=8 probes every cell",
            "(recall limited only by single-assignment ties), nprobe=1 is",
            "the floor. At 100 TB the same curve shifts with n_cells ~ √n",
            "(more, smaller cells -> cheaper probes, steeper knee); the",
            "lever trades one extra cell scan per query for the recall",
            "gap, and the right setting is the knee for the corpus — this",
            "table is the method, published so the choice is auditable.",
            "",
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    for name, ts in results.items():
        print(name, ts)


if __name__ == "__main__":
    main()
