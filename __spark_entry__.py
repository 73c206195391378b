"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multiway-join query on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (see
acled_spark/queries/*; names map to the §2 inventory ids).
``oracle_sql()`` — matching DuckDB SQL for the hash-parity gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from acled_spark.registry import oracle_map, spark_queries

# Driver re-verification rotation: the driver checks ~50 queries per
# round, so each round emits the LEAST-recently-verified queries first
# and every query's driver row stays at most ~one round stale (VERDICT
# r2 #2).  Sets below record which round's CORRECTNESS_r0N.json last
# wrote each query's row; emission order is never-verified, then oldest
# round to newest.  Registry names/signatures are unchanged — only the
# emission order here rotates.
#
# Round-9 rotation state (folded from CORRECTNESS_r08.json): round 8's
# 50-row check re-verified the whole r05 tier (retired), both round-8
# additions, and the full recert block.  Freshness is now r8×50 /
# r7×40 / r6×31 — the 31 r06-fresh rows lead this round (VERDICT r8
# #3), then oldest-r07.  After CORRECTNESS_r09 lands, fold its names
# into a _R9 tier and retire the empties — no row should then be older
# than r07.
#
# Queries whose freshest driver rows were written by the round-6 check
# (CORRECTNESS_r06.json) — the stale block, emitted first.
# a19_approx_distinct's r06 row is the by-design rows-only check
# (no_oracle).
_R6_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "a17_rollup", "a18_cube", "a19_approx_distinct",
        "a20_ranking_suite", "a21_unpivot", "dedup_canonical_pick",
        "dedup_cluster_census", "dedup_exact", "doc_filter_funnel",
        "j2_static_map_lookup", "j3_anti_join", "j4_semi_join",
        "j5_multiway_revenue", "j6_snowflake_dims", "p2_filter_dsl",
        "p3_date_range", "p4_null_threshold", "p5_eq_filter",
        "p6_threshold_topk", "p7_hash_split", "p8_stratified_sample",
        "text_fingerprints", "text_langid_confusion",
        "text_quality_classifier", "text_quality_scores",
        "text_tfidf_terms", "text_token_stats", "text_unigram_logprob",
        "text_vocab_growth", "text_winnow_pairs", "text_zipf_slope",
    }
)

# Queries whose freshest driver rows were written by the round-7 check
# (CORRECTNESS_r07.json).
_R7_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "a1_value_counts", "a2_conditional_counts", "a3_null_empty_audit",
        "a4_daily_rollup", "a5_topk_groups", "a6_dim_rollup",
        "a10_descriptive_stats", "a11_distinct_counts",
        "a12_duplicate_keys", "a14_group_deviation", "a15_risk_buckets",
        "a16_percent_of_total", "dedup_components_exact",
        "dedup_containment", "dedup_embedding_cosine",
        "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
        "drift_psi", "f16_regexp_extract", "f1_try_cast_json",
        "f6_string_cleanup", "j7_asof_join", "mix_weights",
        "ml_label_encode", "ml_target_encode_cv", "mm_feature_extract",
        "s8_upsert_merge", "sess_user_sessions", "sim_ann_lsh",
        "sim_ann_multiprobe", "sim_label_centroids", "sim_norm_outliers",
        "sim_quantize_error", "sim_topk_bruteforce", "text_dup_spans",
        "text_pii_scrub", "text_repetition", "train_shuffle",
        "w6_cumulative_distinct",
    }
)

# Queries verified by the round-8 check (CORRECTNESS_r08.json) — the
# FRESH block, emitted last.  sim_pca_top_component / a26 / sim_ann_ivf
# rows are the by-design rows-only checks (no_oracle) whose invariants
# ride the output columns.
_R8_DRIVER_VERIFIED: frozenset[str] = frozenset(
    {
        "a7_multi_measure_rollup", "a8_weekly_rollup", "a9_monthly_rollup",
        "a13_histogram", "a22_time_grouping_sets", "a23_daily_anomaly",
        "a24_time_to_convert", "a25_hour_profile", "a26_approx_quantiles",
        "cdc_snapshot_diff", "chk_validation_summary", "cohort_retention",
        "dedup_incremental_check", "f2_time_extract", "f4_date_arithmetic",
        "f9_math_suite", "f9b_vector_norm", "f13_correlation",
        "f14_levenshtein", "f15_bool_aggs", "funnel_user_journey",
        "j1_target_stat_lookup", "j8_interval_join", "j9_band_join",
        "ml_distance_from_center", "ml_onehot_pivot", "mm_decode_real",
        "mm_payload_metadata", "p9_weighted_sample", "pack_materialize",
        "pack_sequences", "prep_corpus_stats", "q1_pricing_summary",
        "release_delta_audit", "sess_transitions", "sim_ann_ivf",
        "sim_dim_stats", "sim_pca_top_component", "so1_set_ops",
        "sql1_region_revenue", "t3_tumbling_window", "text_bm25_topk",
        "text_bpe_token_stats", "text_chunking", "text_contamination",
        "w1_moving_avg_7d", "w2_global_share", "w3_rank_rows",
        "w4_lag_delta", "w5_range_frame",
    }
)
_ALL_KNOWN = _R6_DRIVER_VERIFIED | _R7_DRIVER_VERIFIED | _R8_DRIVER_VERIFIED

# Queries whose round-9 source/oracle edits POSTDATE their freshest
# driver row — these lead their blocks so the ~50-query cap can't drop
# them.  (Populated as round 9 edits land.)
_RECERT_PRIORITY: frozenset[str] = frozenset(
    {
        # r9 (ADVICE r8): the canonical-in-batch replay exemption in
        # incremental_classify is narrowed to store_min ==
        # batch_canonical in BOTH engines (a no-op on the oracle's
        # disjoint halves but the contract changed on both sides)
        "dedup_incremental_check",
        # r9: pair generation refactored into embedding_cosine_pairs
        # (max_block lever; registered query unchanged at cap=None)
        "dedup_embedding_cosine",
        # r9 (ADVICE r8): a26's sketch frame localCheckpoint is now
        # lazy (plan/values unchanged; build no longer runs a job)
        "a26_approx_quantiles",
        # r9 (ADVICE r8): bm25's dlen checkpoint likewise lazy
        "text_bm25_topk",
    }
)

# Cheap-first hint within the stale block: scalar/filter one-scan
# queries ahead of heavier dedup/text-class plans, so a wall-clock-capped
# checker still lands the most rows.
_FAST_FAMILIES = ("f", "w", "sql", "q1", "a", "p", "j", "so", "ml", "sess")


def _family_rank(name: str) -> int:
    for i, prefix in enumerate(_FAST_FAMILIES):
        if name.startswith(prefix):
            return i
    return len(_FAST_FAMILIES)


def _ordered(names: list[str]) -> list[str]:
    # Never-verified queries lead, then the recert-priority set (rows
    # that postdate their own source/oracle edits), then oldest-round
    # blocks first.
    never = [n for n in names if n not in _ALL_KNOWN]
    priority = [n for n in names if n in _RECERT_PRIORITY and n not in never]
    taken = set(never) | set(priority)
    blocks = [never, priority] + [
        [n for n in names if n in tier and n not in taken]
        for tier in (_R6_DRIVER_VERIFIED, _R7_DRIVER_VERIFIED, _R8_DRIVER_VERIFIED)
    ]
    for block in blocks:
        block.sort(key=lambda n: (_family_rank(n), names.index(n)))
    return [n for block in blocks for n in block]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from acled_spark.queries.joins import j5_multiway_revenue

    return j5_multiway_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = spark_queries()
    return {name: qs[name] for name in _ordered(list(qs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each oracle-expressible query."""
    om = oracle_map()
    return {name: om[name] for name in _ordered(list(om))}
