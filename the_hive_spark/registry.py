"""Query registry: every implemented operator registers a Spark
callable and (when SQL-expressible) a DuckDB oracle here.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin re-exports of
this registry, so the driver's correctness gate and our own test
harness (tests/test_oracle_parity.py) see the identical surface.

Registration contract (mirrors the driver's comparator):
- the Spark callable takes (spark, sf_dir) and returns a DataFrame;
- result column names must match the oracle's exactly (the comparator
  sorts columns by name before hashing);
- float aggregation must be decimal-cast on BOTH sides so the hash is
  reproducible across engines (IEEE sums are order-dependent; decimal
  sums are exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Round-5 gate budget (the driver hash-checks the FIRST 50 entries of
# QUERIES). Round 4 taught an expensive lesson: the driver returns
# ``err: "no_oracle"`` for rows-only queries — it does NOT do a
# rows+schema check — so the 11 rows-only slots in _GATE_R4 verified
# nothing (CORRECTNESS_r04.json), and r4's "full closure" was really
# closure of the ORACLED surface only (173 oracled queries green
# across r1-r4, 0 hash failures; the 16 rows-only queries are attested
# locally — see ROWS_ONLY.md). From round 5 on, every gate slot MUST
# be in ORACLES (enforced by tests/test_registry.py).
#
# Slots 1-23: the oracled _ADDED_R4 queries (registered after the r4
# gate froze, so no driver row exists by construction).
# Slots 24-39: rolling re-attestation, oldest rows first — these
# queries' only driver row is from ROUND 1 (rules, graph, media,
# dedup families, plus the oldest analytics), and three rounds of
# shared-helper edits have happened since.
# Slots 40-50: the round-5 additions (_ADDED_R5) — new work earns its
# driver row the same round it lands; the analytics re-attests they
# displaced are unchanged-since-their-r1-green-row and roll to r6.
# (Locally, tests/test_oracle_parity.py still sweeps ALL oracled
# queries every round regardless of this ordering.)
_GATE_R5 = [
    # --- slots 1-23: oracled _ADDED_R4, never driver-checked ---
    "doc_temperature_mix",
    "q_constraint_audit",
    "doc_dup_spans",
    "cust_linkage_fs_scores",
    "events_peak_concurrency",
    "q_kanonymity_audit",
    "doc_dup_span_coverage",
    "events_rollup_multigrain",
    "events_dau_wau_mau",
    "doc_source_overlap",
    "graph_bfs_3hop",
    "doc_term_cooccurrence_lift",
    "q_join_skew_profile",
    "emb_component_histogram",
    "events_attribution_ushape",
    "q_frequent_itemsets",
    "events_frequent_sequences",
    "q_price_quantity_correlation",
    "events_bot_regularity",
    "doc_rake_keyphrases",
    "events_slo_burn",
    "q_duplicate_payment_audit",
    "q_revenue_waterfall",
    # --- slots 24-50: re-attest the oldest r1-only driver rows ---
    # reference-parity families first (VERDICT r4 ask #4)
    "rule_cross_apply",
    "keyword_alerts",
    "keyword_autotags",
    "graph_nodes",
    "graph_neighborhood",
    "graph_degree_topk",
    "media_inventory",
    "media_frame_sample",
    "media_dedup_fingerprint",
    # dedup family
    "doc_dedup_exact",
    "doc_dedup_corpus",
    "doc_corpus_filtered",
    "doc_simhash",
    "doc_simhash_hamming_pairs",
    "doc_ngram_jaccard_pairs",
    # TPC-H analytics, oldest first (the remaining r1-only q_* roll
    # into round 6)
    "q1_pricing_summary",
    # --- round-5 additions (oracled, no driver row yet — new work
    # earns its row the round it lands; the eleven analytics
    # re-attests they displaced are unchanged-since-r1-green and roll
    # to r6) ---
    "doc_ngram_novelty",
    "doc_split_leakage",
    "doc_dedup_canonical",
    "doc_quality_prune_sweep",
    "graph_jaccard_neighbors",
    "events_value_winsorized",
    "q_trade_flow_matrix",
    "q_part_substitution_candidates",
    "events_funnel_latency",
    "graph_label_propagation3",
    "cust_er_clusters3",
]

# ROUND-6 GATE. Slots 1-7: the seven oracled round-5 additions that
# were registered after the r5 gate froze (the declared r6 front —
# VERDICT r5 "What's missing" #1). Slots 8-11: MANDATORY re-attests of
# the queries whose plans changed this round (min_label_propagation
# localCheckpoint fix, geometric price banding, single-pass BPE token
# stats — a green row earned under the old plan doesn't attest the new
# one). Slots 12-36: the 25 analytics whose only driver row is from
# round 1 (the oldest rows in the record). Slots 37-50: the oldest
# r2-only rows (hive_* parity + events_* timeline + doc_* text
# families, three rounds of shared-helper churn since their r2 green).
# New round-6 queries swap into the tail as they land (same policy as
# r5: new work earns its driver row the round it lands).
_GATE_R6 = [
    # --- slots 1-7: oracled _ADDED_R5, registered after the r5 gate ---
    "q_nation_yoy_growth",
    "q_order_fulfillment_latency",
    "q_weighted_median_price",
    "graph_clustering_coefficient",
    "events_survival_curve",
    "events_time_weighted_value",
    "q_equidepth_histogram",
    # --- slots 8-11: round-6 plan-change re-attests ---
    "graph_label_propagation3",
    "cust_er_clusters3",
    "q_part_substitution_candidates",
    "doc_bpe_token_stats",
    # --- slots 12-36: the 25 r1-only analytics (oldest driver rows) ---
    # (layout check: 7 + 4 + 25 + 10 + 4 = 50; tests pin the order)
    "q2_min_acctbal_supplier",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_priority_lines",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q22_idle_customers",
    "q_active_parts_semi",
    "q_brand_volume",
    "q_cube_returnflag_status",
    "q_mktsegment_yearly",
    "q_order_interarrival",
    "q_rollup_revenue",
    "q_running_monthly_revenue",
    "q_top_supplier_per_nation",
    # --- slots 37-46: oldest r2-only rows (shared-helper churn) ---
    "hive_search_topk",
    "hive_audit_recent",
    "hive_events_by_doc",
    "hive_stats",
    "events_timeline",
    "events_sessionization",
    "events_retention",
    "events_asof_last_order",
    "events_funnel",
    "doc_chunks",
    # --- slots 47-50: round-6 additions (new work earns its driver row
    # the round it lands; the four r2-only re-attests they displaced —
    # doc_chunk_stats, doc_token_stats, doc_langid, doc_quality_score
    # — head the r7 plan with the rest of the r2-only family) ---
    "q_order_backlog_daily",
    "q_part_skyline",
    "doc_minhash_calibration",
    "events_lateness_profile",
]

# ROUND-7 GATE. Slots 1-6: MANDATORY re-attests of the queries whose
# plans (and for the calibration, output) changed this round — the
# minhash calibration's scale-invariant doc subsample (dedup.py), the
# skew-safe distinct-name fuzzy blocking (entity_resolution.py, which
# also feeds the FS scores and the ER closure), and the two dedup
# consumers of the refactored pair-builder helpers. Slots 7-43: the
# 37 remaining r2-only rows (the oldest driver rows in the record —
# five rounds of shared-helper churn since their r2 green). Slots
# 44-50: the oldest r3-only rows; new round-7 queries swap into this
# tail as they land (same policy as r5/r6: new work earns its driver
# row the round it lands, displaced r3-only rows head the r8 plan).
_GATE_R7 = [
    # --- slots 1-6: round-7 plan/output-change re-attests ---
    "doc_minhash_calibration",
    "cust_fuzzy_match_pairs",
    "cust_linkage_fs_scores",
    "cust_er_clusters3",
    "doc_ngram_jaccard_pairs",
    "doc_dup_clusters",
    # --- slots 7-43: the 37 r2-only rows (oldest driver evidence) ---
    "doc_chunk_stats",
    "doc_token_stats",
    "doc_langid",
    "doc_quality_score",
    "doc_bm25_topk",
    "doc_fingerprint",
    "doc_lang_profile",
    "doc_pack_sequences",
    "doc_pii_redact",
    "doc_rebalance_sample",
    "doc_split_assignment",
    "doc_stratified_sample",
    "doc_token_weighted_sample",
    "doc_top_terms",
    "doc_training_manifest",
    "events_anomaly_daily",
    "events_attributed_conversions",
    "events_band_salted_join",
    "events_by_type",
    "events_daily_type_pivot",
    "events_dau_stickiness",
    "events_debounced",
    "events_error_bursts",
    "events_error_rate_daily",
    "events_funnel_windowed",
    "events_hourly_pattern",
    "events_interarrival_by_type",
    "events_last_touch",
    "events_path_3grams",
    "events_props_histogram",
    "events_top_purchasers",
    "events_tumbling_10min",
    "events_user_daily",
    "events_value_by_type_salted",
    "events_value_histogram",
    "events_value_percentiles",
    "events_within_hour_pairs",
    # --- slots 44-47: oldest r3-only rows; the three r3-only rows
    # displaced to the round-8 front by the round-7 additions are
    # doc_bpe_pair_counts, events_markov_transitions, and
    # doc_dup_gram_coverage (doc_lang_mismatch holds slot 47 here) ---
    "hive_clients_online",
    "doc_repetition_ratio",
    "doc_decontaminate",
    "doc_lang_mismatch",
    # --- slots 48-50: round-7 additions (new work earns its driver
    # row the round it lands) ---
    "cust_golden_record",
    "q_fd_violation_audit",
    "events_illegal_transitions",
]

# ROUND-8 GATE. Slot 1: MANDATORY re-attest of doc_bpe_token_stats —
# its plan was rewritten to run-collapsing character arithmetic
# (text_analysis.py) in commit 6bfd0ad, five minutes AFTER the r7 gate
# rotation froze, so the rewritten plan has no driver row (the r7
# VERDICT and ADVICE both flag this as the repo's own _PLAN_CHANGED
# policy violation; it leads the round). Slots 2-40: the 39 r3-only
# rows — the oldest driver evidence in the record (five rounds of
# shared-helper churn since their r3 green) — with the three rows the
# round-7 additions displaced from r7 slots 48-50 first, per the
# declared r8 rotation plan. Slots 41-50: the oldest r4-only rows, in
# their _GATE_R4 registration order; new round-8 queries swap into
# this tail as they land (same policy as r5-r7: new work earns its
# driver row the round it lands, displaced r4-only rows head the r9
# plan).
_GATE_R8 = [
    # --- slots 1-4: plan-change re-attests. Slot 1: doc_bpe_token_stats
    # (rewritten after the r7 gate froze — the declared r8 front).
    # Slots 2-4: the round-8 pair-enumeration scale guards
    # (dedup.py:_ngram_jaccard_pairs_build measures its quadratic term
    # before doing quadratic work) changed the executed plan of the
    # direct query, the calibration's sparse fallback, and the
    # modality-agreement consumer's cold artifact build ---
    "doc_bpe_token_stats",
    "doc_ngram_jaccard_pairs",
    "doc_minhash_calibration",
    "dup_modality_agreement",
    # --- slots 5-7: the three r3-only rows displaced from the r7 gate
    # tail by the round-7 additions (declared r8 front) ---
    "doc_bpe_pair_counts",
    "events_markov_transitions",
    "doc_dup_gram_coverage",
    # --- slots 8-43: the remaining 36 r3-only rows ---
    "doc_charset_profile",
    "doc_curation_funnel",
    "doc_drift_ks_by_source",
    "doc_dup_gram_hotspots",
    "doc_dup_rates_by_source",
    "doc_length_outliers_mad",
    "doc_lm_bigram_score",
    "doc_minhash_lsh_pairs",
    "doc_near_dedup_corpus",
    "doc_winnow_fingerprints",
    "emb_centroid_by_label",
    "emb_knn_batch_topk",
    "emb_knn_topk",
    "emb_near_dup_lsh",
    "emb_near_dup_pairs",
    "events_burst_fano",
    "events_cusum_changepoint",
    "events_daily_trend_slope",
    "events_heavy_hitters",
    "events_p95_exceedance",
    "events_pareto_concentration",
    "events_rfm_segments",
    "events_scd2_history",
    "events_snapshot_diff",
    "events_type_audience_overlap",
    "events_unconverted_clicks",
    "events_user_lifecycle",
    "events_weekday_seasonality",
    "graph_kcore3",
    "graph_pagerank3",
    "graph_triangle_count",
    "media_shard_manifest",
    "q_benford_price_audit",
    "q_copurchase_pairs",
    "q_customer_spend_gini",
    "q_lapsed_customers",
    # --- slots 44-47: oldest r4-only rows (in _GATE_R4 registration
    # order; the r4-only re-attests displaced by the round-8
    # plan-change slots and additions — emb_label_stats,
    # emb_label_affinity, emb_label_outliers, emb_norm_outliers,
    # doc_reservoir_sample, doc_curriculum_shards — head the r9
    # plan) ---
    "emb_dedup_exact",
    "emb_quantize_int8",
    "emb_hard_negatives",
    "emb_semantic_dup_rates",
    # --- slots 48-50: round-8 additions (new work earns its driver
    # row the round it lands) ---
    "doc_tokenizer_fertility",
    "doc_vocab_growth_heaps",
    "doc_dup_inter_source_matrix",
]

# ROUND-9 GATE. Slots 1-4: MANDATORY plan-change re-attests — the
# round-9 memory-hygiene fix (dedup._ngram_jaccard_pairs_build now
# materializes the pair result and releases its prefix/shingle caches;
# r8 ADVICE) changed the executed build of the direct query, the
# calibration's sparse fallback, and both matstore consumers of the
# shared pair artifact (whose retention also changed: matstore
# capacity 16 → 64 after the sf1 eviction anomaly). Slots 5-38: the
# 34 r4-only rows — the oldest driver evidence in the record (five
# rounds of shared-helper churn since their r4 green) — with the six
# rows the round-8 additions displaced from r8's tail first (the
# declared r9 front at the r8 rotation comment), then _GATE_R4
# registration order. Slots 39-47: the oldest r5-only rows, in
# _GATE_R5 registration order. Slots 48-50: round-9 additions (new
# work earns its driver row the round it lands; the r5-only re-attests
# they displaced — graph_bfs_3hop, doc_term_cooccurrence_lift,
# q_join_skew_profile — head the r10 plan with the other 33 r5-only
# rows).
# ROUND-11 GATE. Slots 1-2: round-11 additions (the two pre-flight
# mass meters that pair with this round's scale artifacts). Slots 3-6:
# MANDATORY plan-change re-attests — the round-11 band-mass guard in
# functions/lsh.py::lsh_near_dup_candidates adds a metered aggregate +
# persist to the executed plan of the embedding near-dup family
# (emb_near_dup_lsh and its three consumers; results unchanged, plans
# not). Slot 7: media_phash_near_dup re-executes rows-only — its plan
# gained the same guard this round (declared in _GATE_R11_ROWS_ONLY;
# execution-under-harness evidence, not a hash claim). Slots 8-13: the
# six r6-only rows the r10 widening re-attests displaced from r10
# slots 42-47 (the debt the r10 gate comment promised the r11 front).
# Slots 14-50: the next-oldest r6-only rows in _GATE_R6 registration
# order; the four that don't fit (doc_chunks, q_order_backlog_daily,
# q_part_skyline, events_lateness_profile) head the round-12 front.
_GATE_R11 = [
    # --- slots 1-2: round-11 additions ---
    "q_part_price_tie_mass",
    "cust_blocking_candidate_mass",
    # --- slots 3-6: SRP band-guard plan-change re-attests ---
    "emb_near_dup_lsh",
    "emb_semantic_dup_clusters",
    "emb_semantic_dup_rates",
    "dup_modality_agreement",
    # --- slot 7: phash guard plan-change, rows-only by design ---
    "media_phash_near_dup",
    # --- slots 8-22: optimization-round plan-change re-attests (the
    # r11 OPTIMIZATION pass rewrote these queries' physical plans —
    # matstore-shared ER pair/label indexes, fused LP rounds, int-keyed
    # BFS, persisted CC edge lists, single-pass BM25/RAKE, in-plan
    # scalar aggregates — results identical, plans not; a green row
    # earned under the old plan doesn't attest the new one) ---
    "cust_fuzzy_match_pairs",
    "cust_linkage_fs_scores",
    "cust_er_clusters3",
    "cust_golden_record",
    "graph_label_propagation3",
    "graph_bfs_3hop",
    "doc_dup_clusters",
    "doc_near_dedup_corpus",
    "doc_dup_rates_by_source",
    "doc_bm25_topk",
    "doc_tfidf_topk",
    "doc_lm_bigram_score",
    "doc_rake_keyphrases",
    "q_basket_affinity_lift",
    "q21_waiting_suppliers",
    # --- slots 23-28: the six displaced r6-only rows ---
    "q_nation_yoy_growth",
    "q_order_fulfillment_latency",
    "q_weighted_median_price",
    "graph_clustering_coefficient",
    "events_survival_curve",
    "events_time_weighted_value",
    # --- slots 29-50: next-oldest r6-only rows, _GATE_R6 order; the
    # thirteen the optimization re-attests displaced (q_order_
    # interarrival ... events_funnel) head the round-12 front with the
    # four r6-only rows the r11 gate already could not fit ---
    "q_equidepth_histogram",
    "q_part_substitution_candidates",
    "q2_min_acctbal_supplier",
    "q4_order_priority",
    "q6_revenue_forecast",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_priority_lines",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q22_idle_customers",
    "q_active_parts_semi",
    "q_brand_volume",
    "q_cube_returnflag_status",
]

# The single _GATE_R11 slot that intentionally carries no oracle:
# media_phash_near_dup is rows-only by design (the decode seam is
# Python; ROWS_ONLY.md) and re-executes this round because its plan
# gained the band-mass guard.
_GATE_R11_ROWS_ONLY = {
    "media_phash_near_dup",
}

# Queries ADDED in round 11 (same policy as _ADDED_R5-R10).
_ADDED_R11: list[str] = [
    "q_part_price_tie_mass",
    "cust_blocking_candidate_mass",
]

# ROUND-10 GATE. Slots 1-36: ALL 36 remaining r5-only rows — the
# oldest driver evidence in the record (r9 ask #2: "no driver row
# older than r6") — headed by the three rows the round-9 additions
# displaced from r9's tail (graph_bfs_3hop, doc_term_cooccurrence_lift,
# q_join_skew_profile), then _GATE_R5 registration order. Slots 37-41:
# the five rows-only queries that have NEVER run under the driver's
# harness (r9 ask #7) — they carry no oracle by design (ROWS_ONLY.md),
# so the driver records a rows-executed row (err:no_oracle), proving
# they run under the gate like the r4 ANN rows did. Slots 42-47: the
# oldest r6-only rows, _GATE_R6 registration order (the r11 front
# continues there). Slots 48-50: round-10 additions (new work earns
# its driver row the round it lands).
_GATE_R10 = [
    # --- slots 1-36: the 36 r5-only rows (oldest driver evidence) ---
    "graph_bfs_3hop",
    "doc_term_cooccurrence_lift",
    "q_join_skew_profile",
    "emb_component_histogram",
    "events_attribution_ushape",
    "q_frequent_itemsets",
    "events_frequent_sequences",
    "q_price_quantity_correlation",
    "events_bot_regularity",
    "doc_rake_keyphrases",
    "events_slo_burn",
    "q_duplicate_payment_audit",
    "q_revenue_waterfall",
    "rule_cross_apply",
    "keyword_alerts",
    "keyword_autotags",
    "graph_nodes",
    "graph_neighborhood",
    "graph_degree_topk",
    "media_inventory",
    "media_frame_sample",
    "media_dedup_fingerprint",
    "doc_dedup_exact",
    "doc_dedup_corpus",
    "doc_corpus_filtered",
    "doc_simhash",
    "doc_simhash_hamming_pairs",
    "q1_pricing_summary",
    "doc_ngram_novelty",
    "doc_split_leakage",
    "doc_dedup_canonical",
    "doc_quality_prune_sweep",
    "graph_jaccard_neighbors",
    "events_value_winsorized",
    "q_trade_flow_matrix",
    "events_funnel_latency",
    # --- slots 37-41: rows-only queries never driver-gated (the
    # driver records rows + err:no_oracle for these, like the r4 ANN
    # rows — execution-under-harness evidence, not a hash claim) ---
    "emb_matryoshka_recall",
    "media_phash_near_dup",
    "media_silence_runs",
    "doc_bpe_encode",
    "doc_compressibility",
    # --- slots 42-47: MANDATORY plan-change re-attests — the r10
    # MinHash widening (8 hashes/4 bands → 32/16 after the sf10r
    # ground-truth eval measured recall 0.37, dedup.py N_MINHASH
    # comment) changed the executed plans AND oracles of the whole
    # banded family plus the calibration audit. These displace the
    # six oldest r6-only rows that held these slots when the gate was
    # first frozen (q_nation_yoy_growth, q_order_fulfillment_latency,
    # q_weighted_median_price, graph_clustering_coefficient,
    # events_survival_curve, events_time_weighted_value) — those now
    # head the round-11 front, same policy as the r9 tail
    # displacement. ---
    "doc_minhash_lsh_pairs",
    "doc_dup_clusters",
    "doc_near_dedup_corpus",
    "doc_dup_rates_by_source",
    "doc_curation_funnel",
    "doc_minhash_calibration",
    # --- slots 48-50: round-10 additions ---
    "emb_exact_dup_mass",
    "q_basket_pair_mass",
    "media_payload_dup_mass",
]

# _GATE_R10 slots that intentionally carry no oracle (rows-only by
# design, ROWS_ONLY.md) — load_all()'s oracle check exempts exactly
# these; any OTHER gate slot without an oracle is still a hard error.
_GATE_R10_ROWS_ONLY = {
    "emb_matryoshka_recall",
    "media_phash_near_dup",
    "media_silence_runs",
    "doc_bpe_encode",
    "doc_compressibility",
}

# Queries ADDED in round 10 (same policy as _ADDED_R5-R9: oracled ones
# are swapped into _GATE_R10's tail when feasible; any that miss the
# gate are the front of the round-11 rotation).
_ADDED_R10: list[str] = [
    "emb_exact_dup_mass",
    "q_basket_pair_mass",
    "media_payload_dup_mass",
]

_GATE_R9 = [
    # --- slots 1-4: round-9 plan-change re-attests ---
    "doc_ngram_jaccard_pairs",
    "doc_minhash_calibration",
    "dup_modality_agreement",
    "doc_dup_inter_source_matrix",
    # --- slots 5-10: the declared r9 front (displaced from r8's tail
    # by the round-8 additions) ---
    "emb_label_stats",
    "emb_label_affinity",
    "emb_label_outliers",
    "emb_norm_outliers",
    "doc_reservoir_sample",
    "doc_curriculum_shards",
    # --- slots 11-38: the remaining 28 r4-only rows (_GATE_R4 order) ---
    "doc_mix_weights",
    "doc_pack_efficiency",
    "emb_semantic_dup_clusters",
    "doc_hybrid_rrf_topk",
    "q2_min_cost_supplier",
    "q13_customer_order_distribution",
    "q16_supplier_part_variety",
    "q22_lapsed_rich_customers",
    "q_rolling_revenue_7d",
    "q_cohort_ltv_matrix",
    "q_next_part_pairs",
    "q_table_stats_profile",
    "events_daily_gapfill",
    "events_drift_chi2_by_type",
    "events_forecast_holt",
    "events_acf_by_lag",
    "events_type_diversity_daily",
    "hive_chat_citations",
    "hive_chat_answer",
    "doc_tfidf_topk",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "q_referential_integrity_audit",
    "q_basket_affinity_lift",
    "q_customer_value_deciles",
    "q_supply_concentration_hhi",
    # --- slots 39-47: oldest r5-only rows (_GATE_R5 order) ---
    "doc_temperature_mix",
    "q_constraint_audit",
    "doc_dup_spans",
    "events_peak_concurrency",
    "q_kanonymity_audit",
    "doc_dup_span_coverage",
    "events_rollup_multigrain",
    "events_dau_wau_mau",
    "doc_source_overlap",
    # --- slots 48-50: round-9 additions (new work earns its driver
    # row the round it lands) ---
    "doc_prune_then_dedup",
    "doc_dup_family_stats",
    "doc_dedup_candidate_mass",
]

# Queries ADDED in round 9 (same policy as _ADDED_R5-R8: oracled ones
# are swapped into _GATE_R9's tail when feasible; any that miss the
# gate are the front of the round-10 rotation).
_ADDED_R9: list[str] = [
    "doc_prune_then_dedup",
    "doc_dup_family_stats",
    "doc_dedup_candidate_mass",
]

# Queries ADDED in round 8 (same policy as _ADDED_R5-R7: oracled ones
# are swapped into _GATE_R8's tail when feasible; any that miss the
# gate are the front of the round-9 rotation).
_ADDED_R8: list[str] = [
    "doc_tokenizer_fertility",
    "doc_vocab_growth_heaps",
    "doc_dup_inter_source_matrix",
]

# Queries ADDED in round 7 (same policy as _ADDED_R5/R6: oracled ones
# are swapped into _GATE_R7's tail when feasible; any that miss the
# gate are the front of the round-8 rotation).
_ADDED_R7: list[str] = [
    "cust_golden_record",
    "q_fd_violation_audit",
    "events_illegal_transitions",
]

# Queries ADDED in round 6 (same policy as _ADDED_R5: oracled ones are
# swapped into _GATE_R6's tail when feasible; any that miss the gate
# are the front of the round-7 rotation).
_ADDED_R6: list[str] = [
    "q_part_skyline",
    "doc_minhash_calibration",
    "events_lateness_profile",
    "q_order_backlog_daily",
]

# Queries ADDED in round 5. Oracled ones are swapped into _GATE_R5's
# re-attest tail when feasible (same-round driver row); any that miss
# the gate are the front of the round-6 rotation.
_ADDED_R5: list[str] = [
    "doc_ngram_novelty",
    "doc_split_leakage",
    "doc_dedup_canonical",
    "doc_quality_prune_sweep",
    "graph_jaccard_neighbors",
    "events_value_winsorized",
    "q_trade_flow_matrix",
    "q_part_substitution_candidates",
    "events_funnel_latency",
    "graph_label_propagation3",
    "cust_er_clusters3",
    "q_nation_yoy_growth",
    "q_order_fulfillment_latency",
    "q_weighted_median_price",
    "graph_clustering_coefficient",
    "events_survival_curve",
    "events_time_weighted_value",
    "q_equidepth_histogram",
]

# Round-4 gate kept for reference/tests of rotation history.
_GATE_R4 = [
    # --- slots 1-38: never driver-checked (27 oracled, 11 rows-only) ---
    # emb_* index/diagnostic family (pre-staged at r3 slots 51-66)
    "emb_dedup_exact",
    "emb_quantize_int8",
    "emb_hard_negatives",
    "emb_semantic_dup_rates",
    "emb_label_stats",
    "emb_label_affinity",
    "emb_label_outliers",
    "emb_norm_outliers",
    "emb_ann_lsh_topk",
    "emb_ann_ivf_topk",
    "emb_ann_recall",
    "emb_pq_eval",
    "emb_ivfpq_recall",
    "emb_spectrum_diagnostics",
    "events_approx_value_percentiles",
    "events_approx_user_count",
    # round-3 additions
    "doc_reservoir_sample",
    "doc_curriculum_shards",
    "doc_mix_weights",
    "doc_pack_efficiency",
    "emb_semantic_dup_clusters",
    "emb_mmr_diverse_topk",
    "emb_kmeans_stats",
    "doc_hybrid_rrf_topk",
    "q2_min_cost_supplier",
    "q13_customer_order_distribution",
    "q16_supplier_part_variety",
    "q22_lapsed_rich_customers",
    "q_rolling_revenue_7d",
    "q_cohort_ltv_matrix",
    "q_next_part_pairs",
    "q_table_stats_profile",
    "doc_bpe_train",
    "events_daily_gapfill",
    "events_drift_chi2_by_type",
    "events_forecast_holt",
    "events_acf_by_lag",
    "events_type_diversity_daily",
    # --- slots 39-50: re-attest round-4-edited code ---
    "hive_chat_citations",
    "hive_chat_answer",
    "dup_modality_agreement",
    "doc_tfidf_topk",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "q_referential_integrity_audit",
    "q_basket_affinity_lift",
    # deciles: edited in ROUND 3 (ntile_from_rank rework) after its
    # only driver row — the verdict explicitly asked for this
    # re-attest; the other round-4-de-hinted q_* not listed here are
    # covered by the local full-oracle sweep (the de-hint is
    # plan-only, value-neutral)
    "q_customer_value_deciles",
    "q_supply_concentration_hhi",
]

# Queries ADDED in round 4 (after _GATE_R4 froze): no driver row yet
# by construction — they are the FRONT of the round-5 rotation.
_ADDED_R4 = [
    "doc_temperature_mix",
    "q_constraint_audit",
    "doc_bpe_encode",
    "media_phash_near_dup",
    "doc_dup_spans",
    "cust_linkage_fs_scores",
    "events_peak_concurrency",
    "q_kanonymity_audit",
    "doc_dup_span_coverage",
    "events_rollup_multigrain",
    "events_dau_wau_mau",
    "doc_source_overlap",
    "graph_bfs_3hop",
    "doc_term_cooccurrence_lift",
    "media_silence_runs",
    "q_join_skew_profile",
    "emb_component_histogram",
    "events_attribution_ushape",
    "q_frequent_itemsets",
    "events_frequent_sequences",
    "q_price_quantity_correlation",
    "events_bot_regularity",
    "doc_rake_keyphrases",
    "events_slo_burn",
    "q_duplicate_payment_audit",
    "doc_compressibility",
    "q_revenue_waterfall",
    "emb_matryoshka_recall",
]

# Round-3 gate kept for reference/tests of rotation history.
_GATE_R3 = [
    # hive parity straggler (registered #51 in round 2)
    "hive_clients_online",
    # corpus_quality (17 oracled)
    "doc_repetition_ratio",
    "doc_decontaminate",
    "doc_lang_mismatch",
    "doc_bpe_pair_counts",
    "events_markov_transitions",
    "doc_dup_gram_coverage",
    "events_heavy_hitters",
    "doc_curation_funnel",
    "doc_winnow_fingerprints",
    "doc_drift_ks_by_source",
    "doc_tfidf_topk",
    "events_cusum_changepoint",
    "doc_lm_bigram_score",
    "dup_modality_agreement",
    "doc_length_outliers_mad",
    "doc_charset_profile",
    "doc_dup_gram_hotspots",
    # entity resolution
    "cust_fuzzy_match_pairs",
    # warehouse (11)
    "events_scd2_history",
    "events_snapshot_diff",
    "events_p95_exceedance",
    "events_weekday_seasonality",
    "events_user_lifecycle",
    "events_unconverted_clicks",
    "events_daily_trend_slope",
    "events_rfm_segments",
    "events_type_audience_overlap",
    "events_pareto_concentration",
    "events_burst_fano",
    # newer analytics (7)
    "q_copurchase_pairs",
    "q_lapsed_customers",
    "q_benford_price_audit",
    "q_supply_concentration_hhi",
    "q_customer_spend_gini",
    "q_basket_affinity_lift",
    "q_referential_integrity_audit",
    # dedup / graph / media never-checked
    "doc_near_dedup_corpus",
    "doc_dup_rates_by_source",
    "graph_triangle_count",
    "graph_kcore3",
    "media_shard_manifest",
    # similarity never-checked oracled (4 of 12; the other 8 defer to
    # round 4 — they're the homogeneous label/quantize diagnostics)
    "emb_near_dup_pairs",
    "emb_near_dup_lsh",
    "emb_centroid_by_label",
    "emb_knn_batch_topk",
    # --- slots 47-50: re-attest r1-green queries whose code changed ---
    "doc_minhash_lsh_pairs",
    "doc_dup_clusters",
    "graph_pagerank3",
    "emb_knn_topk",
    # --- 51+: next round's front of the line ---
    "emb_dedup_exact",
    "emb_quantize_int8",
    "emb_hard_negatives",
    "emb_semantic_dup_rates",
    "emb_label_stats",
    "emb_label_affinity",
    "emb_label_outliers",
    "emb_norm_outliers",
    "emb_ann_lsh_topk",
    "emb_ann_ivf_topk",
    "emb_ann_recall",
    "emb_pq_eval",
    "emb_ivfpq_recall",
    "emb_spectrum_diagnostics",
    "events_approx_value_percentiles",
    "events_approx_user_count",
]


def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    impose the round's gate order on the registry.

    The driver's correctness gate hash-checks the first 50 entries of
    ``QUERIES`` only, so registration order is a verification budget.
    Rather than encode the budget in fragile import order, imports stay
    alphabetical-ish and ``_GATE_R9`` (above) pins the explicit
    rotation: QUERIES is rebuilt with the listed names first, then all
    remaining registrations in their original order. Pinned by
    tests/test_registry.py, which also asserts every gate slot has a
    DuckDB oracle (rows-only slots come back ``err: no_oracle`` — 11
    slots were wasted that way in round 4; never again).

    History: round 1's top-50 was TPC-H-ish analytics + dedup + graph +
    rules + media; round 2's was timeline events_* + text_analysis
    doc_* + hive parity; round 3 rotated in the round-2 additions with
    no driver row plus 4 re-attests; round 4 took the last 38
    never-driver-checked queries plus 12 re-attests — closing the
    ORACLED surface; round 5 took the 23 oracled _ADDED_R4 + the
    oldest r1-only families + 11 of the round-5 additions; rounds 6-7
    rotated re-attests oldest-first plus same-round additions (50/50
    green every round; 0 hash failures in 7 rounds, all 221 oracled
    queries driver-green all-time as of r7).

    Round-12 rotation plan: (a) any _ADDED_R11 queries that miss the
    r11 gate, (b) re-attests of whatever round-12 edits touch, then
    (c) the four r6-only rows the r11 gate could not fit (doc_chunks,
    q_order_backlog_daily, q_part_skyline, events_lateness_profile),
    then the r7-only rows oldest-first in _GATE_R7 registration
    order, then the r4-era rows-only rows.
    """
    from the_hive_spark.operators import (  # noqa: F401
        timeline,
        text_analysis,
    )
    from the_hive_spark import hive_queries  # noqa: F401
    from the_hive_spark.operators import (  # noqa: F401
        similarity,
        analytics,
        dedup,
        graph,
        multimodal,
        rules,
        corpus_quality,
        entity_resolution,
        warehouse,
    )

    missing = [n for n in _GATE_R11 if n not in QUERIES]
    if missing:  # defensive: a renamed query must fail loudly, not
        # silently shift every later gate slot by one.
        raise RuntimeError(f"gate rotation names not registered: {missing}")
    unoracled = [
        n
        for n in _GATE_R11
        if n not in ORACLES and n not in _GATE_R11_ROWS_ONLY
    ]
    if unoracled:  # an UNDECLARED oracle-less slot verifies nothing
        # (driver: no_oracle) — only the declared rows-only slot (the
        # phash guard plan-change re-execution) may run without one
        # this round.
        raise RuntimeError(f"gate slots without an oracle: {unoracled}")
    oracled_rows_only = [n for n in _GATE_R11_ROWS_ONLY if n in ORACLES]
    if oracled_rows_only:  # the exemption must never mask a REAL
        # oracle: a query that gains one must leave the allowlist.
        raise RuntimeError(
            f"rows-only gate slots now have oracles: {oracled_rows_only}"
        )
    rotated = {n: QUERIES[n] for n in _GATE_R11}
    rotated.update((n, fn) for n, fn in QUERIES.items() if n not in rotated)
    QUERIES.clear()
    QUERIES.update(rotated)
