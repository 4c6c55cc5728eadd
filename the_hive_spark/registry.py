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


# Round-4 gate budget (the driver hash-checks the FIRST 50 entries of
# QUERIES): slots 1-38 are ALL remaining queries that have never had a
# driver CORRECTNESS row (r1 ∪ r2 ∪ r3 covered 146 of 184) — the
# emb_* index/diagnostic family, the round-3 additions, and the
# rows-only ANN/sketch evals (which surface via the driver's
# rows+schema check). Slots 39-50 re-attest queries whose code or plan
# changed this round: the chat-path broadcast fix (hive_chat_*), the
# de-hinted sf-scaling-dimension joins in operators/analytics.py, the
# emb_ids de-hint in dup_modality_agreement, and the vocabulary-join
# de-hint in doc_tfidf_topk. A green CORRECTNESS_r04.json closes the
# loop: every one of the 184 registered queries will then have had a
# driver row in some round.
# (Locally, tests/test_oracle_parity.py still sweeps ALL oracled
# queries every round regardless of this ordering.)
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
    alphabetical-ish and ``_GATE_R4`` (above) pins the explicit
    rotation: QUERIES is rebuilt with the listed names first, then all
    remaining registrations in their original order. Pinned by
    tests/test_registry.py.

    History: round 1's top-50 was TPC-H-ish analytics + dedup + graph +
    rules + media; round 2's was timeline events_* + text_analysis
    doc_* + hive parity; round 3 rotated in the round-2 additions with
    no driver row plus 4 re-attests; round 4 (this one) takes the LAST
    38 never-driver-checked queries plus 12 re-attests of round-4-
    edited code — full 184/184 closure once CORRECTNESS_r04.json lands.

    Round-5 rotation plan: with every pre-round-4 query driver-proven
    (assuming CORRECTNESS_r04 lands green), the budget flips to
    (a) the 28 queries in ``_ADDED_R4`` (registered after the r4 gate
    froze — no driver row yet; 23 oracled + 5 rows-only:
    doc_bpe_encode, media_phash_near_dup, media_silence_runs,
    doc_compressibility, emb_matryoshka_recall), then (b) re-attests
    of whatever round-5 edits touch, then (c) rolling re-attestation
    of the oldest green rows (r1 families first: analytics, dedup,
    graph, rules, media) so long-unverified code keeps earning fresh
    driver rows. That is 28 + ~22 — exactly one 50-slot budget.
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

    missing = [n for n in _GATE_R4 if n not in QUERIES]
    if missing:  # defensive: a renamed query must fail loudly, not
        # silently shift every later gate slot by one.
        raise RuntimeError(f"gate rotation names not registered: {missing}")
    rotated = {n: QUERIES[n] for n in _GATE_R4}
    rotated.update((n, fn) for n, fn in QUERIES.items() if n not in rotated)
    QUERIES.clear()
    QUERIES.update(rotated)
