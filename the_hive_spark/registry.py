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


# Round-3 gate budget (the driver hash-checks the FIRST 50 entries of
# QUERIES): slots 1-46 are oracled queries that have never had a driver
# CORRECTNESS row (r1 ∪ r2 covered 100 of 162; these are drawn from the
# remaining 54 oracled ones — corpus_quality, entity_resolution,
# warehouse, newer analytics/similarity, hive_clients_online). Slots
# 47-50 re-attest round-1-green queries whose code changed since their
# r1 row (quantized pair scoring, pagerank partitioning, matstore).
# The 8 oracled never-checked that didn't fit + the 8 rows-only-by-
# design queries sit at 51-66, first in line for the round-4 budget.
# (Locally, tests/test_oracle_parity.py still sweeps ALL oracled
# queries every round regardless of this ordering.)
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
    alphabetical-ish and ``_GATE_R3`` (above) pins the explicit
    rotation: QUERIES is rebuilt with the listed names first, then all
    remaining registrations in their original order. Pinned by
    tests/test_registry.py.

    History: round 1's top-50 was TPC-H-ish analytics + dedup + graph +
    rules + media; round 2's was timeline events_* + text_analysis
    doc_* + hive parity; round 3 (this one) rotates in the round-2
    additions that had no driver row yet, plus 4 re-attests of changed
    r1-green code.

    Round-4 rotation plan: after this round's gate lands, the queries
    with NO driver CORRECTNESS row are (a) the 16 pre-staged at slots
    51-66 of _GATE_R3 (8 deferred emb_* oracled + the 8 rows-only
    ANN/sketch evals), and (b) the ~21 round-3 additions — TPC-H
    completions (q2/q13/q16/q22), emb_semantic_dup_clusters,
    doc_reservoir_sample, doc_curriculum_shards, q_rolling_revenue_7d,
    doc_mix_weights, doc_hybrid_rrf_topk, events_daily_gapfill,
    q_cohort_ltv_matrix, q_next_part_pairs, q_table_stats_profile,
    events_drift_chi2_by_type, events_forecast_holt,
    doc_pack_efficiency (all oracled), plus emb_mmr_diverse_topk,
    emb_kmeans_stats, doc_bpe_train (rows-only). That is ~29 oracled
    never-checked: put ALL of them first in _GATE_R4, then fill the
    remaining ~21 slots re-attesting whatever round-4 edits touch
    (and, if untouched, the round-2-green families in family order).
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

    missing = [n for n in _GATE_R3 if n not in QUERIES]
    if missing:  # defensive: a renamed query must fail loudly, not
        # silently shift every later gate slot by one.
        raise RuntimeError(f"gate rotation names not registered: {missing}")
    rotated = {n: QUERIES[n] for n in _GATE_R3}
    rotated.update((n, fn) for n, fn in QUERIES.items() if n not in rotated)
    QUERIES.clear()
    QUERIES.update(rotated)
