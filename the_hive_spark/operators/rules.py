"""Standing-rule evaluation and keyword predicates over documents.

The reference's rules engine (SURVEY.md §2: P6-P9, J3, U5): active
rules are a tiny dimension cross-applied to every document with a
keyword-contains fallback evaluator (internal/worker/analyst.go:
269-292), plus the CONFIDENTIAL-style alert predicate
(internal/server/hive_service.go:222-246) and keyword auto-tagging
(internal/worker/tagger.go:172-194). The LLM-backed evaluators (U2/U3)
live in functions/ai.py behind config; these deterministic fallbacks
are the correctness-testable surface.

The rule table is broadcast (P6's in-memory cache ≈ broadcast of a
dim), so rule evaluation adds zero shuffles at any corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table

# Keyword rules against the synthetic corpus vocabulary — the analog of
# the reference's confidential/pricing/secret lists (analyst.go:269-292).
RULE_KEYWORDS: list[tuple[int, str]] = [
    (1, "join"),
    (2, "filter"),
    (3, "window"),
    (4, "shuffle"),
]

# tagger.go:172-194 analog: keyword → #tag
TAG_KEYWORDS: list[tuple[str, str]] = [
    ("spark", "#spark"),
    ("table", "#table"),
    ("agg", "#agg"),
    ("scan", "#scan"),
    ("fast", "#fast"),
]


@query(
    "keyword_alerts",
    oracle="""
SELECT doc_id,
       CASE WHEN strpos(text, 'slow') > 0 THEN 1 ELSE 0 END AS alert_slow,
       CASE WHEN strpos(text, 'error') > 0 THEN 1 ELSE 0 END AS alert_error,
       CASE WHEN strpos(text, 'slow') > 0 OR strpos(text, 'error') > 0
            THEN 1 ELSE 0 END AS any_alert
FROM documents
""",
)
def keyword_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 keyword-alarm predicate per document (CONFIDENTIAL-detector
    shape: instr(content, kw) > 0 → alert flag)."""
    docs = table(spark, sf_dir, "documents")
    slow = (F.instr("text", "slow") > 0).cast("int")
    err = (F.instr("text", "error") > 0).cast("int")
    return docs.select(
        "doc_id",
        slow.alias("alert_slow"),
        err.alias("alert_error"),
        ((F.instr("text", "slow") > 0) | (F.instr("text", "error") > 0))
        .cast("int")
        .alias("any_alert"),
    )


@query(
    "rule_cross_apply",
    oracle=f"""
WITH rules(rule_id, keyword) AS (
  VALUES {", ".join(f"({rid}, '{kw}')" for rid, kw in RULE_KEYWORDS)}
)
SELECT rule_id, keyword,
       COUNT(*) FILTER (WHERE strpos(text, keyword) > 0) AS n_matched,
       COUNT(*) AS n_docs,
       CAST(MIN(CASE WHEN strpos(text, keyword) > 0 THEN doc_id END) AS BIGINT) AS first_match_doc
FROM documents CROSS JOIN rules
GROUP BY rule_id, keyword
""",
)
def rule_cross_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 rule × document cross join with U5 keyword evaluation.

    Every active rule against every document — the rules side is
    broadcast (4 rows), so this is one scan of documents regardless of
    rule count growth; per-rule tallies reduce map-side."""
    docs = table(spark, sf_dir, "documents")
    rules = spark.createDataFrame(RULE_KEYWORDS, ["rule_id", "keyword"])
    matched = F.instr(F.col("text"), F.col("keyword")) > 0
    return (
        docs.crossJoin(F.broadcast(rules))
        .groupBy("rule_id", "keyword")
        .agg(
            F.count(F.when(matched, 1)).alias("n_matched"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.when(matched, F.col("doc_id")))
            .cast("bigint")
            .alias("first_match_doc"),
        )
    )


@query(
    "keyword_autotags",
    oracle=f"""
SELECT doc_id,
       concat_ws(',', {", ".join(f"CASE WHEN strpos(text, '{kw}') > 0 THEN '{tag}' END" for kw, tag in TAG_KEYWORDS)}) AS tags,
       ({" + ".join(f"CASE WHEN strpos(text, '{kw}') > 0 THEN 1 ELSE 0 END" for kw, _ in TAG_KEYWORDS)}) AS n_tags
FROM documents
""",
)
def keyword_autotags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5/U4 fallback auto-tagger: keyword → #tag list (≤5 tags, F9
    comma-joined form for display parity with search_handler.go:143-165)."""
    docs = table(spark, sf_dir, "documents")
    tag_cols = [
        F.when(F.instr("text", kw) > 0, F.lit(tag)) for kw, tag in TAG_KEYWORDS
    ]
    n_tags = None
    for kw, _ in TAG_KEYWORDS:
        c = (F.instr("text", kw) > 0).cast("int")
        n_tags = c if n_tags is None else n_tags + c
    return docs.select(
        "doc_id",
        F.concat_ws(",", *tag_cols).alias("tags"),
        n_tags.alias("n_tags"),
    )
