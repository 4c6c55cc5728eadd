"""End-to-end HiveEngine tests: seed → ingest → search/rules/graph —
the SURVEY.md §5 strategy (golden top-1 queries over seeder fixtures
with the deterministic mock embedder)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from the_hive_spark.engine import HiveEngine
from the_hive_spark.schemas import INGEST_FILES
from tests.fixtures import (
    ALERT_RULE,
    CONFIDENTIAL_DOC,
    GOLDEN_QUERIES,
    seed_files,
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = HiveEngine(spark, str(tmp_path_factory.mktemp("warehouse")), embedding_dim=64)
    stats = eng.ingest_batch(seed_files(spark))
    assert stats["files"] == 5
    return eng


def test_golden_search_top1(engine):
    """Seeded doc is the top hit for its unique phrase (seeder parity)."""
    for phrase, expected_doc in GOLDEN_QUERIES.items():
        top = engine.search(phrase, top_k=3).collect()
        assert len(top) > 0, phrase
        assert top[0]["document_id"] == f"/watch/{expected_doc}", (
            f"{phrase!r} → {top[0]['document_id']}"
        )


def test_reingest_idempotent(engine, spark):
    """ST4: re-ingesting identical files is a no-op (change detection),
    and chunk ids are deterministic."""
    before = engine.read_table("chunks").count()
    stats = engine.ingest_batch(seed_files(spark))
    assert stats == {"files": 0, "chunks": 0, "alerts": 0}
    assert engine.read_table("chunks").count() == before


def test_confidential_alert_fires(engine, spark):
    """P7/ST5: CONFIDENTIAL content on chunk 0 ⇒ ALERT row (the
    integration-test contract, cmd/integration-test/main.go:136-153)."""
    path, text = CONFIDENTIAL_DOC
    files = spark.createDataFrame(
        [(f"/watch/{path}", text, "org1", None)], INGEST_FILES
    )
    stats = engine.ingest_batch(files)
    assert stats["alerts"] == 1
    alerts = engine.read_table("alerts").collect()
    assert any(a["document_id"] == f"/watch/{path}" for a in alerts)


def test_rule_evaluation_matches_confidential(engine):
    """J3+U5: keyword fallback rule matches the confidential doc."""
    engine.add_rule(1, ALERT_RULE, organization_id="org1")
    matches = engine.evaluate_rules().collect()
    docs = {m["uploaded_doc"] for m in matches}
    assert "/watch/test_confidential.txt" in docs
    m = next(m for m in matches if m["uploaded_doc"] == "/watch/test_confidential.txt")
    assert m["match_type"] == "single_doc"
    assert "confidential" in m["ai_explanation"]


def test_timeline_and_audit(engine):
    ev = engine.timeline(limit=100).collect()
    assert len(ev) >= 6  # 5 seeds + confidential
    assert all(e["event_type"] == "ingest" for e in ev)
    logs = engine.audit(action="SEARCH").collect()
    assert len(logs) > 0
    assert all("searched for" in log["details"] for log in logs)


def test_stats_counts(engine):
    s = engine.stats()
    assert s["total_documents"] == 6
    assert s["total_chunks"] >= 6
    assert s["total_vectors"] == s["total_chunks"]


def test_graph_edges_and_neighborhood(engine):
    engine.add_edge("/watch/project_alpha.md", "/watch/beta_analysis.md", "contradicts")
    engine.add_edge("/watch/project_alpha.md", "/watch/gamma_protocol.md", "references")
    nodes = {r["node_id"] for r in engine.graph_nodes().collect()}
    assert nodes == {
        "/watch/project_alpha.md",
        "/watch/beta_analysis.md",
        "/watch/gamma_protocol.md",
    }
    nb = engine.graph_neighborhood("/watch/beta_analysis.md").collect()
    assert len(nb) == 1
    assert nb[0]["relationship_type"] == "contradicts"


def test_contradiction_candidates_no_cartesian(engine):
    """J2 (analyst.go:295-377): the corpus-wide sweep must run on LSH
    band candidates, never an all-pairs BroadcastNestedLoopJoin — the
    round-2 verdict's scale-killer finding."""
    from the_hive_spark.plans.inspect import plan_summary

    df = engine.contradiction_candidates(top_k=3)
    summary = plan_summary(df)
    assert summary["cartesian_products"] == 0, summary
    assert summary["broadcast_nested_loop_joins"] == 0, summary

    rows = df.collect()
    # Per-source top-k bound holds and scores are valid cosines.
    by_src: dict[str, int] = {}
    for r in rows:
        by_src[r["source_doc_id"]] = by_src.get(r["source_doc_id"], 0) + 1
        assert -1.0001 <= r["score"] <= 1.0001
        assert r["source_doc_id"] != r["target_doc_id"]
    assert all(c <= 3 for c in by_src.values())
    # The seeded corpus is tiny and mutually similar enough that the
    # band join must surface at least some candidate pairs.
    assert len(rows) > 0


def test_contradiction_candidates_new_doc_batch(engine):
    """The per-ingest-batch path: exact top-k for the new docs via one
    broadcast pass over the corpus (the shape the reference runs)."""
    new = ["/watch/project_alpha.md"]
    rows = engine.contradiction_candidates(top_k=3, new_doc_ids=new).collect()
    assert {r["source_doc_id"] for r in rows} == set(new)
    assert len(rows) == 3  # corpus has 6 docs, so full k is reachable
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_chat_rag_citations(engine):
    row = engine.chat("Project Alpha confidential report", top_k=3).collect()[0]
    assert "Project Alpha" in row["answer"]
    assert len(row["citations"]) == 3
    assert row["citations"][0]["document_id"] == "/watch/project_alpha.md"


def test_tenant_purge(spark, tmp_path_factory):
    """S16: purge by org removes exactly that tenant's partitions."""
    eng = HiveEngine(spark, str(tmp_path_factory.mktemp("wh2")), embedding_dim=32)
    eng.ingest_batch(seed_files(spark, org="orgA"))
    files_b = spark.createDataFrame(
        [("/watch/b_doc.txt", "tenant b content here", "orgB", None)], INGEST_FILES
    )
    eng.ingest_batch(files_b)
    assert eng.read_table("chunks").filter(F.col("organization_id") == "orgA").count() > 0
    eng.purge("orgA")
    assert eng.read_table("chunks").filter(F.col("organization_id") == "orgA").count() == 0
    assert eng.read_table("chunks").filter(F.col("organization_id") == "orgB").count() > 0
    # org-scoped search only sees its tenant (P2 filter-then-rank)
    hits = eng.search("tenant b content", top_k=5, organization_id="orgB").collect()
    assert all(h["organization_id"] == "orgB" for h in hits)


def test_update_event_on_changed_file(spark, tmp_path):
    """ST2 decision parity: re-ingesting a changed file emits an
    'update' event; an unchanged file is skipped entirely."""
    from the_hive_spark.engine import HiveEngine

    eng = HiveEngine(spark, str(tmp_path / "wh"), embedding_dim=16)
    mk = lambda text: spark.createDataFrame(
        [("/w/a.md", text, "", {})],
        "path string, content string, organization_id string, "
        "metadata map<string,string>",
    )
    assert eng.ingest_batch(mk("version one"))["files"] == 1
    assert eng.ingest_batch(mk("version one"))["files"] == 0  # unchanged
    assert eng.ingest_batch(mk("version two"))["files"] == 1  # changed
    types = [
        r["event_type"]
        for r in eng.read_table("events").orderBy("id").collect()
    ]
    assert types == ["ingest", "update"]


def test_ship_corpus_layout_and_roundtrip(spark, tmp_path):
    """The corpus sink writes lang-partitioned, doc_id-sorted parquet
    that round-trips exactly: same rows as the doc_corpus_filtered
    query joined back to text, directories Hive-partitioned by lang,
    and doc_id non-decreasing within every file (row-group pruning
    depends on it)."""
    import os

    from the_hive_spark.operators.dedup import doc_corpus_filtered
    from the_hive_spark.sources.sinks import ship_corpus
    from the_hive_spark.tables import table

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus")
    n = ship_corpus(spark, sf, out)

    expected = doc_corpus_filtered(spark, sf).count()
    assert n == expected and n > 0

    langs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert langs, "expected Hive-style lang= partition directories"

    back = spark.read.parquet(out)
    got = {r.doc_id for r in back.select("doc_id").collect()}
    want = {r.doc_id for r in doc_corpus_filtered(spark, sf).collect()}
    assert got == want

    # per-file sortedness: every parquet part must be doc_id-sorted
    import pyarrow.parquet as pq

    for root, _dirs, files in os.walk(out):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            ids = pq.read_table(os.path.join(root, f), columns=["doc_id"])
            col = ids.column("doc_id").to_pylist()
            assert col == sorted(col), f"unsorted file {f}"


def test_write_dataset_salted_file_spread(spark, tmp_path):
    """target_files_per_partition > 1 must spread one partition value
    over several files (the skewed-tenant layout fix) without changing
    the row set."""
    import os

    from the_hive_spark.sources.sinks import write_dataset

    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(id % 2 AS STRING) AS tenant", "id * 2 AS payload"
    )
    out = str(tmp_path / "salted")
    write_dataset(
        df, out, partition_by=["tenant"], sort_within=["id"],
        target_files_per_partition=4,
    )
    back = spark.read.parquet(out)
    assert back.count() == 2000
    # partition-dir values are type-inferred on read; compare as strings
    assert {str(r.tenant) for r in back.select("tenant").distinct().collect()} == {"0", "1"}
    for d in os.listdir(out):
        if not d.startswith("tenant="):
            continue
        parts = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(parts) > 1, f"{d}: expected multiple files, got {parts}"


def test_compact_dataset_merges_small_files(spark, tmp_path):
    """Compaction rewrites a many-tiny-files dataset into the computed
    target file count with the row set byte-identical (sinks.py)."""
    import pyspark.sql.functions as F

    from the_hive_spark.sources.sinks import compact_dataset

    src = str(tmp_path / "tiny")
    dst = str(tmp_path / "compacted")
    # 64 writer tasks -> 64 tiny files, the streaming-sink failure mode
    spark.range(0, 10_000).select(
        "id", (F.col("id") % 7).alias("k"), F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(64).write.parquet(src)

    stats = compact_dataset(spark, src, dst, target_mb=256, sort_within=["id"])
    assert stats["files_before"] == 64
    assert stats["target_files"] == 1  # 10k rows ≪ 256 MB
    assert stats["files_after"] == 1

    before = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    after = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert before == after


def test_forget_document_erases_all_derived_rows(spark, tmp_path_factory):
    """Right-to-erasure: every artifact keyed to the document is gone,
    other documents are untouched, search can no longer retrieve it,
    and exactly one FORGET audit row remains."""
    from the_hive_spark.schemas import INGEST_FILES
    from tests.fixtures import seed_files

    eng = HiveEngine(spark, str(tmp_path_factory.mktemp("wh_forget")),
                     embedding_dim=32)
    eng.ingest_batch(seed_files(spark))
    target = "/watch/project_alpha.md"
    eng.add_edge(target, "/watch/beta_analysis.md", "references")
    eng.add_rule(1, "flag confidential material")
    eng.evaluate_rules()

    before_docs = eng.read_table("documents").count()
    deleted = eng.forget_document(target)
    assert deleted["documents"] == 1
    assert deleted["chunks"] >= 1
    assert deleted["graph_edges"] == 1

    assert eng.read_table("documents").count() == before_docs - 1
    assert eng.read_table("chunks").filter(
        F.col("document_id") == target).count() == 0
    assert eng.read_table("rule_matches").filter(
        F.col("uploaded_doc") == target).count() == 0
    hits = eng.search("Project Alpha confidential", top_k=5,
                      audit=False).collect()
    assert all(h["document_id"] != target for h in hits)
    trail = eng.audit(action="FORGET").collect()
    assert len(trail) == 1 and target in trail[0]["details"]


def test_integrity_report_clean_then_detects_orphans(spark, tmp_path_factory):
    """Warehouse self-audit: a freshly ingested warehouse has zero
    orphans; erasing a document's parent row by hand surfaces its
    chunks as orphans."""
    from tests.fixtures import seed_files

    eng = HiveEngine(spark, str(tmp_path_factory.mktemp("wh_integ")),
                     embedding_dim=16)
    eng.ingest_batch(seed_files(spark))
    report = {r["fk"]: r for r in eng.integrity_report().collect()}
    assert all(r["n_orphans"] == 0 for r in report.values()), report
    assert report["chunks.document_id -> documents"]["n_rows"] > 0

    # break a FK on purpose: drop one document row, keep its chunks
    target = "/watch/project_alpha.md"
    docs = eng.read_table("documents").filter(F.col("id") != target)
    eng._replace("documents", docs)
    report2 = {r["fk"]: r for r in eng.integrity_report().collect()}
    assert report2["chunks.document_id -> documents"]["n_orphans"] > 0
