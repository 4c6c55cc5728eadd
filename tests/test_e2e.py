"""End-to-end parity with the reference's own harnesses (SURVEY.md §5):

- seed → ingest → each golden phrase returns its document as top hit
  (cmd/seeder/main.go fixtures);
- rule + CONFIDENTIAL doc → ALERT row (cmd/integration-test/main.go:
  17-158, minus the WebSocket transport);
- the full flow driven through the streaming watch path, not batch.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from the_hive_spark.engine import HiveEngine
from the_hive_spark.streaming.watch import watch
from tests.fixtures import ALERT_RULE, CONFIDENTIAL_DOC, GOLDEN_QUERIES, SEED_DOCS


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    """Seed docs + confidential doc ingested via the watch stream."""
    root = tmp_path_factory.mktemp("e2e")
    watch_dir = root / "watch"
    watch_dir.mkdir()
    for name, text in SEED_DOCS.items():
        (watch_dir / name).write_text(text)
    (watch_dir / CONFIDENTIAL_DOC[0]).write_text(CONFIDENTIAL_DOC[1])

    eng = HiveEngine(spark, str(root / "wh"), embedding_dim=64)
    q = watch(eng, str(watch_dir), str(root / "ckpt"))
    q.awaitTermination(180)
    return eng


def test_golden_queries_top1(engine):
    """Each seeder phrase must rank its own document first (the
    deterministic embedder makes scores reproducible — SURVEY.md §5)."""
    for phrase, want_file in GOLDEN_QUERIES.items():
        top = engine.search(phrase, top_k=1, audit=False).collect()
        assert top, f"no hits for {phrase!r}"
        got = os.path.basename(top[0]["document_id"])
        assert got == want_file, f"{phrase!r}: got {got}, want {want_file}"


def test_confidential_alert_fired(engine):
    """P7/ST5: the CONFIDENTIAL document must have produced an ALERT
    row during streaming ingest (reference integration test asserts
    the same within 5 s over WebSocket)."""
    alerts = engine.read_table("alerts").collect()
    assert alerts, "no alerts emitted"
    docs = {os.path.basename(a["document_id"]) for a in alerts}
    assert CONFIDENTIAL_DOC[0] in docs
    assert all(a["alert_type"] == "ALERT" for a in alerts)


def test_rule_matches_confidential(engine):
    """E2E rule evaluation: the reference's standing rule matches the
    confidential doc (single-doc mode, deterministic fallback)."""
    engine.add_rule(1, ALERT_RULE)
    out = engine.evaluate_rules()
    hits = {os.path.basename(r["uploaded_doc"]) for r in out.collect()}
    assert CONFIDENTIAL_DOC[0] in hits
    # project_alpha.md also contains 'confidential'
    assert "project_alpha.md" in hits


def test_ingest_then_stats_and_timeline(engine):
    stats = engine.stats()
    assert stats["total_documents"] == len(SEED_DOCS) + 1
    assert stats["total_chunks"] >= stats["total_documents"]
    assert stats["total_vectors"] == stats["total_chunks"]
    events = engine.timeline(limit=100).collect()
    assert len(events) == len(SEED_DOCS) + 1
    assert all(e["event_type"] == "ingest" for e in events)


def test_watch_ingest_search_roundtrip_sf001(spark, tmp_path):
    """ST1-ST4 at data scale (round-2 verdict ask): the full
    watch → parse → ingest → search round-trip over the sf0.01
    documents corpus (500 real docs, not the 6 fixture files).

    - availableNow stream discovers and ingests every non-empty doc;
    - a known chunk's exact content must retrieve its own document
      top-1 (identical text ⇒ identical deterministic embedding ⇒
      cosine 1);
    - re-streaming the same tree from a fresh checkpoint is a no-op
      (ST2 change detection / ST4 idempotent redelivery).
    """
    sf = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
    if not os.path.isdir(sf):
        pytest.skip(f"no testdata at {sf}")
    docs = (
        spark.read.parquet(os.path.join(sf, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    )
    watch_dir = tmp_path / "watch"
    watch_dir.mkdir()
    expected = 0
    for r in docs:
        text = r["text"] or ""
        (watch_dir / f"doc_{r['doc_id']}.txt").write_text(text)
        if len(text.encode()) > 0:
            expected += 1

    eng = HiveEngine(spark, str(tmp_path / "wh"), embedding_dim=64)
    q = watch(eng, str(watch_dir), str(tmp_path / "ckpt1"))
    q.awaitTermination(300)

    stats = eng.stats()
    assert stats["total_documents"] == expected
    assert stats["total_vectors"] == stats["total_chunks"] >= expected

    # search round-trip: a chunk's own content is its best query.
    # Probe a chunk whose CONTENT is unique in the corpus — duplicated
    # text would tie at cosine 1.0 and the winner would be decided by
    # chunk-id order, not by the probe's document.
    chunks0 = eng.read_table("chunks").filter(F.col("chunk_index") == 0)
    uniq = chunks0.groupBy("content").count().filter(F.col("count") == 1)
    probe = (
        chunks0.join(uniq.select("content"), "content", "left_semi")
        .orderBy("document_id")
        .select("document_id", "content")
        .first()
    )
    assert probe is not None, "corpus has no unique chunk-0 content"
    top = eng.search(probe["content"], top_k=1, audit=False).collect()
    assert top and top[0]["document_id"] == probe["document_id"]

    # fresh checkpoint ⇒ full redelivery ⇒ change detection no-ops
    before = eng.read_table("chunks").count()
    q2 = watch(eng, str(watch_dir), str(tmp_path / "ckpt2"))
    q2.awaitTermination(300)
    assert eng.read_table("chunks").count() == before
    assert eng.stats()["total_documents"] == expected


def test_tenant_purge_isolation(spark, tmp_path):
    """S16 + §1.3: purging one org leaves the other intact."""
    eng = HiveEngine(spark, str(tmp_path / "wh"), embedding_dim=16)
    mk = lambda org: spark.createDataFrame(
        [(f"/{org}/doc.md", f"content for {org}", org, {})],
        "path string, content string, organization_id string, "
        "metadata map<string,string>",
    )
    eng.ingest_batch(mk("orgA"))
    eng.ingest_batch(mk("orgB"))
    eng.purge(organization_id="orgA")
    orgs = {
        r["organization_id"] for r in eng.read_table("chunks").collect()
    }
    assert orgs == {"orgB"}
    assert eng.search("content", top_k=5, organization_id="orgB",
                      audit=False).count() > 0
    assert eng.search("content", top_k=5, organization_id="orgA",
                      audit=False).count() == 0
