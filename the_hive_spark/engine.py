"""HiveEngine — the reference's full platform surface as one PySpark
library (SURVEY.md §7.0): a warehouse of partitioned parquet tables
plus DataFrame-returning methods for ingest, semantic search, RAG
retrieval, rules, tagging, contradiction graph, timeline/audit
analytics, stats and purge.

No client/server split: the drone→gRPC→server pipeline (SURVEY.md
§3.2) collapses into ``ingest_batch`` (and streaming/watch.py wraps it
in Structured Streaming). External-service boundaries (embedding
provider, LLM) are mockable pandas UDFs; everything else is built-in
DataFrame ops.

Scale notes: tenant tables partition by organization_id (partition
pruning = tenancy, SURVEY.md §1.3); upserts are id-keyed
anti-join+append (Delta MERGE INTO is the drop-in at cluster scale —
the local parquet swap emulates it); search is a shuffle-free scan +
TakeOrdered(k).
"""

from __future__ import annotations

import logging
import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark import schemas
from the_hive_spark.functions.chunkers import chunk_sentence_udf
from the_hive_spark.functions.embedding import bow_embedding_np, make_embedder
from the_hive_spark.functions.ids import sha256_hex, uuid5_chunk_id
from the_hive_spark.operators.similarity import cosine

_LOG = logging.getLogger(__name__)

# P7 keyword alarm (hive_service.go:222-246)
ALERT_KEYWORD = "CONFIDENTIAL"
# U5 fallback keyword lists (analyst.go:269-292, tagger.go:172-194)
RULE_FALLBACK_KEYWORDS = ["confidential", "pricing", "secret"]
TAG_FALLBACK_KEYWORDS = ["legal", "finance", "urgent", "proposal"]
# P9 cross-doc rule classifier keywords (analyst.go:381-400)
CROSS_DOC_KEYWORDS = [
    "contradict", "contradiction", "contradicts",
    "agreement", "agreements", "breaks agreement",
    "existing document", "existing documents",
    "other document", "other documents",
    "previous document", "previous documents",
    "conflict", "conflicts", "conflicting",
    "violate", "violates", "violation",
    "inconsistent", "inconsistency",
]

_TABLE_SCHEMAS = {
    "documents": schemas.DOCUMENTS,
    "chunks": schemas.CHUNKS,
    "events": schemas.EVENTS,
    "graph_edges": schemas.GRAPH_EDGES,
    "audit_logs": schemas.AUDIT_LOGS,
    "rules": schemas.RULES,
    "api_keys": schemas.API_KEYS,
    "tracked_files": schemas.TRACKED_FILES,
    "alerts": schemas.ALERTS,
    "rule_matches": schemas.RULE_MATCHES,
    "chat_sessions": schemas.CHAT_SESSIONS,
    "chat_messages": schemas.CHAT_MESSAGES,
    "usage": schemas.USAGE,
    "system_metadata": schemas.SYSTEM_METADATA,
    "users": schemas.USERS,
    "organizations": schemas.ORGANIZATIONS,
    "logos": schemas.LOGOS,
}

# tables physically partitioned by tenant
_ORG_PARTITIONED = {"chunks", "audit_logs"}


class HiveEngine:
    """Facade over the warehouse tables + operator library."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        embedding_dim: int = schemas.EMBEDDING_DIM,
        embedding_provider: str = "bow",
    ) -> None:
        self.spark = spark
        self.warehouse = warehouse
        self.embedding_dim = embedding_dim
        self.embedding_provider = embedding_provider
        self._embed = make_embedder(embedding_provider, embedding_dim)
        os.makedirs(warehouse, exist_ok=True)

    # ------------------------------------------------------------- storage

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def read_table(self, name: str) -> DataFrame:
        path = self._path(name)
        schema = _TABLE_SCHEMAS[name]
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    def _append(self, name: str, df: DataFrame) -> None:
        writer = df.write.mode("append")
        if name in _ORG_PARTITIONED:
            writer = writer.partitionBy("organization_id")
        writer.parquet(self._path(name))

    def _replace(self, name: str, df: DataFrame) -> None:
        """Full-table swap (read side is materialized first so we can
        overwrite the same dir; at cluster scale this is MERGE INTO)."""
        tmp = self._path(name) + ".tmp"
        writer = df.write.mode("overwrite")
        if name in _ORG_PARTITIONED:
            writer = writer.partitionBy("organization_id")
        writer.parquet(tmp)
        final = self._path(name)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    def _upsert(self, name: str, new: DataFrame, key_cols: list[str]) -> None:
        """Idempotent MERGE-by-key: new rows win over existing (ST4,
        the INSERT OR REPLACE semantics of hive_service.go:81-86)."""
        existing = self.read_table(name)
        keep = existing.join(new.select(*key_cols).distinct(), key_cols, "left_anti")
        self._replace(name, keep.unionByName(new.select(*existing.columns)))

    # -------------------------------------------------------------- ingest

    def ingest_batch(self, files: DataFrame) -> dict[str, int]:
        """Batch ingest: change-detect → chunk → embed → tag → upsert →
        events/alerts/audit (SURVEY.md §3.2 as one declarative pipeline).

        ``files``: (path, content, organization_id, metadata) rows.
        Returns per-stage row counts (A3 ingest tally).
        """
        now = F.current_timestamp()
        files = files.withColumn("file_hash", sha256_hex(F.col("content")))

        # ST2 change detection (decision.go:43-98): same (path, hash) ⇒
        # skip; known path + new hash ⇒ update; unknown path ⇒ new
        tracked = self.read_table("tracked_files").select(
            F.col("file_path").alias("path"), F.col("file_hash")
        )
        known_paths = tracked.select("path").distinct().withColumn(
            "_known", F.lit(True)
        )
        fresh = (
            files.join(tracked, ["path", "file_hash"], "left_anti")
            .join(known_paths, ["path"], "left")
            .withColumn(
                "ingest_type",
                F.when(F.col("_known"), F.lit("update")).otherwise(F.lit("ingest")),
            )
            .drop("_known")
            .cache()
        )
        n_fresh = fresh.count()
        if n_fresh == 0:
            return {"files": 0, "chunks": 0, "alerts": 0}

        # documents upsert (doc id = path, as ingest_handler.go:92-95)
        docs = fresh.select(
            F.col("path").alias("id"),
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            now.alias("uploaded_at"),
            "metadata",
            "organization_id",
        )
        self._upsert("documents", docs, ["id"])

        # chunk (F2 sentence-aware server path) → deterministic ids (F3)
        chunks = (
            fresh.withColumn("_chunks", chunk_sentence_udf(F.col("content")))
            .select(
                F.col("path").alias("document_id"),
                F.posexplode("_chunks").alias("chunk_index", "content"),
                "organization_id",
                "metadata",
                "file_hash",
            )
            .withColumn(
                "id", uuid5_chunk_id(F.col("document_id"), F.col("chunk_index"))
            )
        )

        # embed (U1 mock provider) + fallback keyword tags (U5/U4)
        tag_arr = F.array_compact(
            F.array(
                *[
                    F.when(
                        F.instr(F.lower("content"), kw) > 0, F.lit(f"#{kw}")
                    )
                    for kw in TAG_FALLBACK_KEYWORDS
                ]
            )
        )
        chunk_rows = chunks.select(
            "id",
            "document_id",
            "content",
            F.col("chunk_index").cast("int").alias("chunk_index"),
            now.alias("created_at"),
            F.coalesce(F.col("organization_id"), F.lit("")).alias("organization_id"),
            self._embed(F.col("content")).alias("embedding"),
            F.map_concat(
                F.coalesce(
                    F.col("metadata"),
                    F.expr("cast(map() as map<string,string>)"),
                ),
                F.create_map(F.lit("file_hash"), F.col("file_hash")),
            ).alias("metadata"),
            F.slice(tag_arr, 1, 5).alias("tags"),
        ).cache()
        n_chunks = chunk_rows.count()
        self._upsert("chunks", chunk_rows, ["id"])

        # events: one ingest|update event per document (events.go:36-62;
        # the type reflects the ST2 new-vs-changed decision)
        tallies = chunk_rows.groupBy("document_id").agg(
            F.count(F.lit(1)).alias("n")
        ).join(
            fresh.select(F.col("path").alias("document_id"), "ingest_type"),
            "document_id",
        )
        base = self._next_id("events")
        # ingest batches can be a bulk backfill — ids via the scalable
        # range-partitioned numbering, not a single-partition window
        from the_hive_spark.functions.ids import dense_sequential_ids

        events = dense_sequential_ids(
            tallies, "document_id", base=base
        ).select(
            F.col("id"),
            now.alias("timestamp"),
            F.col("ingest_type").alias("event_type"),
            F.col("document_id").alias("document_name"),
            F.format_string("Ingested %d chunks", F.col("n")).alias("details"),
        )
        self._append("events", events)

        # P7 alert: keyword on chunk 0 (hive_service.go:222-246)
        alerts = (
            chunk_rows.filter(
                (F.col("chunk_index") == 0)
                & (F.instr(F.upper("content"), ALERT_KEYWORD) > 0)
            )
            .select(
                now.alias("timestamp"),
                F.lit("ALERT").alias("alert_type"),
                F.format_string(
                    "Document %s contains %s content", "document_id", F.lit(ALERT_KEYWORD)
                ).alias("message"),
                F.lit("warning").alias("level"),
                F.col("document_id").alias("document_id"),
                "organization_id",
            )
            .cache()
        )
        n_alerts = alerts.count()
        if n_alerts:
            self._append("alerts", alerts)

        # audit INGEST rows (audit_log.go:46-58)
        self._audit(
            fresh.select(
                F.lit("ingest").alias("client_ip"),
                F.lit("INGEST").alias("action"),
                F.format_string("Client ingested file [%s]", "path").alias("details"),
                F.coalesce("organization_id", F.lit("")).alias("organization_id"),
            )
        )

        # tracked_files upsert (ST2 state)
        tf = fresh.select(
            F.col("path").alias("file_path"),
            "file_hash",
            now.alias("last_processed"),
            F.lit("success").alias("server_status"),
        )
        self._upsert("tracked_files", tf, ["file_path"])

        return {"files": n_fresh, "chunks": n_chunks, "alerts": n_alerts}

    # -------------------------------------------------------------- search

    def search(
        self,
        query: str,
        top_k: int = 3,
        organization_id: str | None = None,
        client_ip: str = "local",
        audit: bool = True,
    ) -> DataFrame:
        """T1 top-k cosine semantic search (§3.1 lifecycle).

        Embeds the query with the deterministic mock provider, filters
        by tenant (partition-pruned), ranks by cosine — scan + project
        + TakeOrdered(k), no shuffle. Content/tags live in the same row
        (J1 pre-materialized)."""
        chunks = self.read_table("chunks")
        if organization_id is not None:
            chunks = chunks.filter(F.col("organization_id") == organization_id)
        qvec = self._embed_query(query)
        qcol = F.array(*[F.lit(float(x)) for x in qvec])
        result = (
            chunks.withColumn("_q", qcol)
            .withColumn("score", cosine("embedding", "_q"))
            .select(
                F.col("id").alias("chunk_id"),
                "document_id",
                "content",
                "chunk_index",
                "score",
                F.concat_ws(",", "tags").alias("tags_list"),
                "organization_id",
            )
            .orderBy(F.desc("score"), F.asc("chunk_id"))
            .limit(top_k)
        )
        if audit:
            self._audit_row(
                client_ip,
                "SEARCH",
                f"Client [{client_ip}] searched for [{query}]",
                organization_id or "",
            )
        return result

    def chat(
        self,
        query: str,
        top_k: int = 5,
        organization_id: str | None = None,
        session_id: str | None = None,
        user_id: str = "local",
    ):
        """U7 RAG retrieval: top-k context + citations struct; the
        answer is a template exactly like chat_handler.go:145-150.

        When ``session_id`` is given, the exchange persists to
        chat_sessions / chat_messages (ChatStore semantics inferred
        from chat_handler.go:152-196)."""
        hits = self.search(
            query, top_k=top_k, organization_id=organization_id, audit=False
        )
        ctx = hits.agg(
            F.concat_ws("\n\n", F.collect_list("content")).alias("context"),
            F.collect_list(
                F.struct(
                    F.col("document_id"),
                    F.col("chunk_id"),
                    F.col("content"),
                    F.col("score").cast("float").alias("score"),
                )
            ).alias("citations"),
        )
        result = ctx.withColumn(
            "answer",
            F.format_string(
                "Based on the retrieved context, here is what I found regarding"
                " '%s':\n\n%s",
                F.lit(query),
                F.col("context"),
            ),
        )
        if session_id is not None:
            self._persist_chat(query, result, session_id, user_id,
                               organization_id or "")
        return result

    def _persist_chat(self, query, result, session_id, user_id, org) -> None:
        existing = self.read_table("chat_sessions").filter(
            F.col("session_id") == session_id
        )
        if existing.isEmpty():
            title = query[:50]
            sess = self.spark.createDataFrame(
                [(session_id, user_id, org, title, None)], schemas.CHAT_SESSIONS
            ).withColumn("created_at", F.current_timestamp())
            self._append("chat_sessions", sess)
        prev = self.read_table("chat_messages").filter(
            F.col("session_id") == session_id
        )
        base = (prev.agg(F.max("message_index")).collect()[0][0] or -1) + 1
        row = result.collect()[0]  # single aggregate row by construction
        msgs = self.spark.createDataFrame(
            [
                (session_id, base, "user", query, [], None),
                (session_id, base + 1, "assistant", row["answer"],
                 [tuple(c) for c in row["citations"]], None),
            ],
            schemas.CHAT_MESSAGES,
        ).withColumn("created_at", F.current_timestamp())
        self._append("chat_messages", msgs)

    def chat_history(self, session_id: str) -> DataFrame:
        return (
            self.read_table("chat_messages")
            .filter(F.col("session_id") == session_id)
            .orderBy("message_index")
        )

    # --------------------------------------------------------------- usage

    def record_usage(self, model: str, input_tokens: int, output_tokens: int,
                     organization_id: str = "") -> None:
        """A9 token accounting (ai.Usage semantics, question.go:100-125)."""
        row = self.spark.createDataFrame(
            [(None, organization_id, model, input_tokens, output_tokens)],
            schemas.USAGE,
        ).withColumn("timestamp", F.current_timestamp())
        self._append("usage", row)

    def usage_tally(self, organization_id: str | None = None) -> DataFrame:
        """A9 per-org (and per-model) token rollup."""
        u = self.read_table("usage")
        if organization_id is not None:
            u = u.filter(F.col("organization_id") == organization_id)
        return u.groupBy("organization_id", "model").agg(
            F.sum("input_tokens").alias("total_input_tokens"),
            F.sum("output_tokens").alias("total_output_tokens"),
            F.count(F.lit(1)).alias("n_calls"),
        )

    # --------------------------------------------------------------- rules

    def add_rule(
        self, rule_id: int, query: str, organization_id: str = "", active: bool = True
    ) -> None:
        row = self.spark.createDataFrame(
            [(rule_id, query, active, None, organization_id)], schemas.RULES
        ).withColumn("created_at", F.current_timestamp())
        self._upsert("rules", row, ["id"])
        self._audit_row(
            "127.0.0.1", "RULE_ADD", f"rule {rule_id} added: {query}",
            organization_id,
        )

    def active_rules(self, organization_id: str | None = None) -> DataFrame:
        rules = self.read_table("rules").filter(F.col("active"))
        if organization_id is not None:
            rules = rules.filter(F.col("organization_id") == organization_id)
        return rules

    def evaluate_rules(
        self, document_ids: list[str] | DataFrame | None = None
    ) -> DataFrame:
        """J3 rule × document cross-apply with the U5 deterministic
        fallback evaluator (keyword contains ⇒ YES).

        ``document_ids`` may be a small explicit list (API calls) or a
        single-column ``document_id`` DataFrame (streaming batches) —
        the DataFrame form is restricted by semi-join, so an
        ``availableNow`` backlog batch never round-trips millions of
        ids through the driver as an ``isin`` literal.

        Returns rule_matches rows; also persists them."""
        docs = (
            self.read_table("chunks")
            .groupBy("document_id", "organization_id")
            .agg(
                # chunks joined in chunk_index order (the reference joins
                # in *arrival* order, hive_service.go:157-161 — a quirk we
                # consciously fix; SURVEY.md §7.3)
                F.expr(
                    "concat_ws('\\n\\n', transform("
                    "array_sort(collect_list(struct(chunk_index, content))),"
                    " s -> s.content))"
                ).alias("full_text")
            )
        )
        docs = _restrict_to_ids(docs, "document_id", document_ids)
        rules = self.active_rules()
        kw_hits = [
            F.when(
                F.instr(F.lower("full_text"), kw) > 0, F.lit(kw)
            )
            for kw in RULE_FALLBACK_KEYWORDS
        ]
        matched = (
            docs.crossJoin(F.broadcast(rules.select(F.col("id").alias("rule_id"), F.col("query").alias("rule_query"))))
            .withColumn("matched_kws", F.array_compact(F.array(*kw_hits)))
            .filter(F.size("matched_kws") > 0)
        )
        out = matched.select(
            "rule_id",
            "rule_query",
            F.col("document_id").alias("uploaded_doc"),
            F.lit("").alias("matched_doc"),
            F.lit("single_doc").alias("match_type"),
            F.format_string(
                "YES: document contains keywords [%s]",
                F.concat_ws(",", "matched_kws"),
            ).alias("ai_explanation"),
            "organization_id",
        )
        self._append("rule_matches", out)
        self._audit_row(
            "127.0.0.1", "RULE_EVAL",
            "standing rules evaluated (single_doc)", "",
        )
        return out

    # NOTE: evaluate_rules_cross_doc (below) writes its own RULE_EVAL
    # audit row too — rule_events() advertises the COMPLETE evaluation
    # trail, both evaluator modes.
    def evaluate_rules_cross_doc(
        self,
        document_ids: list[str] | DataFrame | None = None,
        top_k: int = 10,
    ) -> DataFrame:
        """J4: cross-doc rules (query text hits a P9 keyword,
        analyst.go:381-400) evaluate each new doc against its top-k
        most-similar neighbors (analyst.go:451-568). Deterministic
        fallback: the pair matches when BOTH docs contain a rule
        keyword (mirroring the single-doc U5 fallback applied to the
        pair). Neighbors come from the J2 similarity self-join."""
        is_cross = F.lit(False)
        for kw in CROSS_DOC_KEYWORDS:
            is_cross = is_cross | (F.instr(F.lower("query"), kw) > 0)
        cross_rules = self.active_rules().filter(is_cross).select(
            F.col("id").alias("rule_id"), F.col("query").alias("rule_query")
        )
        pairs = self._neighbor_pairs(top_k)
        pairs = _restrict_to_ids(pairs, "source_doc_id", document_ids)

        kw_hit_both = F.lit(False)
        for kw in RULE_FALLBACK_KEYWORDS:
            kw_hit_both = kw_hit_both | (
                (F.instr(F.lower("src_content"), kw) > 0)
                & (F.instr(F.lower("dst_content"), kw) > 0)
            )
        out = (
            pairs.crossJoin(F.broadcast(cross_rules))
            .filter(kw_hit_both)
            .select(
                "rule_id",
                "rule_query",
                F.col("source_doc_id").alias("uploaded_doc"),
                F.col("target_doc_id").alias("matched_doc"),
                F.lit("cross_doc").alias("match_type"),
                F.lit("YES: both documents contain rule keywords").alias(
                    "ai_explanation"
                ),
                F.lit("").alias("organization_id"),
            )
        )
        self._append("rule_matches", out)
        self._audit_row(
            "127.0.0.1", "RULE_EVAL",
            "standing rules evaluated (cross_doc)", "",
        )
        return out

    def _neighbor_pairs(self, top_k: int) -> DataFrame:
        """Top-k similarity pairs with both sides' first-chunk content."""
        from pyspark.sql import Window

        doc_vecs = (
            self.read_table("chunks")
            .filter(F.col("chunk_index") == 0)
            .select("document_id", "embedding", "content")
        )
        a, b = doc_vecs.alias("a"), doc_vecs.alias("b")
        pairs = a.join(
            b, F.col("a.document_id") != F.col("b.document_id")
        ).withColumn("score", cosine("a.embedding", "b.embedding"))
        w = Window.partitionBy("a.document_id").orderBy(
            F.desc("score"), F.asc("b.document_id")
        )
        return (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_k)
            .select(
                F.col("a.document_id").alias("source_doc_id"),
                F.col("b.document_id").alias("target_doc_id"),
                F.col("a.content").alias("src_content"),
                F.col("b.content").alias("dst_content"),
            )
        )

    # ------------------------------------------------------------ api keys

    def generate_api_key(self, client_name: str) -> str:
        """API-key issue (api_keys.go:124-151): deterministic key from
        name+count so tests are reproducible."""
        import hashlib

        n = self.read_table("api_keys").count()
        key = "hive_" + hashlib.sha256(
            f"{client_name}-{n}".encode()
        ).hexdigest()[:32]
        row = self.spark.createDataFrame(
            [(key, client_name, True, None, None)], schemas.API_KEYS
        ).withColumn("created_at", F.current_timestamp())
        self._upsert("api_keys", row, ["key"])
        return key

    def set_api_key_active(self, key: str, active: bool) -> None:
        keys = self.read_table("api_keys").withColumn(
            "is_active",
            F.when(F.col("key") == key, F.lit(active)).otherwise(F.col("is_active")),
        )
        self._replace("api_keys", keys)

    def touch_api_key(self, key: str) -> None:
        """ST6 heartbeat: mark last_seen now (api_keys.go:276-310)."""
        keys = self.read_table("api_keys").withColumn(
            "last_seen_at",
            F.when(F.col("key") == key, F.current_timestamp()).otherwise(
                F.col("last_seen_at")
            ),
        )
        self._replace("api_keys", keys)

    def clients_status(self) -> DataFrame:
        """A6 online derivation + F12 key masking for display."""
        from the_hive_spark.functions.textops import mask_key
        from the_hive_spark.streaming.liveness import online_clients

        return online_clients(self.read_table("api_keys")).select(
            mask_key(F.col("key")).alias("masked_key"),
            "client_name",
            "is_active",
            "last_seen_at",
            "is_online",
        )

    # ------------------------------------------------- users / orgs (§2.10)

    ROLES = ("super-admin", "admin", "viewer")  # users_handler.go RBAC tiers

    def create_organization(
        self, name: str, custom_domain: str | None = None
    ) -> str:
        """Org CRUD (tenant_handler.go:13-120 semantics; store file
        missing from snapshot). Deterministic id = UUIDv5(name) so
        re-creation is idempotent, matching the engine's MERGE style."""
        import uuid

        org_id = str(uuid.uuid5(uuid.NAMESPACE_URL, f"org-{name}"))
        row = self.spark.createDataFrame(
            [(org_id, name, custom_domain, None)], schemas.ORGANIZATIONS
        ).withColumn("created_at", F.current_timestamp())
        self._upsert("organizations", row, ["organization_id"])
        return org_id

    def create_user(
        self,
        email: str,
        role: str = "viewer",
        organization_id: str | None = None,
        display_name: str | None = None,
    ) -> str:
        """User CRUD (users_handler.go:13-263 semantics). Role must be
        one of the reference's three tiers; id = UUIDv5(email)."""
        import uuid

        if role not in self.ROLES:
            raise ValueError(f"unknown role {role!r}; expected one of {self.ROLES}")
        user_id = str(uuid.uuid5(uuid.NAMESPACE_URL, f"user-{email}"))
        row = self.spark.createDataFrame(
            [(user_id, email, display_name or email.split("@")[0], role,
              organization_id, True, None)],
            schemas.USERS,
        ).withColumn("created_at", F.current_timestamp())
        self._upsert("users", row, ["user_id"])
        return user_id

    def set_user_role(self, user_id: str, role: str) -> None:
        if role not in self.ROLES:
            raise ValueError(f"unknown role {role!r}; expected one of {self.ROLES}")
        users = self.read_table("users").withColumn(
            "role",
            F.when(F.col("user_id") == user_id, F.lit(role)).otherwise(F.col("role")),
        )
        self._replace("users", users)

    def set_user_active(self, user_id: str, active: bool) -> None:
        users = self.read_table("users").withColumn(
            "is_active",
            F.when(F.col("user_id") == user_id, F.lit(active)).otherwise(
                F.col("is_active")
            ),
        )
        self._replace("users", users)

    def users(self, organization_id: str | None = None) -> DataFrame:
        df = self.read_table("users")
        if organization_id is not None:
            df = df.filter(F.col("organization_id") == organization_id)
        return df.orderBy("email")

    def organizations(self) -> DataFrame:
        return self.read_table("organizations").orderBy("name")

    def require_role(self, user_id: str, allowed: tuple[str, ...]) -> bool:
        """RBAC gate (cmd/hive-server/main.go:535-537 middleware
        analog): active user whose role is in ``allowed``. super-admin
        passes every gate, as in the reference's middleware chain."""
        rows = (
            self.read_table("users")
            .filter((F.col("user_id") == user_id) & F.col("is_active"))
            .select("role")
            .collect()
        )
        return bool(rows) and (
            rows[0]["role"] == "super-admin" or rows[0]["role"] in allowed
        )

    def org_from_domain(self, domain: str) -> str | None:
        """Tenant-from-domain resolution (the middleware step of §3.1;
        CustomDomainStore semantics from cmd/hive-server/main.go)."""
        rows = (
            self.read_table("organizations")
            .filter(F.col("custom_domain") == domain)
            .select("organization_id")
            .collect()
        )
        return rows[0]["organization_id"] if rows else None

    # ------------------------------------------- §2.10 misc surface
    # (misc_handlers.go:13-94 — every one a TODO stub in the
    # reference; implemented here as working supersets)

    def rule_matches(
        self, limit: int = 100, organization_id: str | None = None
    ) -> DataFrame:
        """GET /rules/matches (misc_handlers.go:27-39 stub): the
        persisted standing-rule match log the evaluators append to."""
        m = self.read_table("rule_matches")
        if organization_id is not None:
            m = m.filter(F.col("organization_id") == organization_id)
        return m.orderBy(
            F.desc("rule_id"), F.asc("uploaded_doc"), F.asc("matched_doc")
        ).limit(limit)

    def rule_events(self, limit: int = 100) -> DataFrame:
        """GET /rules/events (misc_handlers.go:41-53 stub): the audit
        trail of rule lifecycle + evaluation actions."""
        return (
            self.read_table("audit_logs")
            .filter(F.col("action").isin("RULE_ADD", "RULE_EVAL"))
            .orderBy(F.desc("timestamp"), F.desc("id"))
            .limit(limit)
        )

    def export_audit(self, path: str, fmt: str = "jsonl") -> int:
        """GET /audit/export (misc_handlers.go:55-67 stub): dump the
        audit log as JSONL or CSV shards; returns the exported row
        count. Timestamps serialize as ISO strings so the export is
        engine-agnostic."""
        if fmt not in ("jsonl", "csv"):
            raise ValueError(f"unsupported export format: {fmt}")
        logs = self.read_table("audit_logs").withColumn(
            "timestamp", F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        ).persist()
        try:
            n = logs.count()
            writer = logs.write.mode("overwrite")
            if fmt == "jsonl":
                writer.json(path)
            else:
                writer.option("header", True).csv(path)
        finally:
            logs.unpersist()
        return n

    def upload_logo(
        self,
        organization_id: str,
        name: str,
        content: bytes,
        content_type: str = "image/png",
    ) -> None:
        """POST /logos/upload (misc_handlers.go:83-94 stub): org
        branding asset as an opaque binary column, idempotent on
        (org, name)."""
        row = self.spark.createDataFrame(
            [(organization_id, name, content, content_type,
              len(content), None)],
            schemas.LOGOS,
        ).withColumn("uploaded_at", F.current_timestamp())
        self._upsert("logos", row, ["organization_id", "name"])

    def list_logos(self, organization_id: str | None = None) -> DataFrame:
        """GET /logos (misc_handlers.go:70-81 stub): metadata listing
        only — the binary column is projected OUT, so the scan prunes
        to a few bytes per row however large the assets are."""
        logos = self.read_table("logos").select(
            "organization_id", "name", "content_type", "uploaded_at",
            "n_bytes",
        )
        if organization_id is not None:
            logos = logos.filter(F.col("organization_id") == organization_id)
        return logos.orderBy("organization_id", "name")

    def login_as(self, actor_user_id: str, target_user_id: str) -> dict:
        """POST /login-as (misc_handlers.go:13-25 stub): super-admin
        impersonation — validates the actor's role, refuses inactive
        targets, and leaves an audit trail naming both parties."""
        if not self.require_role(actor_user_id, ("super-admin",)):
            raise PermissionError(
                f"login-as requires super-admin, denied for {actor_user_id}"
            )
        target = (
            self.read_table("users")
            .filter(F.col("user_id") == target_user_id)
            .collect()
        )
        if not target or not target[0]["is_active"]:
            raise ValueError(f"login-as target unavailable: {target_user_id}")
        row = target[0]
        self._audit_row(
            "127.0.0.1",
            "LOGIN_AS",
            f"user {actor_user_id} logged in as {target_user_id}",
            row["organization_id"] or "",
        )
        return row.asDict()

    # ---------------------------------------------------- system metadata

    def set_metadata(self, key: str, value: str) -> None:
        """K/V system metadata upsert (system_metadata.go:28-60)."""
        row = self.spark.createDataFrame([(key, value)], schemas.SYSTEM_METADATA)
        self._upsert("system_metadata", row, ["key"])

    def get_metadata(self, key: str) -> str | None:
        rows = (
            self.read_table("system_metadata")
            .filter(F.col("key") == key)
            .select("value")
            .collect()
        )
        return rows[0]["value"] if rows else None

    def days_active(self, as_of: str | None = None) -> int:
        """A7: whole days since install_date (system_metadata.go:96-104,
        int(time.Since(install).Hours()/24)). ``as_of`` (YYYY-MM-DD)
        pins 'now' for deterministic tests; default is current_date."""
        install = self.get_metadata("install_date")
        if install is None:
            return 0
        now = F.to_date(F.lit(as_of)) if as_of else F.current_date()
        row = self.spark.range(1).select(
            F.datediff(now, F.to_date(F.lit(install))).alias("d")
        ).collect()[0]
        return max(int(row["d"]), 0)

    def trial_days_remaining(
        self, trial_days: int = 365, as_of: str | None = None
    ) -> int:
        """A8: licensing trial countdown (licensing_middleware.go:70-84,
        middleware/license.go:17-76 — 365-day trial from install)."""
        return max(trial_days - self.days_active(as_of=as_of), 0)

    # --------------------------------------------------------------- graph

    def contradiction_candidates(
        self,
        top_k: int = 5,
        new_doc_ids: list[str] | DataFrame | None = None,
        n_planes: int = 64,
        n_bands: int = 8,
    ) -> DataFrame:
        """J2: for each document, its top-k most-similar other docs —
        the candidate pairs the analyst would LLM-check (analyst.go:
        295-377, which takes the top-5 *ANN* neighbors per new doc from
        its vector store). Deterministic fallback marks a 'contradicts'
        edge when both docs alert on the keyword predicate.

        Two scale paths, neither a cartesian:

        - ``new_doc_ids`` given (the per-ingest-batch shape the
          reference actually runs; a list for explicit API calls, or a
          single-column DataFrame so per-batch id sets never leave the
          cluster): the batch's MEASURED size decides
          the strategy (plans/advisor.advise_relation — the ANALYZE
          consumer). A batch whose query vectors fit the session's
          broadcast threshold broadcasts against one corpus pass —
          exact top-k, zero shuffles of the corpus side. A batch too
          big to broadcast (a backlog replay) would make the
          nested-loop quadratic AND overflow the broadcast, so it
          falls back to the banded-LSH index path below, restricted to
          the batch's sources. This is a logical-plan switch AQE
          cannot make at runtime — hence the explicit measurement.
        - corpus-wide sweep (``new_doc_ids=None``): banded SRP-LSH
          candidate pairs (the AND-OR construction from
          functions/lsh.py) then per-source top-k within candidates.
          Approximate like the reference's ANN store; the only shuffle
          is the (id, band, val) equi-join, which is how this survives
          where the old all-pairs BroadcastNestedLoopJoin could not.
          Docs whose bands collide with nothing yield no rows, exactly
          as an ANN index returns no neighbors below its recall floor.

          The band width is the recall-vs-candidate-volume dial: the
          8-bit default (64 planes / 8 bands) keeps background
          collisions at ~3% of pairs while retaining ~50%+ recall on
          moderately similar (cos ≥ 0.7) neighbors. All-doc top-k over
          LOW-similarity corpora is inherently an index problem — at
          that scale run the per-batch path per partition of new docs,
          or widen bands (fewer bits) accepting more candidates.
        """
        from pyspark.sql import Window

        from the_hive_spark.functions.lsh import lsh_near_dup_candidates

        doc_vecs = (
            self.read_table("chunks")
            .filter(F.col("chunk_index") == 0)
            .select(
                "document_id",
                "embedding",
                (F.instr(F.upper("content"), ALERT_KEYWORD) > 0).alias("_alert"),
            )
        )
        flags = doc_vecs.select("document_id", "_alert")

        exact_batch = False
        batch_ids: DataFrame | None = None
        if new_doc_ids is not None:
            from the_hive_spark.plans.advisor import (
                advise_relation,
                advise_rowcount,
            )

            if isinstance(new_doc_ids, DataFrame):
                batch_ids = new_doc_ids
                # ids already live on the cluster: the count is the
                # ANALYZE cost (one tiny aggregate) advise_relation
                # exists to pay before an expensive plan choice
                decision = advise_relation(
                    new_doc_ids, bytes_per_row=64 + 4 * self.embedding_dim
                )
            else:
                # stats pick the strategy: float vectors dominate the
                # row (4 B/component) plus id/flag overhead.
                # len(new_doc_ids) is a free driver-side upper bound —
                # counting would scan the chunks table once per ingest
                # batch just to learn a number the caller holds
                decision = advise_rowcount(
                    self.spark,
                    len(new_doc_ids),
                    bytes_per_row=64 + 4 * self.embedding_dim,
                )
                if not decision.broadcast:
                    # too big for an isin literal too (an O(batch)
                    # driver-built IN expression blows up plan/codegen
                    # at exactly the batch sizes this branch exists
                    # for) — ship the ids as a distributed relation
                    batch_ids = self.spark.createDataFrame(
                        [(i,) for i in new_doc_ids], "document_id string"
                    )
            # the chosen LOGICAL plan (exact broadcast top-k vs banded
            # LSH index) is invisible in the result rows; log it so a
            # backlog replay's approximate output is distinguishable
            _LOG.info("contradiction_candidates batch path: %r", decision)
            exact_batch = decision.broadcast
            q = _restrict_to_ids(
                doc_vecs, "document_id", new_doc_ids
                if batch_ids is None else batch_ids
            ).select(
                F.col("document_id").alias("source_doc_id"),
                F.col("embedding").alias("qvec"),
                F.col("_alert").alias("_alert_a"),
            )

        if exact_batch:
            # Broadcast the new batch; one pass over the corpus.
            scored = (
                doc_vecs.select(
                    F.col("document_id").alias("target_doc_id"),
                    "embedding",
                    F.col("_alert").alias("_alert_b"),
                )
                .crossJoin(F.broadcast(q))
                .filter(F.col("source_doc_id") != F.col("target_doc_id"))
                .withColumn("score", cosine("qvec", "embedding"))
            )
        else:
            cand = lsh_near_dup_candidates(
                doc_vecs.select("document_id", "embedding"),
                id_col="document_id",
                vec_col="embedding",
                n_planes=n_planes,
                n_bands=n_bands,
            )
            undirected = cand.withColumn("score", cosine("vec_a", "vec_b")).select(
                "id_a", "id_b", "score"
            )
            directed = undirected.union(
                undirected.select(
                    F.col("id_b").alias("id_a"),
                    F.col("id_a").alias("id_b"),
                    "score",
                )
            )
            scored = (
                directed.withColumnsRenamed(
                    {"id_a": "source_doc_id", "id_b": "target_doc_id"}
                )
                .join(
                    flags.withColumnsRenamed(
                        {"document_id": "source_doc_id", "_alert": "_alert_a"}
                    ),
                    "source_doc_id",
                )
                .join(
                    flags.withColumnsRenamed(
                        {"document_id": "target_doc_id", "_alert": "_alert_b"}
                    ),
                    "target_doc_id",
                )
            )
            if new_doc_ids is not None:
                # too-big-to-broadcast batch: index path restricted to
                # the batch's sources via LEFT SEMI join (batch_ids is
                # always a DataFrame on this path — a driver isin
                # literal would grow with the very batch size the
                # fallback exists to survive)
                scored = _restrict_to_ids(
                    scored, "source_doc_id", batch_ids
                )

        w = Window.partitionBy("source_doc_id").orderBy(
            F.desc("score"), F.asc("target_doc_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_k)
            .select(
                "source_doc_id",
                "target_doc_id",
                "score",
                (F.col("_alert_a") & F.col("_alert_b")).alias("contradicts"),
            )
        )

    def add_edge(
        self, src: str, dst: str, relationship: str, description: str = ""
    ) -> None:
        row = self.spark.createDataFrame(
            [(src, dst, relationship, description, None)], schemas.GRAPH_EDGES
        ).withColumn("created_at", F.current_timestamp())
        self._upsert(
            "graph_edges", row, ["source_doc_id", "target_doc_id", "relationship_type"]
        )

    def graph_nodes(self) -> DataFrame:
        """A5 union-distinct node derivation."""
        e = self.read_table("graph_edges")
        return (
            e.select(F.col("source_doc_id").alias("node_id"))
            .union(e.select("target_doc_id"))
            .distinct()
        )

    def graph_neighborhood(self, doc_id: str) -> DataFrame:
        """J5 disjunctive neighborhood."""
        e = self.read_table("graph_edges")
        return e.filter(
            (F.col("source_doc_id") == doc_id) | (F.col("target_doc_id") == doc_id)
        )

    # ----------------------------------------------------- timeline / stats

    def timeline(self, limit: int = 100, document_name: str | None = None) -> DataFrame:
        """T2/P3 recent events."""
        ev = self.read_table("events")
        if document_name is not None:
            ev = ev.filter(F.col("document_name") == document_name)
        return ev.orderBy(F.desc("timestamp"), F.desc("id")).limit(limit)

    def audit(self, limit: int = 50, action: str | None = None,
              organization_id: str | None = None) -> DataFrame:
        """T3/P4 recent audit logs with optional filters."""
        logs = self.read_table("audit_logs")
        if action is not None:
            logs = logs.filter(F.col("action") == action)
        if organization_id is not None:
            logs = logs.filter(F.col("organization_id") == organization_id)
        return logs.orderBy(F.desc("timestamp"), F.desc("id")).limit(limit)

    def stats(self) -> dict[str, int]:
        """A1/A2 chunk + vector counts."""
        chunks = self.read_table("chunks")
        return {
            "total_chunks": chunks.count(),
            "total_vectors": chunks.filter(F.col("embedding").isNotNull()).count(),
            "total_documents": self.read_table("documents").count(),
        }

    def purge(self, organization_id: str | None = None) -> None:
        """S16: tenant purge = partition drop; full purge = table reset."""
        if organization_id is None:
            for t in ("chunks", "documents"):
                p = self._path(t)
                if os.path.exists(p):
                    shutil.rmtree(p)
            return
        chunks = self.read_table("chunks").filter(
            F.col("organization_id") != organization_id
        )
        self._replace("chunks", chunks)
        docs = self.read_table("documents").filter(
            (F.col("organization_id").isNull())
            | (F.col("organization_id") != organization_id)
        )
        self._replace("documents", docs)

    def integrity_report(self) -> DataFrame:
        """Warehouse self-audit: orphan counts for every internal
        foreign key (chunks→documents, alerts→documents,
        rule_matches→rules, chat_messages→chat_sessions,
        users→organizations) — the load-validation gate run against
        the engine's OWN tables, same one-pass-per-table conditional-
        aggregation shape as the testdata referential audit
        (operators/analytics.py::q_referential_integrity_audit).
        A non-zero row means an upsert/purge path broke atomicity.
        """
        from functools import reduce

        checks = [
            ("chunks.document_id -> documents", "chunks", "document_id",
             "documents", "id"),
            ("alerts.document_id -> documents", "alerts", "document_id",
             "documents", "id"),
            ("rule_matches.rule_id -> rules", "rule_matches", "rule_id",
             "rules", "id"),
            ("chat_messages.session_id -> chat_sessions", "chat_messages",
             "session_id", "chat_sessions", "session_id"),
            ("users.organization_id -> organizations", "users",
             "organization_id", "organizations", "organization_id"),
        ]
        parts: list[DataFrame] = []
        for label, fact_t, fk, dim_t, pk in checks:
            fact = self.read_table(fact_t).select(F.col(fk))
            keys = (
                self.read_table(dim_t)
                .select(F.col(pk).alias(fk))
                .distinct()
                .withColumn("_ok", F.lit(1))
            )
            row = (
                fact.filter(F.col(fk).isNotNull())
                # unhinted: the documents key set is corpus-sized at
                # scale; AQE broadcasts the genuinely small dims
                .join(keys, fk, "left")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    # coalesce: SUM over an EMPTY fact table is NULL,
                    # and an empty table has zero orphans, not unknown
                    F.coalesce(
                        F.sum(F.when(F.col("_ok").isNull(), 1).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias("n_orphans"),
                )
            )
            parts.append(row.select(F.lit(label).alias("fk"), "n_rows", "n_orphans"))
        return reduce(DataFrame.unionAll, parts)

    def forget_document(self, document_id: str) -> dict[str, int]:
        """Right-to-erasure at document granularity (the GDPR-shaped
        complement of the tenant-level purge): remove the document and
        every derived artifact keyed to it — chunks, tracked-file
        entry, alerts, rule matches, graph edges — and leave an audit
        row recording the erasure (the one trace that legally should
        remain). Returns per-table deleted-row counts.

        At cluster scale each filter is an anti-join rewrite of the
        table (Delta DELETE WHERE); row groups that don't contain the
        key are skipped by parquet min/max stats when the tables are
        clustered on their document keys (sinks.write_dataset's
        sort_within convention).
        """
        deleted: dict[str, int] = {}
        preds = {
            "documents": F.col("id") == document_id,
            "chunks": F.col("document_id") == document_id,
            "tracked_files": F.col("file_path") == document_id,
            "alerts": F.col("document_id") == document_id,
            "rule_matches": (F.col("uploaded_doc") == document_id)
            | (F.col("matched_doc") == document_id),
            "graph_edges": (F.col("source_doc_id") == document_id)
            | (F.col("target_doc_id") == document_id),
        }
        for tbl, pred in preds.items():
            t = self.read_table(tbl)
            n = t.filter(pred).count()
            deleted[tbl] = n
            if n:
                self._replace(tbl, t.filter(~pred))
        self._audit_row(
            "127.0.0.1",
            "FORGET",
            f"document {document_id} erased"
            f" ({sum(deleted.values())} rows across {len(preds)} tables)",
            "",
        )
        return deleted

    def _embed_query(self, query: str):
        from the_hive_spark.functions.embedding import mock_embedding_np

        if self.embedding_provider == "bow":
            return bow_embedding_np(query, self.embedding_dim)
        return mock_embedding_np(query, self.embedding_dim)

    # ------------------------------------------------------------- helpers

    def _next_id(self, name: str) -> int:
        t = self.read_table(name)
        row = t.agg(F.max("id").alias("m")).collect()[0]
        return (row["m"] or 0) + 1

    def _audit(self, rows: DataFrame) -> None:
        base = self._next_id("audit_logs")
        out = rows.select(
            (F.lit(base) + F.row_number().over(_order_all("details")) - 1).alias("id"),
            F.current_timestamp().alias("timestamp"),
            "client_ip",
            "action",
            "details",
            "organization_id",
        )
        self._append("audit_logs", out)

    def _audit_row(
        self, client_ip: str, action: str, details: str, organization_id: str
    ) -> None:
        self._audit(
            self.spark.createDataFrame(
                [(client_ip, action, details, organization_id)],
                "client_ip string, action string, details string, organization_id string",
            )
        )


def _restrict_to_ids(
    df: DataFrame, col: str, ids: list[str] | DataFrame | None
) -> DataFrame:
    """Restrict ``df`` to rows whose ``col`` is in ``ids``.

    List form → ``isin`` literal (explicit API arguments, tiny by
    nature). DataFrame form → LEFT SEMI join on the ids' single
    column — the scalable path for per-batch row sets: ids never
    leave the cluster, AQE broadcasts the small side at runtime."""
    if ids is None:
        return df
    if isinstance(ids, DataFrame):
        # no distinct(): LEFT SEMI already emits each left row at most
        # once whatever the right side's duplication — a pre-distinct
        # is a whole extra shuffle per micro-batch for nothing
        (id_col,) = ids.columns
        return df.join(
            ids.withColumnRenamed(id_col, col),
            on=col,
            how="left_semi",
        )
    return df.filter(F.col(col).isin(ids))


def _order_all(col: str):
    """Single-partition ordering window — ONLY for inputs that are
    bounded by construction (single audit rows, trigger-bounded
    micro-batches). Bulk paths use functions.ids.dense_sequential_ids
    instead, which numbers rows without a single-partition stage."""
    from pyspark.sql import Window

    return Window.orderBy(col)
