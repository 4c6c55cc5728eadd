"""Unit tests for the deterministic function layer: chunkers (the
reference's chunker_test.go invariants), mock embedder, UUIDv5 ids."""

from __future__ import annotations

import uuid

import numpy as np
import pyspark.sql.functions as F
import pytest

from the_hive_spark.functions.chunkers import (
    SENTENCE_OVERLAP,
    SENTENCE_SIZE,
    chunk_fixed_expr,
    chunk_sentence_py,
    chunk_sentence_udf,
)
from the_hive_spark.functions.embedding import fnv32a, mock_embedding_np
from the_hive_spark.functions.ids import uuid5_chunk_id

LONG_TEXT = (
    "The quick brown fox jumps over the lazy dog. "
    "Pack my box with five dozen liquor jugs! "
    "How vexingly quick daft zebras jump? "
) * 40  # ~5000 chars


# --- chunker invariants (internal/processor/chunker_test.go:10-158) ---


def test_short_text_single_chunk():
    assert chunk_sentence_py("short text") == ["short text"]


def test_empty_text_no_chunks():
    assert chunk_sentence_py("") == []


def test_long_text_multiple_chunks_with_bounded_total():
    chunks = chunk_sentence_py(LONG_TEXT)
    assert len(chunks) >= 2
    total = sum(len(c) for c in chunks)
    # strip() can only shrink; overlap duplicates ≤ overlap*(n-1) chars
    assert total <= len(LONG_TEXT) + SENTENCE_OVERLAP * (len(chunks) - 1)
    assert all(len(c) <= SENTENCE_SIZE for c in chunks)


def test_consecutive_chunks_overlap():
    chunks = chunk_sentence_py(LONG_TEXT)
    joined = LONG_TEXT
    for a, b in zip(chunks, chunks[1:]):
        # the head of b must occur inside the source after a's start —
        # i.e. the windows advance but share content
        assert b[:20] in joined


def test_most_chunks_end_at_sentence_boundary():
    chunks = chunk_sentence_py(LONG_TEXT)
    boundary_ends = sum(1 for c in chunks[:-1] if c.rstrip()[-1:] in ".!?")
    assert boundary_ends >= len(chunks[:-1]) * 0.5


def test_fixed_chunker_expr_matches_python(spark):
    df = spark.createDataFrame([(LONG_TEXT,)], "text string")
    arr = df.select(chunk_fixed_expr("text", 1000, 200).alias("c")).collect()[0]["c"]
    # python reference of F1: windows of 1000 advancing 800
    expected = [LONG_TEXT[s : s + 1000] for s in range(0, len(LONG_TEXT), 800)]
    assert arr == expected


def test_sentence_udf_matches_python(spark):
    texts = ["", "short one.", LONG_TEXT]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["c"] for r in df.select(chunk_sentence_udf("text").alias("c")).collect()]
    assert got == [chunk_sentence_py(t) for t in texts]


# --- mock embedder (internal/embeddings/mock.go:28-58 formula) ---


def test_fnv32a_known_vectors():
    # published FNV-1a 32-bit test vectors
    assert fnv32a("") == 0x811C9DC5
    assert fnv32a("a") == 0xE40C292C
    assert fnv32a("foobar") == 0xBF9CF968


def test_mock_embedding_formula_and_norm():
    v = mock_embedding_np("hello world", dim=384)
    assert v.shape == (384,)
    assert v.dtype == np.float32
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    # spot-check the sin formula pre-normalization
    seed = fnv32a("hello world")
    raw = np.sin(seed * np.arange(1, 385) * 0.1)
    expected = (raw / np.linalg.norm(raw)).astype(np.float32)
    np.testing.assert_allclose(v, expected, rtol=1e-6)


def test_mock_embedder_udf_matches_reference(spark):
    from the_hive_spark.functions.embedding import make_mock_embedder

    texts = ["alpha", "beta", "alpha"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(make_mock_embedder(64)(F.col("text")).alias("e")).collect()
    got = [np.array(r["e"], dtype=np.float32) for r in rows]
    for t, g in zip(texts, got):
        np.testing.assert_allclose(g, mock_embedding_np(t, 64), rtol=1e-5)
    np.testing.assert_array_equal(got[0], got[2])  # deterministic


# --- UUIDv5 ids (F3: ingest_handler.go:113-114) ---


def test_uuid5_chunk_id_bit_identical(spark):
    df = spark.createDataFrame(
        [("/watch/a.md", 0), ("/watch/a.md", 1), ("/x/b.txt", 7)],
        "path string, idx int",
    )
    got = [
        r["id"]
        for r in df.select(
            uuid5_chunk_id(F.col("path"), F.col("idx")).alias("id")
        ).collect()
    ]
    expected = [
        str(uuid.uuid5(uuid.NAMESPACE_URL, "/watch/a.md-0")),
        str(uuid.uuid5(uuid.NAMESPACE_URL, "/watch/a.md-1")),
        str(uuid.uuid5(uuid.NAMESPACE_URL, "/x/b.txt-7")),
    ]
    assert got == expected


def test_detect_language_samples(spark):
    from the_hive_spark.functions.langid import detect_language

    samples = [
        ("en", "the cat sat on the mat and it was happy with the sun"),
        ("de", "der hund und die katze sind nicht auf dem tisch für immer"),
        ("fr", "le chat est sur la table et il ne mange pas dans la maison"),
        ("es", "el perro y el gato no se ven en la casa para siempre"),
        ("und", "zzz qqq xxx yyy www vvv"),
        ("und", ""),
    ]
    df = spark.createDataFrame(samples, "expected string, text string")
    got = df.select("expected", detect_language("text").alias("lang")).collect()
    for r in got:
        assert r["lang"] == r["expected"], f"{r['expected']}: got {r['lang']}"


def test_dense_sequential_ids(spark):
    """Scalable AUTOINCREMENT parity: dense, base-offset, assigned in
    order-column order, no single-partition stage (functions/ids.py)."""
    import pyspark.sql.functions as F

    from the_hive_spark.functions.ids import dense_sequential_ids

    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.rand(7).alias("x")
    ).repartition(16)
    rows = dense_sequential_ids(df, "k", base=100).orderBy("k").collect()
    assert [r["id"] for r in rows] == list(range(100, 100 + len(rows)))
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks)


def test_dense_sequential_ids_compound_order(spark):
    """Multi-column order key: ranks follow the (k1, k2) total order
    exactly, matching a single-partition ROW_NUMBER."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from the_hive_spark.functions.ids import dense_sequential_ids

    df = spark.range(0, 3000).select(
        (F.col("id") % 40).alias("k1"),
        (F.col("id") * 17 % 3000).alias("k2"),
    ).repartition(16)
    got = dense_sequential_ids(df, ["k1", "k2"], id_col="r")
    ref = df.withColumn("r_ref", F.row_number().over(Window.orderBy("k1", "k2")))
    joined = got.join(ref, ["k1", "k2"]).collect()
    assert len(joined) == 3000
    for row in joined:
        assert row["r"] == row["r_ref"], (row["k1"], row["k2"])


def test_ntile_from_rank_matches_ntile(spark):
    """Integer NTILE arithmetic over an exact rank must reproduce
    F.ntile for every (n, k) shape incl. n < k, n % k != 0."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from the_hive_spark.functions.ids import ntile_from_rank

    for n, k in [(1, 5), (4, 5), (5, 5), (7, 5), (100, 7), (3, 10)]:
        df = spark.range(1, n + 1).select(F.col("id").alias("rank"))
        got = df.select(
            "rank", ntile_from_rank("rank", n, k).alias("t")
        )
        ref = df.select(
            "rank", F.ntile(k).over(Window.orderBy("rank")).cast("bigint").alias("t_ref")
        )
        rows = got.join(ref, "rank").collect()
        assert len(rows) == n
        for r in rows:
            assert r["t"] == r["t_ref"], (n, k, r["rank"], r["t"], r["t_ref"])


def test_distributed_prefix_sum(spark):
    """Exclusive running sum matches the single-partition window form
    and never funnels through one partition (functions/ids.py)."""
    import pyspark.sql.functions as F

    from the_hive_spark.functions.ids import distributed_prefix_sum

    df = spark.range(0, 4000).select(
        (F.col("id") * 13 % 4000).alias("k"),
        (F.col("id") % 7 + 1).alias("v"),
    ).repartition(16)
    rows = distributed_prefix_sum(df, "k", "v", out_col="p").orderBy("k").collect()
    acc = 0
    for r in rows:
        assert r["p"] == acc, (r["k"], r["p"], acc)
        acc += r["v"]
    # empty input: no rows, no crash
    empty = df.filter(F.col("k") < 0)
    assert distributed_prefix_sum(empty, "k", "v").count() == 0


def test_embedder_factory_selection(spark, monkeypatch):
    """U1 provider factory: explicit arg wins, env selects otherwise,
    deterministic default is bow; unknown providers fail fast."""
    import pytest

    from the_hive_spark.functions import embedding as E

    assert E.make_embedder("mock") is not None
    monkeypatch.setenv("HIVE_SPARK_EMBED_PROVIDER", "mock")
    assert E.make_embedder() is not None  # env-selected, no error
    monkeypatch.delenv("HIVE_SPARK_EMBED_PROVIDER")
    with pytest.raises(ValueError, match="unknown embedding provider"):
        E.make_embedder("qdrant9000")
    with pytest.raises(ValueError, match="endpoint"):
        E.make_embedder("openai")  # network provider without endpoint


def test_http_embedder_with_stub_transport(spark):
    """Real-provider seam: the batched HTTP UDF posts one request per
    Arrow batch (OpenAI EmbedBatch shape, openai.go:63) and maps the
    response vectors back positionally; nulls get the F6 zero vector."""
    import numpy as np
    import pyspark.sql.functions as F

    from the_hive_spark.functions.embedding import make_http_embedder

    def stub(url, payload):
        # runs inside the executor's python worker: prove the request
        # shape through the returned vectors (no shared driver state)
        assert url == "http://localhost:0/v1/embeddings"
        assert payload["model"] == "m"
        assert None not in payload["input"]  # nulls never reach the wire
        return {
            "data": [
                {"embedding": [float(len(t))] * 8} for t in payload["input"]
            ]
        }

    udf = make_http_embedder("http://localhost:0/v1/embeddings", "m", 8,
                             transport=stub)
    df = spark.createDataFrame(
        [("ab",), ("wxyz",), (None,)], "text string"
    ).repartition(1)
    rows = df.select("text", udf(F.col("text")).alias("v")).collect()
    by_text = {r["text"]: r["v"] for r in rows}
    assert by_text["ab"] == [2.0] * 8
    assert by_text["wxyz"] == [4.0] * 8
    assert by_text[None] == [0.0] * 8  # zero-vector fallback, no HTTP call


def test_http_embedder_rejects_bad_dim(spark):
    import pytest
    import pyspark.sql.functions as F

    from the_hive_spark.functions.embedding import make_http_embedder

    def bad_stub(url, payload):
        return {"data": [{"embedding": [1.0, 2.0]} for _ in payload["input"]]}

    udf = make_http_embedder("http://x", "m", 8, transport=bad_stub)
    df = spark.createDataFrame([("a",)], "text string")
    with pytest.raises(Exception, match="dim"):
        df.select(udf(F.col("text"))).collect()


def test_zorder2_matches_reference_interleave(spark):
    """zorder2 must equal the classic python bit-interleave, be
    monotone in each coordinate with the other fixed, and cluster
    2-D-close pairs better than a 1-D sort (functions/zorder.py)."""
    import pyspark.sql.functions as F

    from the_hive_spark.functions.zorder import zorder2

    def ref_morton(a: int, b: int) -> int:
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    vals = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 1), (2**31 - 1, 7),
            (123456789, 987654321), (2**31 - 1, 2**31 - 1)]
    df = spark.createDataFrame(vals, "a long, b long")
    got = df.select("a", "b", zorder2(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == ref_morton(r["a"], r["b"]), (r["a"], r["b"])
        assert r["z"] >= 0  # stays positive int64

    # monotone in a for fixed b (Z-curve property along one axis)
    seq = spark.range(0, 1000).select(
        F.col("id").alias("a"), F.lit(42).alias("b")
    )
    zs = [r["z"] for r in seq.select(
        zorder2(F.col("a"), F.col("b")).alias("z")).orderBy("z").collect()]
    assert zs == sorted(zs) and len(set(zs)) == 1000


def test_distributed_prefix_sum_composite_key_huge_ids(spark):
    """Composite (group, id) order with ids far beyond any fixed shift
    width (~9e12, the sf1 replica-offset regime): the multi-column
    range partition must order (group ASC, id ASC) exactly — the r5
    sf1 sweep caught a packed group*2^40+id key silently interleaving
    groups once ids outgrew the shift."""
    import random

    from the_hive_spark.functions.ids import distributed_prefix_sum

    rng = random.Random(7)
    rows = [
        (k, i * 1_000_000_000_000 + rng.randrange(10**9), rng.randrange(100))
        for k in range(3)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp int, id long, v long")
    got = {
        (r["grp"], r["id"]): r["p"]
        for r in distributed_prefix_sum(df, ["grp", "id"], "v", out_col="p").collect()
    }
    acc = 0
    for grp, id_, v in sorted(rows):
        assert got[(grp, id_)] == acc, (grp, id_)
        acc += v
