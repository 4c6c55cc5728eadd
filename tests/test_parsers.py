"""Parser tests (S5-S11): each format's extraction behavior, the
dispatcher routing, and the pandas-UDF path through Spark."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.docgen import make_docx, make_eml, make_pdf, make_xlsx
from the_hive_spark.sources import parsers
from the_hive_spark.sources.dispatch import (
    is_supported_file,
    is_temporary_file,
    parse_bytes,
    parse_file_udf,
)


def test_parse_text_roundtrip():
    assert parsers.parse_text("héllo\nworld".encode()) == "héllo\nworld"


def test_parse_html_strips_script_style():
    html = b"""<html><head><style>body{color:red}</style>
    <script>alert('x')</script></head>
    <body><h1>Title</h1><p>Body text</p><noscript>NO JS</noscript></body></html>"""
    text = parsers.parse_html(html)
    assert "Title" in text and "Body text" in text
    assert "alert" not in text and "color:red" not in text and "NO JS" not in text


def test_parse_html_nested_skip_tags():
    html = b"<div><script>var a = '<b>not text</b>';</script>kept</div>"
    assert "kept" in parsers.parse_html(html)
    assert "not text" not in parsers.parse_html(html)


def test_parse_eml_header_block():
    eml = make_eml(
        subject="Q3 pricing update",
        sender_name="Alice Smith",
        sender_addr="alice@example.com",
        date_rfc2822="Tue, 05 Aug 2025 10:30:00 +0000",
        body="The confidential pricing sheet is attached.",
    )
    text = parsers.parse_eml(eml)
    lines = text.split("\n")
    assert lines[0] == "Subject: Q3 pricing update"
    assert lines[1] == "Sender: Alice Smith <alice@example.com>"
    assert lines[2].startswith("Date: 2025-08-05T10:30:00")
    assert "confidential pricing sheet" in text


def test_parse_docx_paragraphs():
    data = make_docx(["Project Alpha report", "Second paragraph here"])
    text = parsers.parse_docx(data)
    assert text == "Project Alpha report\nSecond paragraph here"


def test_parse_xlsx_markdownification():
    data = make_xlsx(
        {
            "Budget": [
                ["Item", "Cost", "Qty"],
                ["Widget", 9.5, 3],
                ["", "", ""],  # fully empty row → skipped
                ["Gadget", 12, ""],  # empty cell skipped
            ],
            "Notes": [["Note"], ["Check supplier"]],
        }
    )
    text = parsers.parse_xlsx(data)
    assert text.startswith("Sheet: Budget\n")
    assert "Row 2: Item: Widget, Cost: 9.5, Qty: 3" in text
    assert "Row 4: Item: Gadget, Cost: 12" in text
    assert "Row 3" not in text  # empty row produces no line
    assert "\n\nSheet: Notes\nRow 2: Note: Check supplier" in text


def test_parse_xlsx_column_fallback_header():
    data = make_xlsx({"S": [["Name", " "], ["bob", "extra"]]})
    # whitespace-only header cell → "Column 2" fallback (excel.go:63-66)
    text = parsers.parse_xlsx(data)
    assert "Row 2: Name: bob, Column 2: extra" in text


@pytest.mark.parametrize("compress", [True, False])
def test_parse_pdf_minimal(compress):
    data = make_pdf(["Hello PDF world", "Line two"], compress=compress)
    text = parsers.parse_pdf(data)
    assert "Hello PDF world" in text
    assert "Line two" in text


def test_dispatch_routing_and_guards():
    assert parse_bytes("/x/a.md", b"plain") == "plain"
    with pytest.raises(ValueError, match="unsupported"):
        parse_bytes("/x/a.zip", b"")
    assert is_supported_file("a/b/report.PDF")
    assert not is_supported_file("a/b/archive.tar.gz")
    assert is_temporary_file("~$doc.docx")
    assert is_temporary_file("._shadow.txt")
    assert is_temporary_file("upload.tmp")
    assert not is_temporary_file("normal.txt")


def test_parse_file_udf_spark_path(spark):
    rows = [
        ("/in/alpha.md", bytearray(b"Project Alpha confidential report")),
        ("/in/report.docx", bytearray(make_docx(["Beta status: green"]))),
        ("/in/mail.eml", bytearray(make_eml("Hi", "Bo", "bo@x.com",
                                            "Mon, 04 Aug 2025 09:00:00 +0000", "body"))),
        ("/in/broken.docx", bytearray(b"not a zip at all")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {
        r["path"]: r["text"]
        for r in df.select("path", parse_file_udf("path", "content").alias("text")).collect()
    }
    assert out["/in/alpha.md"] == "Project Alpha confidential report"
    assert out["/in/report.docx"] == "Beta status: green"
    assert out["/in/mail.eml"].startswith("Subject: Hi")
    assert out["/in/broken.docx"] is None  # parse failure → null, not job failure


# ---------------------------------------------------------------- JSONL


def test_jsonl_corpus_roundtrip(spark, tmp_path):
    """read_jsonl_corpus normalizes a JSONL dump into the documents
    schema; write_jsonl_shards exports with a pinned shard count; the
    roundtrip preserves content."""
    import json

    from the_hive_spark.sources.jsonl import (
        read_jsonl_corpus,
        write_jsonl_shards,
    )

    src = tmp_path / "dump.jsonl"
    rows = [
        {"text": "alpha document body", "lang": "en", "extra": 1},
        {"text": "beta body", "lang": "de"},
        {"text": ""},            # empty text: dropped (P12 guard)
        {"lang": "fr"},          # missing text: dropped
        {"text": "alpha document body", "lang": "en"},  # exact dup
    ]
    src.write_text("\n".join(json.dumps(r) for r in rows))

    docs = read_jsonl_corpus(spark, str(src), lang_field="lang")
    got = docs.collect()
    assert len(got) == 3  # two valid uniques + one exact dup row
    assert set(docs.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r["n_chars"] == len(r["text"]) for r in got)
    # md5-derived ids: identical text ⇒ identical id (exact-dedup
    # semantic at the boundary), distinct text ⇒ distinct id
    ids = {}
    for r in got:
        ids.setdefault(r["text"], set()).add(r["doc_id"])
    assert all(len(v) == 1 for v in ids.values())
    assert len({next(iter(v)) for v in ids.values()}) == len(ids)

    out = tmp_path / "shards"
    write_jsonl_shards(docs, str(out), n_shards=2)
    import glob

    parts = glob.glob(str(out / "part-*"))
    assert len(parts) == 2
    back = spark.read.json(str(out))
    assert back.count() == 3
    assert {r["text"] for r in back.collect()} == {
        "alpha document body", "beta body",
    }


def test_jsonl_explicit_id_field(spark, tmp_path):
    import json

    from the_hive_spark.sources.jsonl import read_jsonl_corpus

    src = tmp_path / "d.jsonl"
    src.write_text(
        "\n".join(
            json.dumps({"text": f"doc {i}", "my_id": i}) for i in range(5)
        )
    )
    docs = read_jsonl_corpus(spark, str(src), id_field="my_id")
    assert sorted(r["doc_id"] for r in docs.collect()) == [0, 1, 2, 3, 4]


def test_jsonl_stream_equals_batch(spark, tmp_path):
    """stream_jsonl_corpus(availableNow) must emit exactly the batch
    reader's rows — parity by shared normalization."""
    import json

    from the_hive_spark.sources.jsonl import (
        read_jsonl_corpus,
        stream_jsonl_corpus,
    )

    src = tmp_path / "drop"
    src.mkdir()
    for shard in range(2):
        (src / f"s{shard}.jsonl").write_text(
            "\n".join(
                json.dumps({"text": f"shard {shard} doc {i}", "lang": "en"})
                for i in range(10)
            )
        )
    batch = read_jsonl_corpus(spark, str(src), lang_field="lang")
    stream = stream_jsonl_corpus(spark, str(src), lang_field="lang")
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_stream_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM jsonl_stream_test ORDER BY doc_id"
    ).collect()
    want = batch.orderBy("doc_id").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 20


def test_jsonl_id_field_null_falls_back_to_derived(spark, tmp_path):
    """Rows missing the declared id field (or carrying a value the
    BIGINT schema nulls out) must get the md5-derived id, never a NULL
    doc_id that silently drops from downstream joins."""
    import json

    from the_hive_spark.sources.jsonl import read_jsonl_corpus

    src = tmp_path / "d.jsonl"
    src.write_text(
        "\n".join([
            json.dumps({"text": "has id", "my_id": 42}),
            json.dumps({"text": "missing id"}),
            json.dumps({"text": "bad id", "my_id": "not-a-number"}),
        ])
    )
    rows = read_jsonl_corpus(spark, str(src), id_field="my_id").collect()
    assert len(rows) == 3
    assert all(r["doc_id"] is not None for r in rows)
    by_text = {r["text"]: r["doc_id"] for r in rows}
    assert by_text["has id"] == 42
