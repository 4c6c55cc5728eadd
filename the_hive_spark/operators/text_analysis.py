"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline text surface: chunking (the reference's F1
fixed-window chunker, internal/parser/chunker.go:16-52, generalized to
any size/overlap), token/quality metrics, language profiling, and
w-shingling fingerprints. Everything here is pure built-in column
expressions — JVM-side, whole-stage-codegen'd, no Python in the hot
path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table

CHUNK_SIZE = 120
CHUNK_OVERLAP = 20
CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """F1 fixed-window chunker as a generator expression (1 row → N).

    Ref parity (internal/parser/chunker.go:16-52): windows of ``size``
    chars advancing by ``size - overlap``; last chunk may be short;
    empty text yields no chunks. Implemented as posexplode over a
    computed substring array — a JVM UDTF, no Python.
    """
    step = size - overlap
    n_chunks = f"cast(floor((length({text_col}) - 1) / {step}) as int) + 1"
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, {n_chunks}),"
                    f" i -> substring({text_col}, (i - 1) * {step} + 1, {size}))"
                )
            ).alias("chunk_index", "content"),
        )
        .withColumn(
            "chunk_id",
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("-"),
                    F.col("chunk_index").cast("string"),
                )
            ),
        )
        .withColumn("chunk_len", F.length("content"))
    )


def _docs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread to cluster parallelism — the chunk explode
    multiplies per-row cost by n_chunks, a fan-out stage that must not
    run at input-file-split parallelism (the table arrives as one
    small parquet split)."""
    n = spark.sparkContext.defaultParallelism
    return table(spark, sf_dir, "documents").repartition(n, "doc_id")


@query(
    "doc_chunks",
    oracle=f"""
WITH exploded AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(floor((length(text) - 1) / {CHUNK_STEP}) AS INTEGER) + 1)) AS chunk_index
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, chunk_index,
       md5(concat(CAST(doc_id AS VARCHAR), '-', CAST(chunk_index AS VARCHAR))) AS chunk_id,
       substring(text, chunk_index * {CHUNK_STEP} + 1, {CHUNK_SIZE}) AS content,
       length(substring(text, chunk_index * {CHUNK_STEP} + 1, {CHUNK_SIZE})) AS chunk_len
FROM exploded
""",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into 120-char windows with 20 overlap.

    chunk_id is the deterministic digest of (doc_id, chunk_index) —
    the F3 idempotent-id scheme (UUIDv5 exact form lives in
    functions.ids; the digest here keeps the oracle portable).
    """
    return chunk_fixed(_docs_parallel(spark, sf_dir))


@query(
    "doc_chunk_stats",
    oracle=f"""
WITH exploded AS (
  SELECT doc_id,
         unnest(range(0, CAST(floor((length(text) - 1) / {CHUNK_STEP}) AS INTEGER) + 1)) AS chunk_index,
         text
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(length(substring(text, chunk_index * {CHUNK_STEP} + 1, {CHUNK_SIZE}))) AS BIGINT) AS total_chunk_chars
FROM exploded GROUP BY doc_id
""",
)
def doc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document chunk tally (A3 ingest-tally parity)."""
    return chunk_fixed(_docs_parallel(spark, sf_dir)).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_len").cast("bigint").alias("total_chunk_chars"),
    )


@query(
    "doc_token_stats",
    oracle="""
SELECT doc_id, n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_uniq_tokens AS BIGINT) AS n_uniq_tokens,
       CAST(FLOOR(1000000.0 * n_uniq_tokens / n_tokens + 0.5) AS BIGINT) AS ttr_ppm,
       CAST(FLOOR((n_chars - n_tokens + 1.0) / n_tokens + 0.5) AS BIGINT) AS avg_token_len
FROM (
  SELECT doc_id, n_chars,
         len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens,
         len(list_distinct(list_filter(string_split(text, ' '), t -> length(t) > 0))) AS n_uniq_tokens
  FROM documents WHERE length(text) > 0
)
""",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + type-token-ratio quality signal per document.

    Whitespace tokenization via split + filter — all JVM expressions;
    ttr_ppm (unique/total) is the dedup-adjacent quality score.
    """
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.expr("filter(split(text, ' '), t -> length(t) > 0)")
    stats = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
    )
    return stats.select(
        "doc_id",
        "n_chars",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_uniq_tokens").cast("bigint").alias("n_uniq_tokens"),
        F.floor(1000000.0 * F.col("n_uniq_tokens") / F.col("n_tokens") + F.lit(0.5))
        .cast("bigint")
        .alias("ttr_ppm"),
        F.floor(
            (F.col("n_chars") - F.col("n_tokens") + 1.0) / F.col("n_tokens") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("avg_token_len"),
    )


@query(
    "doc_lang_profile",
    oracle="""
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(FLOOR(SUM(n_chars) * 1.0 / COUNT(*) + 0.5) AS BIGINT) AS avg_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
FROM documents
GROUP BY lang, source
""",
)
def doc_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language/source profile (language-ID rollup surface).

    The declared ``lang`` column stands in for detected language; the
    heuristic n-gram detector itself is functions/langid.py (non-SQL,
    covered by unit tests)."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.floor(F.sum("n_chars") * 1.0 / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("avg_chars"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
    )


@query(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       list_min(list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                               i -> md5(substring(text, i, 8)))) AS fingerprint
FROM documents
WHERE length(text) >= 8
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: min digest over 8-gram
    windows (single linear scan per doc). Repartitioned before the
    per-gram md5 fold — the fan-out-stage convention — so the CPU cost
    runs at cluster parallelism rather than the file layout's split
    count (a single-row-group input otherwise serializes the whole
    digest pass onto one task)."""
    n = spark.sparkContext.defaultParallelism
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 8)
        .repartition(n)
    )
    return docs.select(
        "doc_id",
        F.expr(
            "array_min(transform(sequence(1, greatest(length(text) - 7, 1)),"
            " i -> md5(substring(text, i, 8))))"
        ).alias("fingerprint"),
    )


# DuckDB rendition of functions/langid.py's token expression
_LANGID_TOKS_DUCK = (
    "list_filter(string_split_regex(lower(text), '[^a-zA-Zäöüéèêàç]+'),"
    " t -> length(t) > 0)"
)


def _langid_oracle() -> str:
    from the_hive_spark.functions.langid import MIN_HITS_PPM, STOPWORD_PROFILES

    hit_cols = []
    for lang in sorted(STOPWORD_PROFILES):
        arr = ", ".join(f"'{w}'" for w in STOPWORD_PROFILES[lang])
        hit_cols.append(
            f"CAST(FLOOR(1000000.0 * len(list_filter(toks,"
            f" t -> list_contains([{arr}], t))) / greatest(len(toks), 1))"
            f" AS BIGINT) AS {lang}_ppm"
        )
    langs = sorted(STOPWORD_PROFILES)
    g = "greatest(" + ", ".join(f"{lang}_ppm" for lang in langs) + ")"
    case = f"CASE WHEN {g} < {MIN_HITS_PPM} THEN 'und' "
    for lang in langs[:-1]:
        case += f"WHEN {lang}_ppm = {g} THEN '{lang}' "
    case += f"ELSE '{langs[-1]}' END"
    return f"""
WITH tok AS (
  SELECT doc_id, {_LANGID_TOKS_DUCK} AS toks FROM documents
), scored AS (
  SELECT doc_id, {", ".join(hit_cols)} FROM tok
)
SELECT doc_id, {case} AS detected_lang FROM scored
"""


@query("doc_langid", oracle=_langid_oracle())
def doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (functions/langid.py): stopword-profile
    hit rates per language, argmax with an alphabetical tie-break and
    an 'und' confidence floor. Pure JVM expressions — a linear scan,
    no shuffle, no Python; the tokenizer materializes into a column
    once so the regex split runs once per row, not once per language.

    Materialized once per corpus snapshot (functions/matstore.py):
    detector output is a derived per-doc column that the language
    audit and the curation funnel both read — a curation pipeline
    stamps it onto the corpus once, not once per report."""
    from the_hive_spark.functions.matstore import materialized

    return materialized(
        spark, ("doc_langid", sf_dir), lambda: _langid_build(spark, sf_dir)
    )


def _langid_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from the_hive_spark.functions.langid import (
        detect_language_from_tokens,
        tokens_expr,
    )

    # repartition before the detector expressions (fan-out convention):
    # the regex tokenize + per-language membership scans are the cost,
    # and must not run at the file layout's split count
    n = spark.sparkContext.defaultParallelism
    docs = table(spark, sf_dir, "documents").repartition(n)
    return docs.withColumn("__toks", tokens_expr("text")).select(
        "doc_id", detect_language_from_tokens("__toks").alias("detected_lang")
    )


_QUALITY_PUNCT = r"[.,!?;:]"
_QUALITY_ALPHA = r"[a-zA-Z]"


@query(
    "doc_quality_score",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens,
         length(text) - length(regexp_replace(text, '{_QUALITY_PUNCT}', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '{_QUALITY_ALPHA}', '', 'g')) AS n_alpha,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t))) AS n_stop
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(FLOOR(1000000.0 * n_punct / n_chars + 0.5) AS BIGINT) AS punct_ppm,
       CAST(FLOOR(1000000.0 * n_alpha / n_chars + 0.5) AS BIGINT) AS alpha_ppm,
       CAST(FLOOR(1000000.0 * n_stop / greatest(n_tokens, 1) + 0.5) AS BIGINT) AS stopword_ppm,
       CAST(FLOOR((n_chars - n_tokens + 1.0) / greatest(n_tokens, 1) + 0.5) AS BIGINT) AS mean_word_len,
       (n_chars >= 50 AND n_tokens >= 10
        AND (n_chars - n_tokens + 1.0) / greatest(n_tokens, 1) BETWEEN 2 AND 12) AS passes_quality
FROM m
""",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality heuristics per document: punctuation /
    alphabetic / stopword ratios, mean word length, and a composite
    pass flag (min length, min tokens, sane word-length band). All
    JVM column expressions over one scan; materialized once per corpus
    snapshot (matstore) — the quality gate feeds the filtered corpus,
    the near-dedup keep-best ranking, the training manifest AND the
    curation funnel, and is stamped once in a real pipeline."""
    from the_hive_spark.functions.matstore import materialized

    return materialized(
        spark,
        ("doc_quality_score", sf_dir),
        lambda: _quality_score_build(spark, sf_dir),
    )


def _quality_score_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.expr("filter(split(text, ' '), t -> length(t) > 0)")
    stop_arr = "'the','a','and','of','to','in','is','that','it','for'"
    m = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", _QUALITY_PUNCT, ""))
        ).alias("n_punct"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", _QUALITY_ALPHA, ""))
        ).alias("n_alpha"),
        F.expr(
            f"size(filter(split(lower(text), ' '),"
            f" t -> array_contains(array({stop_arr}), t)))"
        ).alias("n_stop"),
    )
    nt = F.greatest(F.col("n_tokens"), F.lit(1))
    mean_wl = (F.col("n_chars") - F.col("n_tokens") + 1.0) / nt
    return m.select(
        "doc_id",
        F.floor(1000000.0 * F.col("n_punct") / F.col("n_chars") + F.lit(0.5))
        .cast("bigint").alias("punct_ppm"),
        F.floor(1000000.0 * F.col("n_alpha") / F.col("n_chars") + F.lit(0.5))
        .cast("bigint").alias("alpha_ppm"),
        F.floor(1000000.0 * F.col("n_stop") / nt + F.lit(0.5))
        .cast("bigint").alias("stopword_ppm"),
        F.floor(mean_wl + F.lit(0.5)).cast("bigint").alias("mean_word_len"),
        (
            (F.col("n_chars") >= 50)
            & (F.col("n_tokens") >= 10)
            & (mean_wl >= 2)
            & (mean_wl <= 12)
        ).alias("passes_quality"),
    )


# GPT-2-style pre-tokenizer approximation: word runs, digit runs, or a
# single non-space symbol — the public BPE pre-split regex family.
# Explicit space in the class (not \s): backslash-escape handling in
# string literals differs between Spark and DuckDB, and the corpus is
# single-line space-separated text.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "doc_bpe_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_filter(regexp_extract_all(text, '{_BPE_RE}'),
                            t -> t ~ '^[0-9]+$')) AS BIGINT) AS n_numeric_tokens,
       CAST(len(list_filter(regexp_extract_all(text, '{_BPE_RE}'),
                            t -> t ~ '^[^A-Za-z0-9]$')) AS BIGINT) AS n_symbol_tokens
FROM documents WHERE length(text) > 0
""",
)
def doc_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: the pre-tokenizer split (letter runs /
    digit runs / single symbols) that upper-bounds real BPE token
    counts — the budgeting number a training pipeline tracks per doc.
    Repartitioned first so the pass runs at cluster parallelism, not
    the file layout's split count (fan-out-stage convention).

    COUNTS WITHOUT TOKENIZING: the three statistics are character
    arithmetic, so no token array is ever materialized. Two run-
    collapsing regexp_replace passes ([A-Za-z]+ → 'a', then [0-9]+ →
    '0') reduce the text to one marker char per token; the counts are
    then plain length/replace arithmetic — n_bpe = non-space chars of
    the collapsed form, n_numeric = its '0' count, n_symbol = the
    rest. Each history step was measured at sf10 (500 k docs): three
    inlined regexp_extract_all = 22.7 s; one shared extract_all + two
    per-token rlike filters = 19.0 s (allocation-bound: one string
    object per token, then a regex match per token); this collapsed
    form = two allocation-free regex scans + byte counting, no
    per-token work at all. The collapsed string sits in its own
    projection so CollapseProject cannot inline it into the four
    counts (a non-cheap producer referenced 4× is not inlined)."""
    n = spark.sparkContext.defaultParallelism
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n)
    )
    # marker chars are members of the classes they replace, so the
    # three classes (letter-run marker 'a', digit-run marker '0',
    # symbols, spaces) stay disjoint in the collapsed text
    collapsed = F.regexp_replace(
        F.regexp_replace("text", "[A-Za-z]+", "a"), "[0-9]+", "0"
    )
    c = F.col("collapsed")
    n_tok = F.length(F.replace(c, F.lit(" ")))
    n_num = F.length(c) - F.length(F.replace(c, F.lit("0")))
    n_alpha = F.length(c) - F.length(F.replace(c, F.lit("a")))
    return docs.select("doc_id", collapsed.alias("collapsed")).select(
        "doc_id",
        n_tok.cast("bigint").alias("n_bpe_tokens"),
        n_num.cast("bigint").alias("n_numeric_tokens"),
        (n_tok - n_num - n_alpha).cast("bigint").alias("n_symbol_tokens"),
    )


_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_LONGNUM_RE = "[0-9]{7,}"


@query(
    "doc_pii_redact",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_LONGNUM_RE}')) AS BIGINT) AS n_longnums,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_LONGNUM_RE}', '<NUM>', 'g')) AS redacted_md5
FROM documents WHERE length(text) > 0
""",
)
def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training-data pipeline
    runs before a corpus ships: emails and long digit runs (phone/ID
    shaped) replaced by typed placeholders, plus per-doc match tallies
    for scrub-rate monitoring. Pure JVM regexp (one codegen'd scan, no
    Python); the md5 of the redacted text makes the rewrite itself —
    not just the counts — oracle-checkable. Patterns are RE2/Java
    common-subset so both engines match identical spans."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    redacted = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
        _LONGNUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count("text", F.lit(_LONGNUM_RE))
        .cast("bigint")
        .alias("n_longnums"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "doc_top_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE length(text) > 0
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM toks WHERE length(term) > 0
GROUP BY term
ORDER BY term_freq DESC, term
LIMIT 50
""",
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-50 terms by collection frequency
    with document frequency — the TF/DF statistics a training-data
    pipeline feeds into stopword discovery and IDF weighting. The
    explode fans out ~|tokens| rows, so documents are spread to
    cluster parallelism first (same rule as the chunk queries); the
    groupBy is a map-side-combinable count whose shuffle carries one
    row per distinct term per partition, not per token. Top-50 is a
    TakeOrdered merge."""
    docs = _docs_parallel(spark, sf_dir).filter(F.length("text") > 0)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.length("term") > 0)
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("term_freq"),
            F.countDistinct("doc_id").cast("bigint").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("term"))
        .limit(50)
    )


@query(
    "doc_split_assignment",
    oracle="""
WITH assigned AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
           AS bucket
  FROM documents
)
SELECT lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM assigned
GROUP BY lang, split
""",
)
def doc_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) by hashing the
    document id — the reproducible-split idiom every training pipeline
    needs: assignment is a pure function of doc_id, so re-runs,
    retries, and different cluster sizes all agree, and no split state
    is stored anywhere. The md5-prefix bucket is computed identically
    in both engines; output is the per-(lang, split) census used to
    sanity-check stratification before shipping."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    assigned = docs.select(
        "lang",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


SAMPLE_HEX_LT = "1a"  # keep when first md5 byte < 0x1a → 26/256 ≈ 10.2%


@query(
    "doc_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE substring(md5(concat(lang, ':', source, ':', CAST(doc_id AS VARCHAR))), 1, 2)
      < '{SAMPLE_HEX_LT}'
""",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% stratified sample of the corpus — the
    reproducible-subset idiom for eval sets and ablations. The keep
    decision hashes (lang, source, doc_id) together, so each
    (lang, source) stratum gets an independent Bernoulli draw at the
    same rate (hashing doc_id alone would correlate samples across
    strata), and the assignment is a pure function of the row: re-runs,
    retries, and any cluster size agree with zero sampling state. The
    md5-prefix compare is string-ordered hex — identical in both
    engines. The predicate is a function of the row, so it can't reach
    parquet PushedFilters, but it evaluates inside the scan's codegen
    stage: unsampled rows die before any shuffle, and the output is
    ~10% of the corpus regardless of scale."""
    docs = table(spark, sf_dir, "documents")
    keep = (
        F.substring(
            F.md5(
                F.concat(
                    F.col("lang"),
                    F.lit(":"),
                    F.col("source"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            2,
        )
        < SAMPLE_HEX_LT
    )
    return docs.filter(keep).select("doc_id", "lang", "source", "n_chars")


PACK_BUDGET = 512  # tokens per packed training sequence


@query(
    "doc_pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM t
)
SELECT doc_id, n_tokens, CAST(prev // {PACK_BUDGET} AS BIGINT) AS bin_id
FROM c
""",
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: assign each document to a
    fixed-token-budget bin by its exclusive running token count in
    doc_id order (contiguous packing — deterministic, order-stable,
    and every bin except possibly the last is filled to ≥ budget once
    a doc crosses the boundary). The oracle's ``SUM() OVER (ORDER
    BY)`` is the single-partition funnel Spark must NOT run at scale;
    here the running sum comes from
    :func:`the_hive_spark.functions.ids.distributed_prefix_sum` —
    range-partition, per-partition window, O(partitions) offset
    collect — so the plan stays fully parallel."""
    from the_hive_spark.functions.ids import distributed_prefix_sum

    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    packed = distributed_prefix_sum(t, "doc_id", "n_tokens", out_col="prev")
    return packed.select(
        "doc_id",
        "n_tokens",
        F.expr(f"prev div {PACK_BUDGET}").cast("bigint").alias("bin_id"),
    )


BM25_TERMS = ("join", "filter", "scan")
BM25_K = 15


@query(
    "doc_bm25_topk",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tok_f AS (
  SELECT doc_id, token FROM tok WHERE length(token) > 0
), dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok_f GROUP BY doc_id
), gstats AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS big_t,
         CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS big_n
  FROM dl
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok_f WHERE token IN ('join', 'filter', 'scan')
  GROUP BY doc_id, token
), dfreq AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tf GROUP BY token
)
SELECT tf.doc_id,
       CAST(SUM(((big_n * 1000000) // dfreq.df) * 22 * big_t * tf.tf
            // (10 * big_t * tf.tf + 3 * big_t + 9 * dl.dl * big_n)) AS BIGINT) AS score
FROM tf
JOIN dfreq ON tf.token = dfreq.token
JOIN dl ON dl.doc_id = tf.doc_id
CROSS JOIN gstats
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id
LIMIT {BM25_K}
""",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword ranking (k1=1.2, b=0.75), top-15 docs for a fixed
    term set — the lexical-retrieval half of a hybrid search stack.

    All arithmetic is integer: the standard log-idf is replaced by the
    exact rational idf_ppm = N·10⁶ // df (log-free Robertson variant —
    same ordering for single-term weights, deterministic across
    engines), and the k1/b normalization is cross-multiplied so each
    term's score is one int64 division:
    ``idf_ppm · 22·T·tf // (10·T·tf + 3·T + 9·dl·N)`` with T = corpus
    token count, dl = doc length. Sums of integers are
    order-independent, so results hash identically on any partitioning.
    Plan shape (r11, guide §2.3/§2.4): the term set is a fixed small
    constant, so tf per term is a CONDITIONAL aggregate in the same
    one-pass groupBy that computes dl — before r11 the dl and tf
    branches each re-ran the full tokenize/explode (the repartition
    exchange was reused, but everything above it was evaluated once
    per consumer: the corpus was tokenized twice) and met again in a
    doc_id join. Now: explode once → ONE map-side-combined per-doc
    agg (exchange-free on top of the doc_id repartition) → one global
    agg broadcast back (df per term + T + N in a single row) → per-row
    integer expressions → TakeOrdered(k). 7 exchanges → 3, one
    tokenization pass instead of two, no per-term join. The per-term
    products stay < 2⁶³ up to ~10¹² corpus tokens; past that, rescale
    idf_ppm to idf_ppb or precompute dl/avgdl ratios."""
    docs = table(spark, sf_dir, "documents")
    n = spark.sparkContext.defaultParallelism
    tok = (
        docs.repartition(n, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
    )
    per_doc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        *[
            F.sum((F.col("token") == t).cast("bigint"))
            .cast("bigint")
            .alias(f"tf_{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    glob = per_doc.agg(
        F.sum("dl").cast("bigint").alias("big_t"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    ).crossJoin(docs.agg(F.count(F.lit(1)).cast("bigint").alias("big_n")))
    score = None
    for i in range(len(BM25_TERMS)):
        term = F.when(
            F.col(f"tf_{i}") > 0,
            F.expr(
                f"((big_n * 1000000) div df_{i}) * 22 * big_t * tf_{i}"
                f" div (10 * big_t * tf_{i} + 3 * big_t + 9 * dl * big_n)"
            ),
        ).otherwise(F.lit(0).cast("bigint"))
        score = term if score is None else (score + term)
    scored = (
        per_doc.filter(
            sum(
                (F.col(f"tf_{i}") > 0).cast("int")
                for i in range(len(BM25_TERMS))
            )
            > 0
        )
        .crossJoin(F.broadcast(glob))
        .select("doc_id", score.cast("bigint").alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_K)


@query(
    "doc_rebalance_sample",
    oracle="""
WITH counts AS (
  SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
), target AS (
  SELECT CAST(MIN(cnt) AS BIGINT) AS t FROM counts
), ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT doc_id, lang FROM ranked CROSS JOIN target WHERE rk <= t
""",
)
def doc_rebalance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-rebalancing downsample: every language stratum cut to the
    size of the SMALLEST one (the undersampling step before training
    on skewed corpora). Selection is a deterministic hash rank — docs
    ordered by md5(doc_id) within each stratum, doc_id tie-break — so
    the kept set is a pure function of the data: re-runs and engines
    agree, and the sample is unbiased w.r.t. any natural ordering of
    the table. One per-stratum window (hash shuffle on lang, fine as
    long as no single class outweighs an executor — salt the rank for
    pathological single-class skew) plus a 1-row broadcast of the
    target count."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    target = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").cast("bigint").alias("t"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "doc_id", "lang", F.row_number().over(w).alias("rk")
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rk") <= F.col("t"))
        .select("doc_id", "lang")
    )


@query(
    "doc_training_manifest",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens
  FROM documents WHERE length(text) > 0
), keep AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keep FROM documents GROUP BY md5(text)
), corpus AS (
  SELECT d.doc_id, d.lang,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
  FROM documents d
  JOIN keep c ON md5(d.text) = c.h AND d.doc_id = c.keep
  JOIN m ON m.doc_id = d.doc_id
  WHERE m.n_chars >= 50 AND m.n_tokens >= 10
    AND (m.n_chars - m.n_tokens + 1.0) / greatest(m.n_tokens, 1) BETWEEN 2 AND 12
), assigned AS (
  SELECT doc_id, lang, n_tokens,
         CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
              WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM corpus
), packed AS (
  SELECT doc_id, lang, n_tokens, split,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM assigned
)
SELECT doc_id, lang, split, n_tokens,
       CAST(prev // {PACK_BUDGET} AS BIGINT) AS bin_id
FROM packed
""",
)
def doc_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline as ONE query — the
    manifest a dataset build actually ships: exact-dedup
    canonicalization ∩ quality gate (doc_corpus_filtered), then the
    deterministic 80/10/10 hash split (doc_split_assignment's rule),
    then fixed-budget sequence packing WITHIN each split. Every stage
    is a pure function of the data, so the whole manifest is
    reproducible from scratch on any cluster shape.

    Packing runs as one distributed_prefix_sum PER split (the split
    domain is three literals) and unions the results — per-split
    running sums with no single-partition window anywhere, unlike the
    oracle's PARTITION BY split window, which funnels each split
    through one task."""
    from the_hive_spark.functions.ids import distributed_prefix_sum
    from the_hive_spark.operators.dedup import doc_corpus_filtered

    corpus = doc_corpus_filtered(spark, sf_dir).select("doc_id", "lang")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    # persisted: each split's prefix sum filters this once — without
    # the cache the THREE filters each re-run the dedup∩quality corpus
    # derivation from the raw scans (one fixed-width row per shipped
    # doc, MEMORY_AND_DISK at scale)
    from pyspark import StorageLevel

    assigned = (
        corpus.join(docs, "doc_id")
        .withColumn(
            "split",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    parts = [
        distributed_prefix_sum(
            assigned.filter(F.col("split") == s), "doc_id", "n_tokens", "prev"
        )
        for s in ("train", "val", "test")
    ]
    # distributed_prefix_sum localCheckpoints its input EAGERLY, so all
    # three splits have already been materialized off `assigned` by
    # here — release the cache now instead of leaking one persisted
    # copy per invocation (the checkpointed results are independent).
    assigned.unpersist()
    packed = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return packed.select(
        "doc_id",
        "lang",
        "split",
        "n_tokens",
        F.expr(f"prev div {PACK_BUDGET}").cast("bigint").alias("bin_id"),
    )


@query(
    "doc_token_weighted_sample",
    oracle="""
WITH mx AS (
  SELECT CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS mx FROM documents
), h AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000000 AS u
  FROM documents
)
SELECT doc_id, lang, n_tokens
FROM h CROSS JOIN mx
WHERE u * mx < n_tokens * 1000000
""",
)
def doc_token_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted (importance) sampling: each document kept with
    probability proportional to its token count, so the SAMPLE is
    uniform over TOKENS rather than documents — the correct unit when
    composing an LLM training mix (a 10-token doc should not count as
    much as a 10k-token doc). The Bernoulli draw is the md5-derived
    uniform u ∈ [0, 10⁶) compared by exact integer cross-
    multiplication (u·max_tokens < n_tokens·10⁶ — no float ratio, no
    rounding divergence), with max_tokens from a 1-row broadcast.
    Deterministic per doc_id: re-runs and engines agree exactly."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    mx = docs.agg(F.max(n_tokens).alias("mx"))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 1_000_000
    )
    h = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), u.alias("u")
    )
    return (
        h.crossJoin(F.broadcast(mx))
        .filter(F.col("u") * F.col("mx") < F.col("n_tokens") * 1_000_000)
        .select("doc_id", "lang", "n_tokens")
    )


@query(
    "doc_reservoir_sample",
    oracle="""
WITH r AS (
  SELECT doc_id, lang,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS rk
  FROM documents
)
SELECT doc_id, lang
FROM (SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rk, doc_id) AS rn
      FROM r)
WHERE rn <= 10
""",
)
def doc_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir: 10 documents per language,
    selected by ranking on an md5-derived uniform key — the
    distributed image of reservoir sampling (rank-by-random-key top-k
    is exactly Algorithm R's invariant), but rerun-stable and
    engine-agnostic because the "random" key is a content hash, not a
    PRNG. The fixed-k-per-group sample every corpus QA loop draws
    (eyeball k docs per language) without a global sort: the window
    partitions by stratum, so each group ranks independently in
    parallel.
    """
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    r = docs.select(
        "doc_id",
        "lang",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 16).alias("rk"),
    )
    w = Window.partitionBy("lang").orderBy("rk", "doc_id")
    return (
        r.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "lang")
    )


def _curriculum_oracle() -> str:
    # quality CTE reused from the registered operator above (same
    # module, already registered by the time this decorator runs)
    from the_hive_spark.registry import ORACLES

    quality_sql = ORACLES["doc_quality_score"]
    return f"""
WITH q AS ({quality_sql})
SELECT doc_id, alpha_ppm,
       CAST(NTILE(10) OVER (ORDER BY alpha_ppm, doc_id) AS BIGINT) AS shard
FROM q
"""


@query("doc_curriculum_shards", oracle=_curriculum_oracle())
def doc_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum sharding: order the corpus by a quality signal
    (alphabetic-character ratio — noisy text first, clean text last)
    and cut it into 10 equal shards, the "train on easy/noisy early,
    clean late" (or reverse) data-ordering knob of LLM curriculum
    schedules.

    Reuses the matstore-shared quality metrics; the decile is an EXACT
    distributed rank (functions/ids.py::dense_sequential_ids) folded
    through integer NTILE arithmetic (ids.ntile_from_rank) — no
    single-partition window, hash-identical to the oracle's NTILE.
    """
    from the_hive_spark.functions.ids import (
        dense_sequential_ids,
        ntile_from_rank,
    )

    q = doc_quality_score(spark, sf_dir).select("doc_id", "alpha_ppm")
    ranked = dense_sequential_ids(q, ["alpha_ppm", "doc_id"], id_col="_r")
    n = ranked.count()
    return ranked.select(
        "doc_id", "alpha_ppm", ntile_from_rank("_r", n, 10).alias("shard")
    )


@query(
    "doc_mix_weights",
    oracle="""
WITH lt AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '),
                                  t -> length(t) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
  HAVING SUM(len(list_filter(string_split(text, ' '),
                             t -> length(t) > 0))) > 0
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM lt
)
SELECT lang, n_docs, n_tokens,
       CAST(FLOOR(1000000.0 * n_tokens / t + 0.5) AS BIGINT) AS share_ppm,
       CAST(FLOOR(1000000.0 * t / (n_langs * n_tokens) + 0.5) AS BIGINT)
         AS weight_ppm
FROM lt CROSS JOIN tot
""",
)
def doc_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix reweighting table: per-language token share and the
    sampling weight that equalizes the mix (weight = target share /
    actual share, with a uniform target across observed languages) —
    the table a weighted sampler joins against to hit a prescribed
    language (or domain) mixture in an LLM training run.

    One corpus pass rolls tokens up per language; the totals are a
    1-row broadcast; weights are exact integer arithmetic with one
    final ppm division per language. Swap the uniform target for any
    prescribed mix by joining a target table in place of 1/n_langs.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.expr("size(filter(split(text, ' '), t -> length(t) > 0))")
    # HAVING n_tokens > 0 on BOTH sides: a stratum of empty/whitespace
    # docs would otherwise hit 0-division, where Spark's non-ANSI
    # division yields NULL but DuckDB yields inf (the trend-slope
    # cross-engine edge case).
    lt = (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(toks).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    tot = lt.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    return lt.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.floor(1000000.0 * F.col("n_tokens") / F.col("t") + F.lit(0.5))
        .cast("bigint")
        .alias("share_ppm"),
        F.floor(
            1000000.0 * F.col("t") / (F.col("n_langs") * F.col("n_tokens"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("weight_ppm"),
    )


@query(
    "doc_temperature_mix",
    oracle="""
WITH st AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '),
                                  t -> length(t) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
  HAVING SUM(len(list_filter(string_split(text, ' '),
                             t -> length(t) > 0))) > 0
), q AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(1000000.0 * sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
           AS q_tok
  FROM st
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
         CAST(SUM(q_tok) AS BIGINT) AS qt
  FROM q
), shares AS (
  SELECT source, n_docs, n_tokens,
         CAST(FLOOR(1000000.0 * n_tokens / t + 0.5) AS BIGINT) AS share_ppm,
         CAST(FLOOR(1000000.0 * q_tok / qt + 0.5) AS BIGINT)
           AS temp_share_ppm
  FROM q CROSS JOIN tot
)
SELECT source, n_docs, n_tokens, share_ppm, temp_share_ppm,
       CASE WHEN share_ppm = 0 THEN NULL
            ELSE CAST(FLOOR(1000000.0 * temp_share_ppm / share_ppm + 0.5)
                      AS BIGINT) END AS boost_ppm
FROM shares
""",
)
def doc_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source-sampling table (α = 0.5): each
    source's sampling share ∝ (token count)^α — the standard
    multilingual/multi-source rebalancing (XLM-R, mT5 exponential
    smoothing) that upsamples small sources without letting them
    dominate. ``boost_ppm`` (temperature share / raw share) is the
    per-source repeat factor a sampler applies.

    α is fixed at 0.5 because sqrt is IEEE-correctly-rounded, so both
    engines compute bit-identical values (a free-α pow() drifts in the
    last ulp across libm implementations — the cross-engine trap this
    repo's determinism contract exists to avoid). The sqrt is
    quantized to integer µ-units BEFORE the normalizing sum, so the
    sum is order-independent exact integer math; one float division
    per source after. boost is derived from the two already-rounded
    ppm integers, hence also stable. Plan: one corpus token pass →
    source-level grid; everything after is grid-sized arithmetic.
    """
    docs = table(spark, sf_dir, "documents")
    toks = F.expr("size(filter(split(text, ' '), t -> length(t) > 0))")
    st = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(toks).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    q = st.withColumn(
        "q_tok",
        F.floor(1000000.0 * F.sqrt(F.col("n_tokens").cast("double")))
        .cast("bigint"),
    )
    tot = q.agg(
        F.sum("n_tokens").cast("bigint").alias("t"),
        F.sum("q_tok").cast("bigint").alias("qt"),
    )
    shares = q.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(1000000.0 * F.col("n_tokens") / F.col("t") + F.lit(0.5))
        .cast("bigint")
        .alias("share_ppm"),
        F.floor(1000000.0 * F.col("q_tok") / F.col("qt") + F.lit(0.5))
        .cast("bigint")
        .alias("temp_share_ppm"),
    )
    return shares.withColumn(
        "boost_ppm",
        F.when(F.col("share_ppm") == 0, F.lit(None).cast("bigint")).otherwise(
            F.floor(
                1000000.0 * F.col("temp_share_ppm") / F.col("share_ppm")
                + F.lit(0.5)
            ).cast("bigint")
        ),
    )


def _pack_efficiency_oracle() -> str:
    from the_hive_spark.registry import ORACLES

    pack_sql = ORACLES["doc_pack_sequences"]
    return f"""
WITH packed AS ({pack_sql})
SELECT bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(FLOOR(1000000.0 * SUM(n_tokens) / {PACK_BUDGET} + 0.5) AS BIGINT)
         AS fill_ppm
FROM packed GROUP BY bin_id
"""


@query("doc_pack_efficiency", oracle=_pack_efficiency_oracle())
def doc_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over the sequence packer: per bin,
    document count, token total, and fill ratio against the token
    budget (ppm) — the dataloader-throughput readout that tells you
    how much compute each training batch wastes on padding (or spills
    past the budget when one doc straddles a boundary).

    Pure composition: reuses doc_pack_sequences (whose running sum is
    already the range-partitioned distributed form) plus one
    bin-keyed rollup.
    """
    packed = doc_pack_sequences(spark, sf_dir)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(
            1000000.0 * F.sum("n_tokens") / F.lit(PACK_BUDGET) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("fill_ppm"),
    )


COOC_TOP_TERMS = 20  # bounded term set: lift grid is C(20,2) pairs


@query(
    "doc_term_cooccurrence_lift",
    oracle=f"""
WITH w AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '),
                                   t -> length(t) > 0)) AS terms
  FROM documents WHERE length(text) > 0
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM w
), dt AS (
  SELECT doc_id, unnest(terms) AS term FROM w
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM dt GROUP BY term
), top AS (
  SELECT term, n FROM df ORDER BY n DESC, term LIMIT {COOC_TOP_TERMS}
), tdt AS (
  SELECT dt.doc_id, dt.term FROM dt JOIN top USING (term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM tdt a JOIN tdt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
)
SELECT p.term_a, p.term_b, p.n_ab,
       ta.n AS n_a, tb.n AS n_b,
       CAST(FLOOR(1000.0 * p.n_ab * (SELECT n_docs FROM n)
                  / (ta.n * tb.n) + 0.5) AS BIGINT) AS lift_milli
FROM pairs p
JOIN top ta ON ta.term = p.term_a
JOIN top tb ON tb.term = p.term_b
""",
)
def doc_term_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level co-occurrence lift between the corpus's top
    {COOC_TOP_TERMS} terms: P(a,b)/(P(a)·P(b)) as milli-lift (1000 =
    independent; higher = the terms travel together) — topical-
    association structure without log-PMI's cross-engine float drift
    (the lift RATIO carries the same ordering as PMI, quantized from
    one float division of exact integer counts).

    Scale shape: one corpus pass builds distinct (doc, term); the term
    grid is the top-K by document frequency (deterministic ties by
    term) — K is FIXED, so the presence table is corpus-rows × K at
    worst and the pair join on doc_id fans out to ≤ C(K,2) pairs per
    doc. The lift grid itself is C({COOC_TOP_TERMS},2) rows. int64
    headroom: n_ab·N and n_a·n_b < 2⁶³ hold to ~3·10⁹ docs (ANSI
    fails loud beyond, same documented bound as the basket lift).
    """
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_docs = docs.count()  # scalar job
    dt = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("filter(split(lower(text), ' '), t -> length(t) > 0)")
            )
        ).alias("term"),
    )
    df = dt.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    top = df.orderBy(F.desc("n"), F.asc("term")).limit(COOC_TOP_TERMS)
    top_rows = {r["term"]: r["n"] for r in top.collect()}  # K rows
    tdt = dt.filter(F.col("term").isin(*top_rows)).select("doc_id", "term")
    a, b = tdt.alias("a"), tdt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    na = F.create_map(
        *[F.lit(x) for t, n in sorted(top_rows.items()) for x in (t, n)]
    )
    return pairs.select(
        "term_a",
        "term_b",
        "n_ab",
        na[F.col("term_a")].cast("bigint").alias("n_a"),
        na[F.col("term_b")].cast("bigint").alias("n_b"),
        F.floor(
            1000.0 * F.col("n_ab") * F.lit(n_docs)
            / (
                na[F.col("term_a")].cast("bigint")
                * na[F.col("term_b")].cast("bigint")
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lift_milli"),
    )


RAKE_STOPWORDS = [
    "the", "a", "and", "of", "to", "in", "is", "that", "it", "for",
]
RAKE_TOP_K = 25


@query(
    "doc_rake_keyphrases",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '),
                     t -> length(t) > 0) AS words
  FROM documents WHERE length(text) > 0
), w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos, words[i] AS word
  FROM base, UNNEST(range(1, len(words) + 1)) AS t(i)
), nonstop AS (
  SELECT doc_id, pos, word FROM w
  WHERE NOT list_contains({RAKE_STOPWORDS!r}, word)
), runs AS (
  SELECT doc_id, pos, word,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM nonstop
), islands AS (
  SELECT doc_id, grp,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS phrase_len
  FROM runs GROUP BY doc_id, grp
), word_stats AS (
  SELECT r.word,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(i.phrase_len) AS BIGINT) AS degree
  FROM runs r JOIN islands i ON i.doc_id = r.doc_id AND i.grp = r.grp
  GROUP BY r.word
), word_scores AS (
  SELECT word, CAST(FLOOR(1000.0 * degree / freq) AS BIGINT) AS score_milli
  FROM word_stats
), phrase_scores AS (
  SELECT i.doc_id, i.grp, i.phrase, i.phrase_len,
         CAST(SUM(s.score_milli) AS BIGINT) AS score_milli
  FROM islands i
  JOIN runs r ON r.doc_id = i.doc_id AND r.grp = i.grp
  JOIN word_scores s ON s.word = r.word
  GROUP BY i.doc_id, i.grp, i.phrase, i.phrase_len
)
SELECT phrase,
       CAST(ANY_VALUE(phrase_len) AS BIGINT) AS n_words,
       CAST(ANY_VALUE(score_milli) AS BIGINT) AS score_milli,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM phrase_scores
GROUP BY phrase
ORDER BY score_milli DESC, phrase
LIMIT {RAKE_TOP_K}
""",
)
def doc_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al., 2010): candidate
    phrases are maximal stopword-free word runs; each word scores
    degree/freq (degree = Σ length of the phrases it appears in,
    corpus-wide); a phrase scores the sum of its words' scores; top
    {RAKE_TOP_K} distinct phrases corpus-wide with deterministic
    (score DESC, phrase) order. The multi-word-aware complement to
    doc_top_terms/TF-IDF — it surfaces PHRASES, which is what topic
    labels, index keys, and dataset cards actually want.

    Determinism deviation from the textbook, on purpose: word scores
    quantize to milli BEFORE the phrase sum, so the phrase score is an
    exact integer sum (the float sum of degree/freq rationals with
    unequal denominators would drift across engines).

    Scale shape: phrase formation is the gaps-and-islands sweep
    (windows partitioned BY doc); word stats are one vocabulary-keyed
    aggregation; phrase scores join words→scores on the word key; the
    final top-k is TakeOrdered. No all-pairs, no corpus-wide window.
    """
    from pyspark.sql import Window

    n = spark.sparkContext.defaultParallelism
    w = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.expr("filter(split(lower(text), ' '), t -> length(t) > 0)")
            ).alias("pos0", "word"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
        .repartition(n, "doc_id")
    )
    nonstop = w.filter(~F.col("word").isin(RAKE_STOPWORDS))
    win = Window.partitionBy("doc_id").orderBy("pos")
    runs = nonstop.withColumn(
        "grp", F.col("pos") - F.row_number().over(win)
    )
    # ONE phrase table carries the word multiset forward (r11, guide
    # §2.4): before, `runs` was evaluated three times (the island agg
    # and two join-backs) — the window subtree re-ran per consumer.
    # Keeping the sorted word ARRAY on each island row lets word stats
    # and phrase scoring both derive from an explode of the persisted
    # phrase table: the gaps-and-islands window runs once, and the
    # (doc_id, grp) join-backs disappear. Same rows out: every nonstop
    # word occurrence belongs to exactly one island, so exploding the
    # island arrays reproduces `runs` word-for-word. Persisted through
    # the matstore (r12, r11 ADVICE): a bare .persist() here leaked one
    # cache entry per invocation for the session lifetime; the store
    # dedupes repeat builds per snapshot and unpersists on eviction.
    from the_hive_spark.functions.matstore import materialized

    def _build_islands() -> DataFrame:
        return (
            runs.groupBy("doc_id", "grp")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ).alias("words"),
                F.count(F.lit(1)).alias("phrase_len"),
            )
            .withColumn("phrase", F.concat_ws(" ", F.col("words")))
        )

    islands = materialized(
        spark, ("rake_islands", sf_dir), _build_islands
    )
    occurrences = islands.select(
        "doc_id", "grp", "phrase", "phrase_len",
        F.explode("words").alias("word"),
    )
    word_stats = occurrences.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("phrase_len").cast("bigint").alias("degree"),
    )
    word_scores = word_stats.select(
        "word",
        F.floor(1000.0 * F.col("degree") / F.col("freq"))
        .cast("bigint")
        .alias("score_milli"),
    )
    phrase_scores = (
        occurrences.join(word_scores, "word")
        .groupBy("doc_id", "grp", "phrase", "phrase_len")
        .agg(F.sum("score_milli").cast("bigint").alias("score_milli"))
    )
    return (
        phrase_scores.groupBy("phrase")
        .agg(
            F.first("phrase_len").cast("bigint").alias("n_words"),
            F.first("score_milli").cast("bigint").alias("score_milli"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .orderBy(F.desc("score_milli"), F.asc("phrase"))
        .limit(RAKE_TOP_K)
    )


SWEEP_STEP_PPM = 100_000  # threshold grid: 0, 100k, …, 900k


@query(
    "doc_quality_prune_sweep",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS n_tokens,
         len(list_filter(string_split(lower(text), ' '),
             t -> list_contains(['the','a','and','of','to','in','is','that','it','for'], t))) AS n_stop
  FROM documents WHERE length(text) > 0
), scored AS (
  SELECT doc_id, n_tokens,
         LEAST(CAST(FLOOR(1000000.0 * n_stop / greatest(n_tokens, 1) + 0.5) AS BIGINT)
               // {SWEEP_STEP_PPM}, 9) AS bucket
  FROM m
), per_bucket AS (
  SELECT g.b AS bucket,
         COALESCE(SUM(CASE WHEN s.bucket IS NOT NULL THEN 1 END), 0) AS n_docs,
         COALESCE(SUM(s.n_tokens), 0) AS n_tokens
  FROM (SELECT unnest(range(0, 10)) AS b) g
  LEFT JOIN scored s ON s.bucket = g.b
  GROUP BY g.b
)
SELECT CAST(bucket * {SWEEP_STEP_PPM} AS BIGINT) AS threshold_ppm,
       CAST(SUM(n_docs) OVER (ORDER BY bucket DESC) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_tokens) OVER (ORDER BY bucket DESC) AS BIGINT) AS n_tokens_kept,
       CAST(FLOOR(1000000.0 * SUM(n_docs) OVER (ORDER BY bucket DESC)
                  / greatest(SUM(n_docs) OVER (), 1) + 0.5) AS BIGINT) AS docs_share_ppm,
       CAST(FLOOR(1000000.0 * SUM(n_tokens) OVER (ORDER BY bucket DESC)
                  / greatest(SUM(n_tokens) OVER (), 1) + 0.5) AS BIGINT) AS tokens_share_ppm
FROM per_bucket
""",
)
def doc_quality_prune_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sweep retention curve for the stopword-ratio quality
    gate: for every candidate threshold t in {0, 100k, …, 900k} ppm,
    how many documents and tokens survive "keep if stopword_ppm ≥ t"
    — the tuning table a curation pipeline reads BEFORE committing to
    a cut-off, instead of re-running the filter once per candidate
    (10 corpus passes collapsed into one).

    Plan: one corpus scan computes each doc's (stopword bucket,
    n_tokens); a map-side-combined aggregate reduces the corpus to ≤10
    bucket rows; the cumulative "kept at threshold" sums and total
    shares run as windows over that 10-row aggregate — bounded by the
    grid size, not the data (the same bounded-window rationale as the
    funnel queries). Missing buckets are restored from a static grid
    so the sweep always emits all 10 thresholds.
    """
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.expr("filter(split(text, ' '), t -> length(t) > 0)")
    stop_arr = "'the','a','and','of','to','in','is','that','it','for'"
    n_stop = F.expr(
        f"size(filter(split(lower(text), ' '),"
        f" t -> array_contains(array({stop_arr}), t)))"
    )
    n_tokens = F.size(toks)
    stop_ppm = F.floor(
        1000000.0 * n_stop / F.greatest(n_tokens, F.lit(1)) + F.lit(0.5)
    ).cast("bigint")
    scored = docs.select(
        F.least(
            F.floor(stop_ppm / SWEEP_STEP_PPM).cast("bigint"), F.lit(9)
        ).alias("bucket"),
        n_tokens.cast("bigint").alias("n_tokens"),
    )
    agg = scored.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    grid = spark.range(10).select(F.col("id").alias("bucket"))
    per_bucket = (
        grid.join(agg, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        )
    )
    from pyspark.sql import Window

    # windows over the 10-row bucket aggregate only — grid-bounded
    w_desc = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    kept_docs = F.sum("n_docs").over(w_desc)
    kept_toks = F.sum("n_tokens").over(w_desc)
    tot_docs = F.greatest(F.sum("n_docs").over(w_all), F.lit(1))
    tot_toks = F.greatest(F.sum("n_tokens").over(w_all), F.lit(1))
    return per_bucket.select(
        (F.col("bucket") * SWEEP_STEP_PPM).cast("bigint").alias("threshold_ppm"),
        kept_docs.cast("bigint").alias("n_docs_kept"),
        kept_toks.cast("bigint").alias("n_tokens_kept"),
        F.floor(1000000.0 * kept_docs / tot_docs + F.lit(0.5))
        .cast("bigint").alias("docs_share_ppm"),
        F.floor(1000000.0 * kept_toks / tot_toks + F.lit(0.5))
        .cast("bigint").alias("tokens_share_ppm"),
    )


@query(
    "doc_tokenizer_fertility",
    oracle="""
WITH c AS (
  SELECT lang, text,
         regexp_replace(regexp_replace(text, '[A-Za-z]+', 'a', 'g'),
                        '[0-9]+', '0', 'g') AS collapsed
  FROM documents WHERE length(text) > 0
), m AS (
  SELECT lang,
         length(text) AS n_chars,
         length(replace(collapsed, ' ', '')) AS n_bpe
  FROM c
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe_tokens_total,
       CAST(FLOOR(1000000.0 * SUM(n_bpe) / greatest(SUM(n_chars), 1) + 0.5)
            AS BIGINT) AS tokens_per_mchar,
       CAST(FLOOR(1.0 * SUM(n_bpe) / greatest(COUNT(*), 1)) AS BIGINT)
         AS mean_tokens_per_doc
FROM m GROUP BY lang
""",
)
def doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish pre-token count per
    character, aggregated over the labeled ``lang`` column — the
    number a multilingual training pipeline budgets against (fertility
    disparities decide per-language sampling weights and context-
    window economics; a language at 2x tokens/char costs 2x compute
    per character of coverage).

    Reuses doc_bpe_token_stats' run-collapsing character arithmetic
    (one marker char per letter/digit run, counts = length deltas), so
    the scan stays two allocation-free JVM regex passes with NO token
    array; the per-language rollup is a map-side-combinable aggregate
    over |langs| groups. Integer ppm fertility so the hash is
    engine-exact."""
    n = spark.sparkContext.defaultParallelism
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(n)
    )
    collapsed = F.regexp_replace(
        F.regexp_replace("text", "[A-Za-z]+", "a"), "[0-9]+", "0"
    )
    per_doc = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        F.length(F.replace(collapsed, F.lit(" "))).alias("n_bpe"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars_total"),
        F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens_total"),
        F.floor(
            1000000.0 * F.sum("n_bpe") / F.greatest(F.sum("n_chars"), F.lit(1))
            + F.lit(0.5)
        ).cast("bigint").alias("tokens_per_mchar"),
        F.floor(
            1.0 * F.sum("n_bpe") / F.greatest(F.count(F.lit(1)), F.lit(1))
        ).cast("bigint").alias("mean_tokens_per_doc"),
    )


@query(
    "doc_vocab_growth_heaps",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, text,
         2 * ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
           <= COUNT(*) OVER (PARTITION BY source) AS in_half
  FROM documents WHERE length(text) > 0
), tok AS (
  SELECT source, in_half, unnest(string_split(text, ' ')) AS term
  FROM ranked
), tok_nz AS (
  SELECT * FROM tok WHERE length(term) > 0
)
SELECT source,
       CAST(COUNT(*) FILTER (in_half) AS BIGINT) AS n_tokens_half,
       CAST(COUNT(*) AS BIGINT) AS n_tokens_full,
       CAST(COUNT(DISTINCT term) FILTER (in_half) AS BIGINT) AS vocab_half,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS vocab_full,
       CAST(FLOOR(1000000.0 * (COUNT(DISTINCT term)
                               - COUNT(DISTINCT term) FILTER (in_half))
                  / greatest(COUNT(*) - COUNT(*) FILTER (in_half), 1) + 0.5)
            AS BIGINT) AS marginal_vocab_per_token_ppm
FROM tok_nz GROUP BY source
""",
)
def doc_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth per source: token and distinct-term
    counts at a nested half-corpus prefix (by doc_id order — the
    deterministic 'corpus so far') vs the full corpus, plus the
    marginal new-vocabulary rate over the second half. The tokenizer-
    sizing statistic: a source whose marginal rate stays high keeps
    minting unseen terms (open vocabulary — noise, IDs, code), one
    whose rate collapses has saturated (bounded vocabulary), and the
    half/full ingredient columns let the analyst fit the Heaps
    exponent offline without another corpus pass.

    One explode + one grouped aggregate: the half-prefix flag is a
    per-source window over doc_id (rank arithmetic, no second scan),
    and both vocab sizes come from conditional COUNT(DISTINCT) in the
    SAME aggregate, so Spark runs a single expand-shuffle (no join of
    two vocabulary subqueries). Marginal rate is integer ppm —
    engine-exact, no logarithms in the hash."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    w = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "source",
        "text",
        (
            2 * F.row_number().over(w)
            <= F.count(F.lit(1)).over(Window.partitionBy("source"))
        ).alias("in_half"),
    )
    toks = ranked.select(
        "source", "in_half", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.length("term") > 0)
    n_half = F.sum(F.col("in_half").cast("long"))
    n_full = F.count(F.lit(1))
    v_half = F.countDistinct(F.when(F.col("in_half"), F.col("term")))
    v_full = F.countDistinct("term")
    return toks.groupBy("source").agg(
        n_half.cast("bigint").alias("n_tokens_half"),
        n_full.cast("bigint").alias("n_tokens_full"),
        v_half.cast("bigint").alias("vocab_half"),
        v_full.cast("bigint").alias("vocab_full"),
        F.floor(
            1000000.0 * (v_full - v_half)
            / F.greatest(n_full - n_half, F.lit(1))
            + F.lit(0.5)
        ).cast("bigint").alias("marginal_vocab_per_token_ppm"),
    )
