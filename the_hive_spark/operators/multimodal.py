"""Multimodal (image/audio/video) columns as first-class data.

The reference is text-only, but a training-data engine at 100 TB
carries media: opaque ``binary`` payloads + typed metadata, processed
by Arrow-batched ``mapInPandas`` stages. This module provides the
Spark-side plumbing — schemas, batch iteration, row explosion
(frame sampling), partition behavior — for real media pipelines.

Decode is environment-gated: PIL/librosa/ffmpeg are not in this
container, so ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic synthetic decode
(pixel grid seeded by the payload bytes). The *plumbing* — batch
shapes, schemas, explosion arity, partitioning — is identical either
way, so everything except the codec itself is tested for real.

Because the driver testdata has no media table, ``documents_as_media``
derives a deterministic media table from ``documents`` with pure
arithmetic (no hashing), so every derivation is reproducible in ANSI
SQL and the registry queries below stay oracle-checked end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from the_hive_spark.registry import query
from the_hive_spark.tables import table

KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "width int, height int, sample_rate int, duration_ms bigint, codec string"
)

FRAME_INTERVAL_MS = 2000  # video frame-sample cadence
AUDIO_WINDOW_MS = 1000  # audio feature-window size


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic documents → media derivation (pure arithmetic so
    the DuckDB oracle can reproduce every column):

    - kind cycles image/audio/video by doc_id % 3
    - payload = utf-8 bytes of the text (an opaque blob to the engine)
    - image dims, audio sample rate, and duration derive from doc_id
      and n_chars only
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.when(kind == "image", (64 + (F.col("doc_id") % 8) * 32).cast("int"))
        .alias("width"),
        F.when(kind == "image", (64 + (F.col("doc_id") % 5) * 32).cast("int"))
        .alias("height"),
        F.when(kind == "audio", (8000 + (F.col("doc_id") % 3) * 8000).cast("int"))
        .alias("sample_rate"),
        F.when(
            kind != "image", (1000 + (F.col("n_chars") % 60) * 500).cast("bigint")
        ).alias("duration_ms"),
        F.concat(F.lit("codec_"), (F.col("doc_id") % 4).cast("string")).alias("codec"),
    )


# ----------------------------------------------------------------- decode

DECODED_SCHEMA = (
    "media_id bigint, width int, height int, n_pixels bigint, pixel_checksum string"
)


def _fake_pixels(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image decode: tile the
    payload's sha256 digest to width*height*3 RGB bytes."""
    digest = hashlib.sha256(content).digest()
    n = width * height * 3
    return (digest * (n // len(digest) + 1))[:n]


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload → decoded pixel stats via mapInPandas.

    Real decode needs PIL (not in this container): without fake=True
    this raises NotImplementedError at execution time. The fake path
    produces deterministic pixels so shape/checksum plumbing is
    exercised for real.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401  (optional dependency)
            from io import BytesIO

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in it:
            out = {"media_id": [], "width": [], "height": [],
                   "n_pixels": [], "pixel_checksum": []}
            for row in pdf.itertuples(index=False):
                data = bytes(row.content)
                if have_pil and not fake:
                    img = Image.open(BytesIO(data)).convert("RGB")
                    w, h = img.size
                    pixels = img.tobytes()
                elif fake:
                    w, h = int(row.width), int(row.height)
                    pixels = _fake_pixels(data, w, h)
                else:
                    raise NotImplementedError(
                        "image decode requires PIL; pass fake=True for the "
                        "deterministic synthetic decode"
                    )
                out["media_id"].append(row.media_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["pixel_checksum"].append(hashlib.sha256(pixels).hexdigest()[:16])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  fake: bool = False) -> DataFrame:
    """Decode → resize → re-encode metadata. Stub codec, real plumbing:
    output rows carry the target shape and a checksum derived from the
    (fake) resampled pixel grid via nearest-neighbor index math."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "pixel_checksum": []}
            for row in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "real resize requires PIL; pass fake=True"
                    )
                w, h = int(row.width), int(row.height)
                src = _fake_pixels(bytes(row.content), w, h)
                # nearest-neighbor resample on the synthetic grid —
                # the index arithmetic is the real thing
                resampled = bytearray()
                for y in range(out_h):
                    sy = y * h // out_h
                    for x in range(out_w):
                        sx = x * w // out_w
                        base = (sy * w + sx) * 3
                        resampled += src[base : base + 3]
                out["media_id"].append(row.media_id)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["pixel_checksum"].append(
                    hashlib.sha256(bytes(resampled)).hexdigest()[:16]
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema="media_id bigint, width int, height int, pixel_checksum string"
    )


def media_fingerprint(media: DataFrame) -> DataFrame:
    """64-bit content fingerprint for media dedup — exact-byte dup
    detection needs no decode, so this path is fully real: groupBy the
    fingerprint to find duplicate payloads at any scale."""
    return media.select(
        "media_id",
        "kind",
        F.xxhash64("content").alias("fingerprint"),
        F.length("content").alias("n_bytes"),
    )


# ---------------------------------------------------------- frame sample


def sample_video_frames(media: DataFrame,
                        interval_ms: int = FRAME_INTERVAL_MS) -> DataFrame:
    """One row per sampled frame timestamp (0, interval, 2·interval …
    ≤ duration): the 1→N explosion a real frame extractor drives.

    JVM-side sequence+explode — no Python in the hot path; the decoder
    UDF would join on (media_id, frame_ts_ms) afterwards.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "duration_ms",
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    F.col("duration_ms"),
                    F.lit(interval_ms).cast("bigint"),
                )
            ).alias("frame_idx", "frame_ts_ms"),
        )
    )


def audio_feature_windows(media: DataFrame,
                          window_ms: int = AUDIO_WINDOW_MS) -> DataFrame:
    """Per-window audio feature rows via mapInPandas: window count
    derives from duration; the feature itself (a byte-level RMS proxy)
    is deterministic on the payload so the pipeline is testable without
    an audio codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "window_idx": [], "start_ms": [], "rms_proxy": []}
            for row in pdf.itertuples(index=False):
                data = bytes(row.content)
                n_windows = int(row.duration_ms) // window_ms + 1
                for w in range(n_windows):
                    lo = w * len(data) // n_windows
                    hi = max(lo + 1, (w + 1) * len(data) // n_windows)
                    seg = data[lo:hi]
                    # empty payload (zero-length doc) → silent window,
                    # not a ZeroDivisionError in the executor
                    rms = (
                        0
                        if not seg
                        else int(
                            (sum(b * b for b in seg) / len(seg)) ** 0.5 * 1000
                        )
                    )
                    out["media_id"].append(row.media_id)
                    out["window_idx"].append(w)
                    out["start_ms"].append(w * window_ms)
                    out["rms_proxy"].append(rms)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches,
        schema="media_id bigint, window_idx int, start_ms bigint, rms_proxy bigint",
    )


# ------------------------------------------------------- registry queries


@query(
    "media_inventory",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         strlen(text) AS n_bytes,
         CASE WHEN doc_id % 3 <> 0 THEN 1000 + (n_chars % 60) * 500 END AS duration_ms
  FROM documents
)
SELECT kind, COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(COALESCE(SUM(duration_ms), 0) AS BIGINT) AS total_duration_ms
FROM media GROUP BY kind
""",
)
def media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind inventory of the derived media table (the profiling
    scan any media pipeline starts with)."""
    media = documents_as_media(table(spark, sf_dir, "documents"))
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("content")).cast("bigint").alias("total_bytes"),
        F.coalesce(F.sum("duration_ms"), F.lit(0)).cast("bigint")
        .alias("total_duration_ms"),
    )


@query(
    "media_frame_sample",
    oracle=f"""
WITH media AS (
  SELECT doc_id AS media_id,
         1000 + (n_chars % 60) * 500 AS duration_ms
  FROM documents WHERE doc_id % 3 = 2
), frames AS (
  SELECT media_id,
         unnest(generate_series(0, duration_ms, {FRAME_INTERVAL_MS})) AS g
  FROM media
)
SELECT media_id, CAST(g AS BIGINT) AS frame_ts_ms,
       CAST(g // {FRAME_INTERVAL_MS} AS INT) AS frame_idx
FROM frames
""",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling explosion for every video: the exact row set a
    frame extractor fans out over, oracle-checked against SQL
    generate_series."""
    media = documents_as_media(table(spark, sf_dir, "documents"))
    return sample_video_frames(media).select(
        "media_id",
        F.col("frame_ts_ms").cast("bigint"),
        F.col("frame_idx").cast("int"),
    )


@query(
    "media_dedup_fingerprint",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, text FROM documents
)
SELECT a.media_id AS media_a, b.media_id AS media_b
FROM media a JOIN media b ON a.media_id < b.media_id AND a.text = b.text
""",
)
def media_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-payload media dedup: fingerprint groupBy → within-group
    pairs, verified byte-equal (so hash collisions can't corrupt the
    result — the oracle compares payloads directly)."""
    media = documents_as_media(table(spark, sf_dir, "documents"))
    fp = media_fingerprint(media).join(
        media.select("media_id", "content"), "media_id"
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .filter(F.col("a.content") == F.col("b.content"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
    )


SHARD_TARGET_BYTES = 4096  # webdataset-style size-targeted shards


@query(
    "media_shard_manifest",
    oracle=f"""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(strlen(text) AS BIGINT) AS n_bytes
  FROM documents
), c AS (
  SELECT media_id, kind, n_bytes,
         COALESCE(SUM(n_bytes) OVER (PARTITION BY kind ORDER BY media_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
  FROM media
)
SELECT media_id, kind, n_bytes,
       CAST(prev // {SHARD_TARGET_BYTES} AS BIGINT) AS shard_id
FROM c
""",
)
def media_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard manifest for the media corpus: pack blobs into
    ~{SHARD_TARGET_BYTES}-byte shards per kind by exclusive running
    byte count in media_id order — the webdataset/tar-shard layout
    step that turns a billion loose blobs into sequential-read shards
    for training-loader throughput.

    The oracle's per-kind ``SUM() OVER (ORDER BY)`` is the
    single-partition funnel Spark must not run at scale (3 kinds = 3
    partitions would serialize the corpus). Instead ONE
    distributed_prefix_sum over the composite (kind_idx, media_id)
    order key — range-partitioned, per-partition windows,
    O(partitions) offset collect — yields the global running sum, and
    each kind's exclusive prefix is that minus the kind's start offset
    (a min over the kind — 3 tiny groups). Fully parallel,
    deterministic, rerun-stable. The composite key is passed as TWO
    range-partition columns, never packed into one integer: the r5
    sf1 sweep caught the packed form (kind·2⁴⁰ + id) silently
    interleaving kinds once replica ids outgrew the shift width.
    """
    from pyspark.sql import Window

    from the_hive_spark.functions.ids import distributed_prefix_sum

    media = documents_as_media(table(spark, sf_dir, "documents"))
    t = media.select(
        "media_id",
        "kind",
        F.length("content").cast("bigint").alias("n_bytes"),
        (F.col("media_id") % 3).alias("_kind_idx"),
    )
    p = distributed_prefix_sum(
        t, ["_kind_idx", "media_id"], "n_bytes", out_col="gprev"
    )
    return (
        p.withColumn(
            "kind_start", F.min("gprev").over(Window.partitionBy("kind"))
        )
        .select(
            "media_id",
            "kind",
            "n_bytes",
            F.expr(f"(gprev - kind_start) div {SHARD_TARGET_BYTES}")
            .cast("bigint")
            .alias("shard_id"),
        )
    )


# ----------------------------------------------------- perceptual dedup

PHASH_GRID = 8  # aHash grid: 8×8 block means → 64-bit fingerprint
PHASH_HAMMING_MAX = 3
# Cap on the phash band join's metered output volume — same scale as
# the text family's _PAIR_GUARD_CANDIDATES (operators/dedup.py): past
# ~2e8 pairs the bucket join is the corpus telling you it is mostly
# duplicates, and the answer is exact-dedup first, not a bigger join.
_PHASH_GUARD_CANDIDATES = 200_000_000
# 64 bits split into 4×16-bit chunks: any pair within hamming 3 agrees
# exactly on ≥1 chunk (pigeonhole), so candidates are equi-join-able
_PHASH_CHUNKS = [(0, 16), (16, 16), (32, 16), (48, 16)]


def _ahash_from_pixels(pixels: bytes, width: int, height: int) -> int:
    """Average-hash (aHash) of an RGB pixel buffer: 8×8 grid of block
    luminance means, each thresholded against the global mean of the
    64 block values — the classic perceptual fingerprint (public
    domain technique; robust to resize/re-encode, unlike byte hashes).
    Pure integer arithmetic so any two runs agree bit-for-bit."""
    g = PHASH_GRID
    sums = [0] * (g * g)
    counts = [0] * (g * g)
    for y in range(height):
        by = y * g // height
        row_base = y * width * 3
        for x in range(width):
            base = row_base + x * 3
            lum = pixels[base] + pixels[base + 1] + pixels[base + 2]
            cell = by * g + (x * g // width)
            sums[cell] += lum
            counts[cell] += 1
    means = [s * 64 // c if c else 0 for s, c in zip(sums, counts)]
    total = sum(means) // (g * g)
    h = 0
    for i, m in enumerate(means):
        if m > total:
            h |= 1 << i
    if h >= 1 << 63:  # store as signed int64
        h -= 1 << 64
    return h


def _ahash_numpy(pixels: bytes, width: int, height: int) -> int:
    """Vectorized aHash, bit-identical to :func:`_ahash_from_pixels`
    (the pure-Python reference tests pin against): all intermediates
    stay exact — the bincount accumulators are < 2⁵³ so the float64
    sums are integer-exact, and the block means use the same integer
    floor division."""
    import numpy as np

    g = PHASH_GRID
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    lum = px.sum(axis=2, dtype=np.int64)  # per-pixel R+G+B
    by = (np.arange(height, dtype=np.int64) * g) // height
    bx = (np.arange(width, dtype=np.int64) * g) // width
    cell = (by[:, None] * g + bx[None, :]).ravel()
    sums = np.bincount(cell, weights=lum.ravel(), minlength=g * g)
    counts = np.bincount(cell, minlength=g * g)
    sums = sums.astype(np.int64)  # exact: < 2^53 by construction
    means = np.where(counts > 0, (sums * 64) // np.maximum(counts, 1), 0)
    total = int(means.sum()) // (g * g)
    h = 0
    for i, m in enumerate(means.tolist()):
        if m > total:
            h |= 1 << i
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def image_phash(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload → 64-bit perceptual hash via mapInPandas.

    The decode is the environment-gated seam (PIL absent here ⇒
    fake=True substitutes the deterministic synthetic pixel grid); the
    hash arithmetic, batch shape, and signed-int64 packing are real.
    Hashing is the numpy-vectorized form (the per-pixel Python loop
    was the whole-bench slowest stage at sf0.1); the scalar reference
    implementation stays as the test oracle."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            ids, hashes = [], []
            for row in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "real decode requires PIL; pass fake=True for the "
                        "deterministic synthetic pixel grid"
                    )
                w, h = int(row.width), int(row.height)
                pixels = _fake_pixels(bytes(row.content), w, h)
                ids.append(row.media_id)
                hashes.append(_ahash_numpy(pixels, w, h))
            yield pd.DataFrame(
                {"media_id": ids, "phash": pd.Series(hashes, dtype="int64")}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema="media_id bigint, phash bigint"
    )


@query("media_phash_near_dup")  # decode seam ⇒ rows-only by design
def media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image pairs: hamming ≤
    {PHASH_HAMMING_MAX} on the 64-bit aHash — the dedup a multimodal
    training corpus needs where byte fingerprints
    (media_dedup_fingerprint) miss re-encoded/resized copies.

    EXACT at the stated radius via pigeonhole banding, same shape as
    doc_simhash_hamming_pairs: 4×16-bit chunk equi-joins produce the
    candidates, bit_count(xor) verifies — never an all-pairs join, and
    the chunk value is the partition key that survives a billion
    images. Guarded since round 11 by the text family's measure-then-
    refuse contract: one aggregate meters the bucket join's exact
    output volume before it runs and refuses past
    {_PHASH_GUARD_CANDIDATES:.0e} naming the data-side remediation
    (tests/test_round11_ops.py pins both directions; the sf10 row in
    SCALE_PHASH_GUARD.json replaces r10's 900 s cancellation with a
    117 s metered refusal — the cost is the linear signature build
    over 500k images, after which the named remediation completes in
    4 s on the 5,000 exact-dedup survivors). Rows-only by design (the
    decode seam is
    Python); the hash and the pair set are pinned against a
    pure-Python reference in tests/test_multimodal.py.
    """
    media = documents_as_media(table(spark, sf_dir, "documents"))
    sig = image_phash(media, fake=True)
    chunk_exprs = [
        F.struct(
            F.lit(i).alias("band"),
            F.expr(
                f"shiftrightunsigned(phash, {off}) & {(1 << width) - 1}"
            ).alias("val"),
        )
        for i, (off, width) in enumerate(_PHASH_CHUNKS)
    ]
    from the_hive_spark.functions.matstore import materialized

    # materialized (not a bare persist): the self-join would run the
    # decode+hash pipeline once per side, and a session-lifetime
    # persist here would leak block-manager memory across the 100+
    # query bench sweep (matstore owns eviction)
    banded = materialized(
        spark,
        ("media_phash_bands", sf_dir),
        lambda: sig.select(
            "media_id", "phash", F.explode(F.array(*chunk_exprs)).alias("bv")
        ).select("media_id", "phash", "bv.band", "bv.val"),
    )
    # Measure-then-refuse (r10 VERDICT ask #4): Σ C(bucket,2) over the
    # already-materialized banded table is the band join's exact output
    # volume, metered with ONE aggregate before the join runs — the
    # same contract as the text family's _guard_band_buckets. Without
    # it, sf10's clone corpus (100 identical copies of every image ⇒
    # every bucket 100-deep) burned a full 900 s budget instead of
    # refusing in seconds. The pigeonhole banding itself can't be
    # "sharpened" (4×16 bits is what makes hamming≤3 exact), so the
    # remediations are data-side.
    est = (
        banded.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("cand"))
        .collect()[0]["cand"]
        or 0
    )
    if est > _PHASH_GUARD_CANDIDATES:
        raise ValueError(
            f"phash pigeonhole buckets hold {est:.2e} candidate pairs "
            f"(cap {_PHASH_GUARD_CANDIDATES:.0e}) — the image corpus is "
            "duplicate-dense at this size (hash-identical payloads "
            "collide in every band); pre-prune exact byte duplicates "
            "first (media_dedup_fingerprint keep-one, then re-run on "
            "survivors), or dedup per-source shards independently"
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.expr("bit_count(a.phash ^ b.phash)")
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
        .dropDuplicates(["media_a", "media_b"])
    )


SILENCE_RMS_MAX = 97_000  # rms_proxy threshold: below = "silent" (~p25 of the synthetic stream, so runs are selective, not the whole track)
SILENCE_MIN_WINDOWS = 2  # consecutive silent windows to call a run


@query("media_silence_runs")  # audio feature seam ⇒ rows-only
def media_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal silence runs per audio track: consecutive feature
    windows whose RMS proxy falls below {SILENCE_RMS_MAX}, reported as
    (media_id, run_start_ms, n_windows) for runs of ≥
    {SILENCE_MIN_WINDOWS} windows — the silence/VAD segmentation step
    an audio training pipeline uses to trim dead air and split long
    recordings at natural boundaries.

    Same gaps-and-islands shape as doc_dup_spans (window_idx −
    row_number is constant within a run), with every window
    partitioned BY media_id — bounded by track duration, parallel
    across tracks. The RMS itself comes from the Arrow-batched audio
    feature stage (deterministic byte-level proxy in this container;
    a real codec drops into the same seam), so the query is rows-only
    by design and pinned against a pure-Python reference in
    tests/test_multimodal.py.
    """
    from pyspark.sql import Window

    media = documents_as_media(table(spark, sf_dir, "documents"))
    windows = audio_feature_windows(media)
    silent = windows.filter(F.col("rms_proxy") < SILENCE_RMS_MAX).select(
        "media_id", "window_idx", "start_ms"
    )
    w = Window.partitionBy("media_id").orderBy("window_idx")
    runs = silent.withColumn(
        "grp", F.col("window_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy("media_id", "grp")
        .agg(
            F.min("start_ms").cast("bigint").alias("run_start_ms"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .filter(F.col("n_windows") >= SILENCE_MIN_WINDOWS)
        .drop("grp")
    )


@query(
    "media_payload_dup_mass",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text AS payload
  FROM documents
), fam AS (
  SELECT kind, payload, COUNT(*) AS c FROM media GROUP BY kind, payload
)
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_families,
       CAST(SUM(c) AS BIGINT) AS n_media,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_families,
       CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS exact_pair_mass
FROM fam GROUP BY kind
""",
)
def media_payload_dup_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical media duplication mass per kind: group payloads
    by exact bytes and report the family count, duplicate families,
    and pair mass Σ C(c,2) — the meter to run BEFORE a perceptual
    near-dup job. Byte-equal payloads decode to the same pixels and
    hash to the same 64-bit aHash, so each size-c family contributes
    C(c,2) hamming-0 pairs to media_phash_near_dup's OUTPUT (and ≥
    C(c,2) band-join rows per colliding chunk): on a K-replicated
    corpus the pair job's result is itself quadratic in K, which no
    plan can make linear. This meter says so in advance at linear
    cost (the documented cause of the sf10 bench budget
    cancellation — SF10_CANCELLATIONS.md).

    Plan: one scan → payload-keyed map-side-combined count → per-kind
    rollup. The payload grouping key is the raw bytes (no hashing), so
    the oracle compares exact byte equality, collision-free.
    """
    media = documents_as_media(table(spark, sf_dir, "documents"))
    fam = media.groupBy("kind", "content").agg(
        F.count(F.lit(1)).alias("c")
    )
    return fam.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_families"),
        F.sum("c").cast("bigint").alias("n_media"),
        F.sum((F.col("c") > 1).cast("long")).cast("bigint")
        .alias("n_dup_families"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("bigint")
        .alias("exact_pair_mass"),
    )
