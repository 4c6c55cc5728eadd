"""Multimodal plumbing tests: schema derivation, gated decode, resize
index math, frame-sample explosion arity, audio windows, fingerprint
dedup."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from the_hive_spark.operators.multimodal import (
    audio_feature_windows,
    decode_image,
    documents_as_media,
    media_fingerprint,
    resize_images,
    sample_video_frames,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from the_hive_spark.tables import table

    return documents_as_media(table(spark, SF_DIR, "documents")).cache()


def test_media_schema_and_kinds(media):
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    img = media.filter(F.col("kind") == "image").first()
    assert img["width"] is not None and img["duration_ms"] is None
    aud = media.filter(F.col("kind") == "audio").first()
    assert aud["sample_rate"] is not None and aud["duration_ms"] is not None


def test_decode_image_requires_fake_without_pil(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_image(media).collect()


def test_decode_image_fake_deterministic(media):
    rows = decode_image(media, fake=True).collect()
    assert rows, "no image rows decoded"
    for r in rows:
        assert r["n_pixels"] == r["width"] * r["height"]
    again = {r["media_id"]: r["pixel_checksum"]
             for r in decode_image(media, fake=True).collect()}
    assert {r["media_id"]: r["pixel_checksum"] for r in rows} == again


def test_resize_images_shape_and_determinism(media):
    out = resize_images(media, 32, 16, fake=True).collect()
    assert out and all(r["width"] == 32 and r["height"] == 16 for r in out)
    again = {r["media_id"]: r["pixel_checksum"]
             for r in resize_images(media, 32, 16, fake=True).collect()}
    assert {r["media_id"]: r["pixel_checksum"] for r in out} == again
    # different target size → different pixels
    other = {r["media_id"]: r["pixel_checksum"]
             for r in resize_images(media, 16, 16, fake=True).collect()}
    assert any(other[k] != v for k, v in again.items())


def test_frame_sample_counts_match_duration(media):
    frames = sample_video_frames(media, interval_ms=2000)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert per_media.keys() == durations.keys()
    for mid, n in per_media.items():
        assert n == durations[mid] // 2000 + 1


def test_audio_windows(media):
    rows = audio_feature_windows(media, window_ms=1000).collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "audio").collect()
    }
    for mid, ws in by_media.items():
        assert len(ws) == durations[mid] // 1000 + 1
        idxs = sorted(w["window_idx"] for w in ws)
        assert idxs == list(range(len(ws)))
        assert all(w["rms_proxy"] >= 0 for w in ws)


def test_fingerprint_dedup_exact(spark, media):
    fp = media_fingerprint(media)
    # identical payloads -> identical fingerprints (planted duplicate)
    dup = media.limit(1).withColumn("media_id", F.lit(999_999).cast("bigint"))
    both = media_fingerprint(media.unionByName(dup)).filter(
        F.col("media_id").isin(
            [999_999, media.first()["media_id"]]
        )
    ).collect()
    assert len({r["fingerprint"] for r in both}) == 1
    assert fp.count() == media.count()


def test_phash_matches_pure_python_reference(spark, media):
    """image_phash + the banded pair query vs a brute-force pure-
    Python recomputation (hash values AND the hamming≤3 pair set —
    proves the pigeonhole banding loses no pair)."""
    from the_hive_spark.operators.multimodal import (
        PHASH_HAMMING_MAX,
        _ahash_from_pixels,
        _fake_pixels,
        image_phash,
        media_phash_near_dup,
    )

    imgs = media.filter(F.col("kind") == "image").collect()
    expected_hash = {}
    for r in imgs:
        pixels = _fake_pixels(bytes(r["content"]), r["width"], r["height"])
        expected_hash[r["media_id"]] = _ahash_from_pixels(
            pixels, r["width"], r["height"]
        )

    got_hash = {
        r["media_id"]: r["phash"]
        for r in image_phash(media, fake=True).collect()
    }
    assert got_hash == expected_hash

    ids = sorted(expected_hash)
    expected_pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((expected_hash[a] ^ expected_hash[b]) & ((1 << 64) - 1)
                    ).count("1")
            if d <= PHASH_HAMMING_MAX:
                expected_pairs.add((a, b, d))

    got_pairs = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in media_phash_near_dup(spark, SF_DIR).collect()
    }
    assert got_pairs == expected_pairs


def test_silence_runs_match_pure_python(spark, media):
    """media_silence_runs vs a brute-force recomputation from the
    collected window stream (threshold, run grouping, min length)."""
    from the_hive_spark.operators.multimodal import (
        SILENCE_MIN_WINDOWS,
        SILENCE_RMS_MAX,
        audio_feature_windows,
        media_silence_runs,
    )

    wins = audio_feature_windows(media).collect()
    by_media: dict[int, list] = {}
    for r in wins:
        by_media.setdefault(r["media_id"], []).append(r)
    expected = set()
    for mid, ws in by_media.items():
        ws.sort(key=lambda r: r["window_idx"])
        run = []
        for r in ws + [None]:
            if r is not None and r["rms_proxy"] < SILENCE_RMS_MAX:
                run.append(r)
                continue
            if len(run) >= SILENCE_MIN_WINDOWS:
                expected.add((mid, run[0]["start_ms"], len(run)))
            run = []
    got = {
        (r["media_id"], r["run_start_ms"], r["n_windows"])
        for r in media_silence_runs(spark, SF_DIR).collect()
    }
    assert got == expected
