"""Multimodal plumbing: schemas, Arrow batch kernels, dedup over features.
The decode step is a deterministic fake (no codecs in this environment);
what's tested is the real Spark contract around it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lsh_cascade_poc_spark.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_dedup_pairs,
    resize_images,
    sample_video_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=45, seed=42, dup_fraction=0.3).cache()


def test_feature_extraction_shape_and_determinism(spark, media):
    f1 = {r.media_id: r.feature for r in extract_features(media).collect()}
    f2 = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert f1 == f2  # deterministic across runs/partitionings
    assert all(len(v) == FEATURE_DIM for v in f1.values())


def test_resize_contract(spark, media):
    out = resize_images(media, 32, 16).collect()
    assert out, "no images in corpus"
    for r in out:
        assert r.width == 32 and r.height == 16
        assert len(r.payload) == 32 * 16


def test_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_n=3).collect()
    assert frames
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == [0, 3, 6, 9]  # n_frames=12, every 3rd


def test_media_dedup_finds_planted_payload_dups(spark, media):
    # exact payload dups -> identical fake features -> hamming 0 -> found
    pairs = {(r.id_a, r.id_b) for r in media_dedup_pairs(media, hamming_tau=2).collect()}
    payloads = {r.media_id: bytes(r.payload) for r in media.select("media_id", "payload").collect()}
    planted = {
        (a, b)
        for a in payloads for b in payloads
        if a < b and payloads[a] == payloads[b]
    }
    assert planted, "corpus has no planted dups"
    assert planted <= pairs
    # and nothing wildly unrelated at tau=2 beyond hash coincidence
    assert len(pairs) <= len(planted) + 3


def test_not_implemented_gate(spark, media):
    with pytest.raises(Exception) as ei:
        extract_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
