"""Multimodal operator plumbing: schemas, mapInPandas batch handling,
row expansion, determinism. The decode layer is a documented fake; what's
under test is the Spark-side contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardinalsin_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mm.documents_as_media(docs).cache()


def test_media_schema_and_kinds(media):
    assert set(media.columns) == {
        "media_id", "kind", "content", "width", "height",
        "sample_rate", "n_frames", "mime",
    }
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == set(mm.MEDIA_KINDS)
    assert dict(media.dtypes)["content"] == "binary"


def test_image_features(spark, media):
    feats = mm.image_features(media)
    n_images = media.filter(F.col("kind") == "image").count()
    rows = feats.collect()
    assert len(rows) == n_images > 0
    for r in rows[:20]:
        assert 0.0 <= r.mean_r <= 255.0
        assert 0.0 <= r.std_gray <= 128.0
        assert r.n_bytes > 0
    # determinism: fake decode is pure
    again = {r.media_id: r.mean_g for r in feats.collect()}
    assert {r.media_id: r.mean_g for r in rows} == again


def test_audio_features(media):
    feats = mm.audio_features(media, n_samples=1024)
    n_audio = media.filter(F.col("kind") == "audio").count()
    rows = feats.collect()
    assert len(rows) == n_audio > 0
    for r in rows[:20]:
        assert r.n_samples == 1024
        assert 0.0 <= r.rms <= 1.0
        assert 0 <= r.zero_crossings < 1024


def test_resize_blob_contract(media):
    out = mm.resize_images(media, target_w=4, target_h=3)
    rows = out.collect()
    assert len(rows) == media.filter(F.col("kind") == "image").count()
    for r in rows[:20]:
        assert len(r.content) == 4 * 3 * 3  # w*h*rgb
        assert (r.width, r.height) == (4, 3)


def test_frame_sampling_row_expansion(spark, media):
    every = 2
    out = mm.sample_frames(media, every_n=every)
    videos = media.filter(F.col("kind") == "video")
    expected = videos.select(
        F.sum(F.ceil(F.col("n_frames") / every)).alias("n")
    ).first().n
    rows = out.collect()
    assert len(rows) == expected
    by_media = videos.select("media_id", "width", "height", "n_frames").collect()
    dims = {r.media_id: (r.width, r.height, r.n_frames) for r in by_media}
    for r in rows[:50]:
        w, h, nf = dims[r.media_id]
        assert len(r.frame_bytes) == w * h * 3
        assert 0 <= r.frame_idx < nf and r.frame_idx % every == 0
