"""Multimodal plumbing tests: schemas, determinism, batch shapes, the
codec gate, and blob-free downstream output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.make_fake_media(spark, n=21).cache()


def test_decode_schema_and_rowcount(media):
    out = mm.decode_media(media)
    assert out.count() == 21
    assert set(out.columns) == {
        "media_id", "kind", "width", "height", "n_bytes", "mean_byte", "payload_sha"
    }
    r = out.filter(F.col("media_id") == 0).first()
    assert 64 <= r["width"] <= 255 and r["n_bytes"] > 0


def test_decode_is_deterministic(media):
    a = {r["media_id"]: r["payload_sha"] for r in mm.decode_media(media).collect()}
    b = {r["media_id"]: r["payload_sha"] for r in mm.decode_media(media).collect()}
    assert a == b


def test_real_codec_gate_raises(media):
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, use_real_codec=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "decode" in str(exc_info.value)


def test_feature_extraction_shape_and_determinism(media):
    out = mm.extract_features(media).collect()
    assert len(out) == 21
    assert all(len(r["feature"]) == mm.IMAGE_FEATURE_DIM for r in out)
    again = mm.extract_features(media).collect()
    assert {r["media_id"]: tuple(r["feature"]) for r in out} == {
        r["media_id"]: tuple(r["feature"]) for r in again
    }
    # identical payloads → identical features; distinct payloads → distinct
    feats = {tuple(r["feature"]) for r in out}
    assert len(feats) == 21


def test_frame_sampling_counts(media):
    frames = mm.sample_frames(media, every_ms=1000)
    meta = {r["media_id"]: r["duration_ms"] for r in
            media.select("media_id", F.col("meta.duration_ms").alias("duration_ms"),
                         "kind").filter(F.col("kind") == "video").collect()}
    got = (
        frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    got_map = {r["media_id"]: r["n"] for r in got}
    assert set(got_map) == set(meta)
    for mid, dur in meta.items():
        assert got_map[mid] == len(range(0, dur, 1000))


def test_resize_rewrites_payload_and_dims(media):
    out = mm.resize_images(media, 224, 224)
    rows = out.collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)
    orig = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows:
        assert bytes(r["payload"]) != orig[r["media_id"]]
    assert len(rows) == 21
