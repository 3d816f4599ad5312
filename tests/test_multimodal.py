"""Multimodal plumbing tests: schemas, determinism, 1→N explosion,
real-mode gating. The decode core is a documented fake (LMM1 synthetic
container) — what's under test is the Spark side."""

from __future__ import annotations

import pytest

from lime_etl_spark.operators import multimodal as mm


@pytest.fixture(autouse=True)
def fake_decode(monkeypatch):
    monkeypatch.setenv("LIME_SPARK_FAKE_DECODE", "1")


@pytest.fixture(scope="module")
def media(spark):
    df = mm.build_media_fixture(spark, n=60, partitions=4)
    df.cache().count()
    return df


def test_fixture_schema_and_determinism(spark, media):
    assert media.schema == mm.MEDIA_SCHEMA
    assert media.count() == 60
    again = {r["media_id"]: bytes(r["content"]) for r in mm.build_media_fixture(spark, 60).collect()}
    first = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    assert first == again
    types = {r["media_type"] for r in media.select("media_type").distinct().collect()}
    assert types == {"image", "audio", "video"}


def test_decode_media(media):
    decoded = mm.decode_media(media)
    assert decoded.schema == mm.DECODED_SCHEMA
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert len(rows) == 60
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        assert r["media_type"] == src[mid]["media_type"]
        assert r["width"] == src[mid]["meta"]["width"]
        assert r["n_bytes"] == len(bytes(src[mid]["content"]))


def test_extract_features_deterministic(media):
    f1 = {r["media_id"]: r["features"] for r in mm.extract_features(media, dim=8).collect()}
    f2 = {r["media_id"]: r["features"] for r in mm.extract_features(media, dim=8).collect()}
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)


def test_resize_images(media):
    resized = mm.resize_images(media, 32, 32)
    rows = resized.collect()
    n_images = media.where("media_type = 'image'").count()
    assert len(rows) == n_images > 0
    for r in rows:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
    # header rewrite round-trips through the decoder
    redecoded = mm.decode_media(resized).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in redecoded)


def test_frame_sample_explodes_by_duration(media):
    frames = mm.frame_sample(media, every_ms=1000)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    videos = {r["media_id"]: r["meta"]["duration_ms"] for r in media.where("media_type = 'video'").collect()}
    assert set(per_media) == set(videos)
    for mid, dur in videos.items():
        assert per_media[mid] == max(1, dur // 1000)
    one = frames.where("media_id = 2 and frame_ix = 0").collect()[0]
    assert len(bytes(one["frame"])) == 32


def test_real_mode_raises(spark, media, monkeypatch):
    monkeypatch.delenv("LIME_SPARK_FAKE_DECODE")
    with pytest.raises(NotImplementedError):
        mm.decode_media(media)


def test_payload_integrity_audit(spark, sf_dir):
    """The no-decode integrity audit: every payload non-empty, unique,
    and counted — computed entirely JVM-side over the binary column."""
    from lime_etl_spark.plans.registry import get

    rows = get("mm_payload_integrity").builder(spark, sf_dir).collect()
    assert {r["media_type"] for r in rows} == {"audio", "image", "video"}
    assert sum(r["n_media"] for r in rows) == 300
    for r in rows:
        assert r["n_empty"] == 0
        assert r["n_distinct_md5"] == r["n_media"]  # synthetic payloads unique
        assert 0 < r["min_bytes"] <= r["max_bytes"]


def test_preprocess_audit_invariants(spark, sf_dir):
    """Both preprocessing legs present, non-empty, and invariant-clean
    (uniform resize dims; >=1 frame per video)."""
    from lime_etl_spark.plans.registry import get

    rows = {r["leg"]: r for r in get("mm_preprocess_audit").builder(spark, sf_dir).collect()}
    assert set(rows) == {"resize_64x64", "frame_sample_1fps"}
    for r in rows.values():
        assert r["n_items"] > 0
        assert r["total_bytes"] > 0
        assert r["n_invariant_violations"] == 0


def test_arrow_decode_equals_pandas_decode(spark):
    """mapInArrow decode must emit exactly the rows the mapInPandas
    decode does — the surfaces differ only in interop overhead."""
    from lime_etl_spark.operators.multimodal import (
        build_media_fixture,
        decode_media,
        decode_media_arrow,
    )

    media = build_media_fixture(spark, n=120)
    a = {r.media_id: r.asDict() for r in decode_media(media, fake=True).collect()}
    b = {r.media_id: r.asDict() for r in decode_media_arrow(media, fake=True).collect()}
    assert a == b
