"""Batch-6 continuation: hard-negative mining, GROUPING SETS, raw-text
and binary-media ingest sources."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import get
from lime_etl_spark.sources.readers import load_table, read_media_dir, read_text_corpus
from tests.oracle import assert_query_matches_oracle

SET_F = ["ann_hard_negatives", "q_grouping_sets"]


@pytest.mark.parametrize("name", SET_F)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", SET_F)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_hard_negatives_never_same_label(spark, sf_dir):
    rows = get("ann_hard_negatives").builder(spark, sf_dir).collect()
    assert all(r["q_label"] != r["n_label"] for r in rows)
    from lime_etl_spark.operators.similarity import HARD_NEG_K

    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["q_vec_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= HARD_NEG_K


def test_grouping_sets_excludes_grand_total(spark, sf_dir):
    rows = get("q_grouping_sets").builder(spark, sf_dir).collect()
    gids = {r["gid"] for r in rows}
    assert gids == {0, 1, 2}, gids  # pair, region-only, priority-only — no (3) total
    pair_rev = sum(r["revenue"] for r in rows if r["gid"] == 0)
    region_rev = sum(r["revenue"] for r in rows if r["gid"] == 2)
    assert abs(pair_rev - region_rev) < 1e-6  # both partitions of the same total


def test_read_text_corpus_roundtrip(spark, sf_dir, tmp_path):
    """Land documents as raw text files, re-ingest, and the text
    operators must see the same corpus (modulo the content-derived
    ids)."""
    src = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents")
    docs.select("text").coalesce(2).write.text(src)
    corpus = read_text_corpus(spark, src)
    assert corpus.count() == docs.count()
    assert set(corpus.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    # ids deterministic and unique; text preserved exactly
    assert corpus.select("doc_id").distinct().count() == docs.count()
    a = sorted(r["text"] for r in corpus.collect())
    b = sorted(r["text"] for r in docs.collect())
    assert a == b
    again = read_text_corpus(spark, src)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in corpus.collect()
    )


def test_read_media_dir_feeds_decode(spark, tmp_path):
    """Write fixture payloads as files, ingest via binaryFile, and the
    existing decode stage must produce the same per-media dims as
    decoding the in-memory fixture."""
    from lime_etl_spark.operators.multimodal import build_media_fixture, decode_media

    fixture = build_media_fixture(spark, n=24)
    media_dir = str(tmp_path / "media")
    os.makedirs(media_dir)
    for r in fixture.collect():
        ext = {"image": "png", "audio": "wav", "video": "mp4"}[r["media_type"]]
        with open(os.path.join(media_dir, f"m{r['media_id']:05d}.{ext}"), "wb") as f:
            f.write(bytes(r["content"]))

    ingested = read_media_dir(spark, media_dir)
    assert ingested.count() == 24
    got_types = {r["media_type"] for r in ingested.collect()}
    assert got_types == {"image", "audio", "video"}
    assert ingested.where(F.col("n_bytes") <= 0).count() == 0

    # decode path runs unchanged on the ingested payloads
    decoded = decode_media(ingested.select("media_id", "content"))
    assert decoded.count() == 24
    # compare decoded dims (content-determined) against the fixture
    fx = {bytes(r["content"]): (r["meta"]["width"], r["meta"]["height"]) for r in fixture.collect()}
    raw = {bytes(r["content"]): r["media_id"] for r in ingested.collect()}
    assert set(fx) == set(raw), "payload bytes must survive the file round-trip"

    big_only = read_media_dir(spark, media_dir, max_bytes=400)
    assert big_only.count() < 24


def test_media_ids_stable_across_relisting(spark, tmp_path):
    d = str(tmp_path / "m2")
    os.makedirs(d)
    for i in range(3):
        with open(os.path.join(d, f"x{i}.png"), "wb") as f:
            f.write(b"payload" + bytes([i]))
    a = sorted(r["media_id"] for r in read_media_dir(spark, d).collect())
    b = sorted(r["media_id"] for r in read_media_dir(spark, d).collect())
    assert a == b and len(set(a)) == 3
