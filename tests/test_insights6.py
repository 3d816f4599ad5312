"""Round-8 operator tests: independent references for the SPRT gate,
character entropy, rich-club ladder, Gumbel top-k and the FLAC
compression profile — each beyond the oracle hash-match."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators import insights6 as i6
from lime_etl_spark.plans.registry import all_queries, release_tracked_persists
from tests.oracle import assert_query_matches_oracle

NEW_KEYS = [
    "ev_sprt_gate",
    "txt_entropy_profile",
    "graph_rich_club",
    "samp_gumbel_topk",
    "mm_flac_compression_profile",
]


@pytest.mark.parametrize("name", NEW_KEYS)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    release_tracked_persists()


# --- ev_sprt_gate -------------------------------------------------------------


def test_sprt_gate_replays_in_pure_python(spark, sf_dir):
    """Replay the full SPRT walk per event type in pandas with the
    same integer constants — decision, crossing index and final LLR
    must match exactly."""
    rows = {r.event_type: r for r in i6.ev_sprt_gate(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for etype, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        llr, cross_n, cross_llr = 0, None, None
        for i, v in enumerate(g["value"], start=1):
            llr += i6.SPRT_INC_POS_E6 if v > i6.SPRT_CUT else i6.SPRT_INC_NEG_E6
            if cross_n is None and (
                llr >= i6.SPRT_UPPER_E6 or llr <= i6.SPRT_LOWER_E6
            ):
                cross_n, cross_llr = i, llr
        r = rows[etype]
        assert r.total_obs == len(g)
        assert r.final_llr_e6 == llr
        if cross_n is None:
            assert r.decision == "continue" and r.n_at_decision == len(g)
        else:
            want = "accept_h1" if cross_llr >= i6.SPRT_UPPER_E6 else "accept_h0"
            assert r.decision == want and r.n_at_decision == cross_n
        assert r.obs_saved_share == r.n_at_decision / r.total_obs


def test_sprt_gate_decides_on_planted_streams(spark, tmp_path):
    """Planted Bernoulli streams must hit each verdict: an all-above-cut
    stream accepts H1 in the minimum ⌈upper/inc⌉ observations, an
    all-below stream accepts H0, and a too-short stream continues. (At
    sf0.01, the driver's correctness scale, all five real event types
    decide — 4x accept_h0, 1x accept_h1.)"""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(60):  # h1: every obs above the cut
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=i), 1, "h1_stream", 99.0, "{}"))
    for i in range(120):  # h0: every obs below
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=i), 2, "h0_stream", 1.0, "{}"))
    for i in range(3):  # continue: too few to cross
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=i), 3, "short_stream", 99.0, "{}"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    got = {r.event_type: r for r in i6.ev_sprt_gate(spark, d).collect()}
    assert got["h1_stream"].decision == "accept_h1"
    assert got["h1_stream"].n_at_decision == -(-i6.SPRT_UPPER_E6 // i6.SPRT_INC_POS_E6)
    assert got["h0_stream"].decision == "accept_h0"
    # first n with n·inc_neg ≤ lower  ⇔  n ≥ lower/inc_neg (both negative)
    assert got["h0_stream"].n_at_decision == math.ceil(
        i6.SPRT_LOWER_E6 / i6.SPRT_INC_NEG_E6
    )
    assert got["short_stream"].decision == "continue"
    assert got["short_stream"].n_at_decision == 3


def test_sprt_constants_are_wald():
    assert i6.SPRT_INC_POS_E6 == math.floor(math.log(0.40 / 0.35) * 1e6)
    assert i6.SPRT_INC_NEG_E6 == math.floor(math.log(0.60 / 0.65) * 1e6)
    assert i6.SPRT_UPPER_E6 == math.floor(math.log(0.95 / 0.05) * 1e6)
    assert i6.SPRT_INC_POS_E6 > 0 > i6.SPRT_INC_NEG_E6


# --- txt_entropy_profile --------------------------------------------------------


def test_entropy_planted_extremes(spark, tmp_path):
    """H = 0 for a single-character doc; exactly 1 bit/char for a
    50/50 two-character doc; ~log2(k) for a uniform k-alphabet doc."""
    docs = spark.createDataFrame(
        [
            (1, "en", "aaaaaaaa"),
            (2, "en", "abababab"),
            (3, "de", "abcdefgh"),
        ],
        "doc_id bigint, lang string, text string",
    )
    d = str(tmp_path / "sf")
    docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r.lang: r for r in all_queries()["txt_entropy_profile"].builder(spark, d).collect()}
    assert rows["en"].min_bits_per_char == 0.0
    assert rows["en"].max_bits_per_char == 1.0  # floor(8*log2(2)*1e6)/8 = 1e6
    assert abs(rows["de"].mean_bits_per_char - 3.0) < 1e-5  # log2(8)


def test_entropy_bounds_on_corpus(spark, sf_dir):
    rows = all_queries()["txt_entropy_profile"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.min_bits_per_char <= r.mean_bits_per_char <= r.max_bits_per_char
        assert r.max_bits_per_char < 8.0  # byte-alphabet ceiling


# --- graph_rich_club -------------------------------------------------------------


def test_rich_club_ladder_identities(spark, sf_dir):
    rows = i6.graph_rich_club(spark, sf_dir).collect()
    release_tracked_persists()
    assert [r.k for r in rows] == sorted(r.k for r in rows)
    # club shrinks (weakly) as k rises; edges never exceed possible
    n_prev, e_prev = None, None
    for r in rows:
        if n_prev is not None:
            assert r.n_nodes <= n_prev and r.n_edges <= e_prev
        n_prev, e_prev = r.n_nodes, r.n_edges
        assert r.possible_edges == r.n_nodes * (r.n_nodes - 1) // 2
        assert 0 <= r.n_edges <= r.possible_edges
        assert 0.0 <= r.phi <= 1.0
        if r.n_nodes >= 2:
            assert r.phi == r.n_edges / r.possible_edges


def test_rich_club_membership_matches_degree_histogram(spark, sf_dir):
    """n_nodes(k) must reconcile with graph_degree_distribution's
    histogram — the two queries share the same verified-pair graph."""
    club = {r.k: r.n_nodes for r in i6.graph_rich_club(spark, sf_dir).collect()}
    release_tracked_persists()
    hist = all_queries()["graph_degree_distribution"].builder(spark, sf_dir).collect()
    release_tracked_persists()
    for k, n_nodes in club.items():
        assert n_nodes == sum(r.n_docs for r in hist if r.degree > k)


# --- samp_gumbel_topk -------------------------------------------------------------


def test_gumbel_topk_replays_in_pure_python(spark, sf_dir):
    """Recompute every key with hashlib/math and confirm the selected
    per-source counts — the cross-engine reproducibility claim."""
    rows = i6.samp_gumbel_topk(spark, sf_dir).collect()
    release_tracked_persists()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs["n_chars"] > 0]

    def key_e6(doc_id: int, w: int) -> int:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        return math.floor((math.log(w) - math.log(-math.log(u))) * 1_000_000)

    keyed = sorted(
        ((key_e6(int(r.doc_id), int(r.n_chars)), -int(r.doc_id), r.source)
         for r in docs.itertuples()),
        reverse=True,
    )[: i6.GUMBEL_K]
    want = pd.Series([s for _k, _d, s in keyed]).value_counts().to_dict()
    got = {r.source: r.n_selected for r in rows if r.n_selected > 0}
    assert got == want
    assert sum(r.n_selected for r in rows) == i6.GUMBEL_K
    assert abs(sum(r.selected_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.char_mass_share for r in rows) - 1.0) < 1e-9


# --- mm_flac_compression_profile ---------------------------------------------------


def test_flac_compression_profile_identities(spark, sf_dir):
    from lime_etl_spark.operators.multimodal import FLAC_FIXTURE_N

    rows = all_queries()["mm_flac_compression_profile"].builder(spark, sf_dir).collect()
    release_tracked_persists()
    assert sum(r.n_clips for r in rows) == FLAC_FIXTURE_N
    assert [r.duration_ms for r in rows] == [500 * i for i in range(1, 11)]
    for r in rows:
        # PCM formula: 2 bytes x 8000 Hz x duration
        assert r.pcm_bytes == r.n_clips * 2 * (8000 * r.duration_ms // 1000)
        assert r.compression_ratio == r.flac_bytes / r.pcm_bytes
        # md5 noise is incompressible but silent windows are free:
        # every class must land strictly below raw PCM plus container
        assert 0.5 < r.compression_ratio < 1.0
