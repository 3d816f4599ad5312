"""Round-8 operator tests: independent references for the SPRT gate,
character entropy, rich-club ladder, Gumbel top-k, the FLAC
compression profile, off-policy IPS, embedding anisotropy, and
next-event entropy — each beyond the oracle hash-match."""

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
    "ev_offpolicy_ips",
    "emb_dim_variance_audit",
    "ev_next_event_entropy",
    "dedup_minhash_bbit",
    "samp_ks_split_drift",
    "q_theil_decomposition",
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


# --- batch 2: ev_offpolicy_ips ----------------------------------------------------


def test_ips_bracketing_identities(spark, sf_dir):
    """always_treat and always_control partition the users, their IPS
    estimates sum to 2x the logged mean (each user counted once with
    weight 2), and the replayed md5 arms + integer cents match."""
    rows = {r.policy: r for r in i6.ev_offpolicy_ips(spark, sf_dir).collect()}
    t, c = rows["always_treat"], rows["always_control"]
    assert t.n_users == c.n_users
    assert t.n_matched + c.n_matched == t.n_users
    assert t.match_rate + c.match_rate == 1.0
    assert abs((t.ips_value_per_user + c.ips_value_per_user)
               - 2 * t.logged_value_per_user) < 1e-9

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = (
        ev[ev.event_type == "purchase"]
        .assign(c=lambda d: (d.value.astype("float64") * 100).round().astype("int64"))
        .groupby("user_id")["c"].sum()
    )
    users = ev["user_id"].unique()

    def arm(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    ips = sum(2 * int(cents.get(u, 0)) for u in users if arm(u) == 1)
    assert rows["always_treat"].ips_value_per_user == ips / (100.0 * len(users))
    assert rows["always_treat"].n_matched == sum(1 for u in users if arm(u) == 1)


# --- batch 2: emb_dim_variance_audit -----------------------------------------------


def test_dim_variance_numpy_replay(spark, sf_dir):
    import numpy as np

    rows = i6.emb_dim_variance_audit(spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy())
    q = np.floor(mat.astype(np.float64) * (1 << 20)).astype(np.int64)
    n = q.shape[0]
    s = q.sum(axis=0)
    ss = (q * q).sum(axis=0)
    num = n * ss - s * s
    assert len(rows) == mat.shape[1]
    assert abs(sum(r.var_share for r in rows) - 1.0) < 1e-12
    for r in rows:
        d = r.dim
        assert r.n == n
        assert r.mean_value == (float(s[d]) / n) / (1 << 20)
        assert r.variance == (float(num[d]) / (float(n) * n)) / float((1 << 40))
        assert r.var_share == float(num[d]) / float(int(num.sum()))
        assert r.variance >= 0.0


# --- batch 2: ev_next_event_entropy ------------------------------------------------


def test_next_event_entropy_replay_and_bounds(spark, sf_dir):
    rows = {r.event_type: r for r in i6.ev_next_event_entropy(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    trans = (
        pd.DataFrame({"cur": ev["event_type"], "nxt": nxt})
        .dropna()
        .groupby(["cur", "nxt"])
        .size()
    )
    for cur, g in trans.groupby(level=0):
        tot = int(g.sum())
        bits = sum(
            math.floor(int(c) * math.log2(tot / int(c)) * 1_000_000) for c in g
        )
        r = rows[cur]
        assert r.n_transitions == tot
        assert r.n_successors == len(g)
        assert r.next_entropy_bits == bits / (tot * 1_000_000.0)
        assert 0.0 <= r.normalized_entropy <= 1.0


# --- batch 3: dedup_minhash_bbit ----------------------------------------------------


def test_bbit_minhash_reconciles_with_estimate_error(spark, sf_dir):
    """Same candidate pairs as dedup_minhash_estimate_error: pair
    counts and the exact-Jaccard mass must reconcile, the full-width
    leg must reproduce that query's estimator exactly, and the b-bit
    estimator must be the collision-floor-corrected form."""
    rows = {r.leg: r for r in i6.dedup_minhash_bbit(spark, sf_dir).collect()}
    release_tracked_persists()
    cal = all_queries()["dedup_minhash_estimate_error"].builder(spark, sf_dir).collect()
    release_tracked_persists()
    n_pairs = sum(r.n_pairs for r in cal)
    assert {r.n_pairs for r in rows.values()} == {n_pairs}
    assert set(rows) == {"b1", "b2", "b4", "full"}
    # full leg == the calibration table's estimator, aggregated
    est_mass = sum(r.matching_perms * 62500 * r.n_pairs for r in cal)
    assert rows["full"].mean_est_jaccard == est_mass / (n_pairs * 1_000_000.0)
    for r in rows.values():
        assert r.mean_abs_err >= 0.0
        assert -1.0 <= r.mean_est_jaccard <= 1.0
    assert rows["b1"].bits_per_sig == 16
    assert rows["b2"].bits_per_sig == 32
    assert rows["b4"].bits_per_sig == 64
    assert rows["full"].bits_per_sig == 16 * 61
    # exact-Jaccard column is leg-independent (same pairs)
    exacts = {round(r.mean_exact_jaccard, 12) for r in rows.values()}
    assert len(exacts) == 1


# --- batch 4: samp_ks_split_drift ---------------------------------------------------


def test_ks_split_drift_replays_in_pure_python(spark, sf_dir):
    rows = {r.lang: r for r in i6.samp_ks_split_drift(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100

    for lang, g in docs.groupby("lang"):
        tr = sorted(int(v) for d, v in zip(g.doc_id, g.n_chars) if bucket(int(d)) < 80)
        ev = sorted(int(v) for d, v in zip(g.doc_id, g.n_chars) if bucket(int(d)) >= 80)
        n1, n2 = len(tr), len(ev)
        support = sorted(set(tr) | set(ev))
        best, best_v = -1, None
        c1 = c2 = 0
        i = j = 0
        for v in support:
            while i < n1 and tr[i] <= v:
                i += 1
            while j < n2 and ev[j] <= v:
                j += 1
            d = abs(i * n2 - j * n1)
            if d > best:
                best, best_v = d, v
        r = rows[lang]
        assert (r.n_train, r.n_eval) == (n1, n2)
        assert r.d_numerator == best
        assert r.ks_stat == best / (n1 * n2)
        assert r.ks_at_value == best_v
        assert 0.0 <= r.ks_stat <= 1.0


# --- batch 4: q_theil_decomposition -------------------------------------------------


def test_theil_decomposition_identity(spark, sf_dir):
    """Σ share·T_g + Σ between_term must reproduce the corpus Theil-T
    (computed independently in pandas on the exact cents), up to the
    1e-6 ln-floor grid; within-group terms are non-negative up to the
    same grid; shares partition the revenue."""
    rows = i6.q_theil_decomposition(spark, sf_dir).collect()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (
        (orders["o_totalprice"].astype("float64") * 100)
        .round()
        .astype("int64")
        .groupby(orders["o_custkey"])
        .sum()
    )
    n, x = len(cents), int(cents.sum())
    t_total = float(sum((c / x) * math.log(n * c / x) for c in cents))

    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-12
    assert sum(r.n_buyers for r in rows) == n
    got = sum(r.revenue_share * r.theil_within for r in rows) + sum(
        r.theil_between_term for r in rows
    )
    assert abs(got - t_total) < 1e-4  # ln floors contribute <=1e-6 each
    for r in rows:
        assert r.theil_within > -1e-5  # T_g >= 0 up to the floor grid
