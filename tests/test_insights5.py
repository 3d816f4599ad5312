"""Round-7 operator tests: CUSUM changepoint, RAKE keywords, Holm SRM
gate, winnowing fingerprints, k-center coreset, per-vertex local
clustering, and the A/V bitrate budget. Each operator gets its oracle
match plus an INDEPENDENT reference (pure-Python/pandas recompute or
an analytic identity) so a shared Spark/SQL misreading can't slip
through both sides."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest

from lime_etl_spark.operators import insights5 as i5
from lime_etl_spark.plans.registry import get, release_tracked_persists
from tests.oracle import assert_query_matches_oracle

R7_QUERIES = [
    "ev_changepoint_cusum",
    "txt_rake_scores",
    "ev_srm_holm",
    "dedup_winnowing_overlap",
    "samp_kcenter_coreset",
    "graph_local_clustering",
    "mm_av_bitrate_budget",
]


@pytest.mark.parametrize("name", R7_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    release_tracked_persists()


# --- ev_changepoint_cusum ------------------------------------------------------


def test_cusum_matches_independent_pandas_reference(spark, sf_dir):
    rows = i5.ev_changepoint_cusum(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.assign(d=ev["ts"].dt.date)
        .groupby(["event_type", "d"])
        .size()
        .rename("x")
        .reset_index()
        .sort_values(["event_type", "d"])
    )
    for r in rows:
        g = daily[daily["event_type"] == r.event_type]
        n, t = len(g), int(g["x"].sum())
        assert (r.n_days, r.total_events) == (n, t)
        s = (n * g["x"] - t).cumsum()
        best = max(zip(s.abs(), [-i for i in range(len(s))], s, g["d"]))
        assert r.s_at_cp == int(best[2]) and r.cp_date == best[3]
        assert r.excursion_share == abs(int(best[2])) / (n * t)
        assert 0.0 <= r.excursion_share < 1.0
    # CUSUM path sums to zero by construction: the final prefix is N*T - N*T
    assert {r.event_type for r in rows} == set(daily["event_type"])


# --- txt_rake_scores -----------------------------------------------------------


def test_rake_matches_independent_pandas_reference(spark, sf_dir):
    rows = i5.txt_rake_scores(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    stop = set(i5.RAKE_STOPWORDS)
    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for text in docs["text"]:
        phrase: list[str] = []
        for w in text.split(" ") + [""]:
            if w.isalpha() and w.islower() and w not in stop:
                phrase.append(w)
            else:
                for pw in phrase:
                    freq[pw] = freq.get(pw, 0) + 1
                    degree[pw] = degree.get(pw, 0) + len(phrase)
                phrase = []
    ranked = sorted(
        ((degree[w] / freq[w], freq[w], w) for w in freq),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[: i5.RAKE_TOP_K]
    assert [(r.word, r.freq, r.degree) for r in rows] == [
        (w, f, round(s * f)) for s, f, w in ranked
    ]
    for r in rows:
        assert r.rake_score == r.degree / r.freq >= 1.0
        assert r.word not in stop


# --- ev_srm_holm ---------------------------------------------------------------


def test_chi2_bisection_reproduces_published_critical_values():
    assert i5._chi2_crit_milli(0.05) == 3841  # the ev_srm_check constant
    assert i5._chi2_crit_milli(0.01) == 6635
    assert i5._chi2_crit_milli(0.025) == 5024


def test_holm_consistency_with_raw_srm(spark, sf_dir):
    from lime_etl_spark.operators.insights4 import ev_srm_check

    holm = {r.exp_id: r for r in i5.ev_srm_holm(spark, sf_dir).collect()}
    raw = {r.exp_id: r for r in ev_srm_check(spark, sf_dir).collect()}
    assert set(holm) == set(raw)
    # same statistics; Holm is strictly more conservative than the
    # fixed 95% gate (every Holm crit >= 3841)
    for e, h in holm.items():
        assert h.chi_square == raw[e].chi_square
        assert h.crit_milli >= 3841
        if h.holm_reject:
            assert raw[e].srm_flag
    # rank is a permutation; crits non-increasing in alpha => the
    # rank-1 (largest statistic) test is the most stringent
    ranks = sorted((h.holm_rank, h.crit_milli, bool(h.holm_reject)) for h in holm.values())
    assert [r[0] for r in ranks] == list(range(1, len(ranks) + 1))
    assert all(ranks[i][1] >= ranks[i + 1][1] for i in range(len(ranks) - 1))
    # step-down: once a rank accepts, every later rank accepts
    rejected = [r[2] for r in ranks]
    assert rejected == sorted(rejected, reverse=True)


# --- dedup_winnowing_overlap ----------------------------------------------------


def _py_winnow(text: str) -> set[int]:
    """Independent pure-Python winnowing (robust variant: distinct
    window-min hash VALUES), mirroring the operator's md5-bridge."""
    k, w = i5.WINNOW_K, i5.WINNOW_W
    hs = [
        int(hashlib.md5(text[p : p + k].encode()).hexdigest()[:15], 16)
        for p in range(len(text) - k + 1)
    ]
    return {min(hs[max(0, j - w + 1) : j + 1]) for j in range(len(hs))}


def test_winnowing_matches_independent_python_reference(spark, sf_dir):
    rows = i5.dedup_winnowing_overlap(spark, sf_dir).collect()
    release_tracked_persists()
    assert rows, "fixture corpus has near-dup docs; expected overlap pairs"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")["text"]
    # df-cut replay over the whole corpus (needed for exact counts)
    from collections import Counter

    fps = {int(d): _py_winnow(t) for d, t in docs.items() if len(t) >= i5.WINNOW_K}
    df = Counter(f for s in fps.values() for f in s)
    kept = {d: {f for f in s if df[f] <= i5.WINNOW_DF_CUT} for d, s in fps.items()}
    for r in rows[:5]:
        sa, sb = kept[r.doc_a], kept[r.doc_b]
        assert (len(sa), len(sb)) == (r.n_fp_a, r.n_fp_b)
        assert len(sa & sb) == r.shared_fp
        assert r.fp_jaccard == r.shared_fp / (r.n_fp_a + r.n_fp_b - r.shared_fp)


def test_winnowing_guarantee_shared_span_shares_fingerprint():
    """The winnowing theorem: any shared substring of length >= w+k-1
    yields at least one common fingerprint."""
    span = "sharedspanofcharacters"  # len 22 >= 8+6-1
    a = "aaaaaaaaaa" + span + "bbbbbbbbbb"
    b = "cccccccccc" + span + "dddddddddd"
    assert _py_winnow(a) & _py_winnow(b)


# --- samp_kcenter_coreset -------------------------------------------------------


def test_kcenter_matches_independent_python_greedy(spark, sf_dir):
    rows = i5.samp_kcenter_coreset(spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.itertuples()
    }

    def dot(x, y):
        acc = 0.0
        for p, q in zip(x, y):
            acc = acc + p * q
        return acc

    def d2(x, y):
        return dot(x, x) - 2 * dot(x, y) + dot(y, y)

    first = min(vecs)
    chosen = [first]
    mind = {v: d2(vecs[v], vecs[first]) for v in vecs}
    expect = [(1, first, 0.0, max(mind.values()))]
    for k in range(2, i5.KCENTER_K + 1):
        far = max(vecs, key=lambda v: (mind[v], -v))
        sel = mind[far]
        chosen.append(far)
        mind = {v: min(mind[v], d2(vecs[v], vecs[far])) for v in vecs}
        expect.append((k, far, sel, max(mind.values())))
    got = [(r.k, r.center_id, r.sel_dist_sq, r.coverage_after_sq) for r in rows]
    assert got == expect
    # greedy invariants: selection distances non-increasing; the
    # coverage radius after k centers IS the (k+1)th selection distance
    sels = [r.sel_dist_sq for r in rows][1:]
    assert sels == sorted(sels, reverse=True)
    for i in range(len(rows) - 1):
        assert rows[i].coverage_after_sq == rows[i + 1].sel_dist_sq
    assert len({r.center_id for r in rows}) == i5.KCENTER_K


# --- graph_local_clustering -----------------------------------------------------


def test_local_clustering_bounds_and_order(spark, sf_dir):
    from lime_etl_spark.operators.graph import graph_local_clustering

    rows = graph_local_clustering(spark, sf_dir).collect()
    release_tracked_persists()
    for r in rows:
        assert r.deg >= 2 and r.n_tri >= 1
        assert r.local_clustering == 2 * r.n_tri / (r.deg * (r.deg - 1))
        assert 0.0 < r.local_clustering <= 1.0
    keys = [(-r.local_clustering, r.doc_id) for r in rows]
    assert keys == sorted(keys)


# --- mm_av_bitrate_budget -------------------------------------------------------


def test_av_bitrate_budget_analytic_rows(spark, sf_dir):
    rows = {r.codec: r for r in get("mm_av_bitrate_budget").builder(spark, sf_dir).collect()}
    assert set(rows) == {"mp3", "mp4v", "vorbis"}
    for r in rows.values():
        assert r.avg_kbps == 8 * r.total_bytes / r.total_duration_ms
        assert r.min_duration_ms <= r.max_duration_ms
    # CBR MP3 at 128 kbps: 576 bytes per 36 ms frame => exactly 128.0
    assert rows["mp3"].avg_kbps == 128.0
    assert math.isclose(rows["vorbis"].avg_kbps, 8 * rows["vorbis"].total_bytes / rows["vorbis"].total_duration_ms)


# --- dedup_lsh_bucket_cap_audit --------------------------------------------------


def test_lsh_bucket_cap_audit_identities(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "dedup_lsh_bucket_cap_audit")
    rows = i5.dedup_lsh_bucket_cap_audit(spark, sf_dir).collect()
    # size classes partition the buckets; class k holds sizes [2^k, 2^(k+1))
    for r in rows:
        assert r.capped_pairs <= r.cand_pairs
        assert 0.0 <= r.dropped_share < 1.0
        if (1 << r.size_class) <= i5.LSH_BUCKET_CAP:
            # whole class under the cap: nothing dropped
            if (1 << (r.size_class + 1)) - 1 <= i5.LSH_BUCKET_CAP:
                assert r.dropped_share == 0.0
    # total bucket rows = |docs| x N_BANDS (every doc lands in every band)
    from lime_etl_spark.operators.dedup import N_BANDS
    import pandas as pd

    n_docs = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    assert sum(r.n_bucket_rows for r in rows) == n_docs * N_BANDS


# --- emb_hubness_audit ------------------------------------------------------------


def test_hubness_audit_identities(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "emb_hubness_audit")
    from lime_etl_spark.operators.insights2 import MUTUAL_K, MUTUAL_TARGET

    rows = i5.emb_hubness_audit(spark, sf_dir).collect()
    release_tracked_persists()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mod = max(1, len(emb) // MUTUAL_TARGET)
    n_shard = int((emb["vec_id"] % mod == 0).sum())
    # the histogram partitions the shard (antihubs included)
    assert sum(r.n_points for r in rows) == n_shard
    # total k-occurrence mass = k edges per query point
    assert sum(r.k_occurrence * r.n_points for r in rows) == n_shard * MUTUAL_K
    for r in rows:
        assert r.share == r.n_points / n_shard


# --- ev_ab_interaction_check ------------------------------------------------------


def test_interaction_check_identities(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_ab_interaction_check")
    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS, ev_srm_check

    rows = i5.ev_ab_interaction_check(spark, sf_dir).collect()
    m = SRM_EXPERIMENTS
    assert len(rows) == m * (m - 1) // 2
    srm = {r.exp_id: (r.users_a, r.users_b) for r in ev_srm_check(spark, sf_dir).collect()}
    for r in rows:
        # 2x2 margins must reproduce the per-experiment SRM counts
        assert (r.n00 + r.n01, r.n10 + r.n11) == srm[r.exp_a]
        assert (r.n00 + r.n10, r.n01 + r.n11) == srm[r.exp_b]
        n = r.n00 + r.n01 + r.n10 + r.n11
        det = r.n00 * r.n11 - r.n01 * r.n10
        assert r.chi_square == (float(n) * det * det) / (
            float(r.n00 + r.n01) * (r.n10 + r.n11) * (r.n00 + r.n10) * (r.n01 + r.n11)
        )
        assert r.interaction_flag == (r.chi_square > 3.841)
    # independent md5 salts per experiment: individual 5% tests over
    # C(8,2)=28 pairs expect ~1.4 false flags — demand only that the
    # count stays in the plausible binomial(28, 0.05) range
    # (P(>6) < 1e-4), i.e. nothing SYSTEMATICALLY correlated
    assert sum(r.interaction_flag for r in rows) <= 6
