"""Round-9 operator tests (insights7 + the unigram apply query):
independent pandas replays, the hazard↔survival identity, the
Horvitz-Thompson exactness replay, planted-community modularity, and
the segment-profile↔fertility reconciliation."""

from __future__ import annotations

import pandas as pd
import pytest

from lime_etl_spark.operators import insights7 as i7
from lime_etl_spark.sources.readers import load_table


# --- ev_hazard_rate -----------------------------------------------------------


def test_hazard_matches_independent_pandas_replay(spark, sf_dir):
    rows = i7.ev_hazard_rate(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    spans = ev.groupby("user_id")["d"].agg(["min", "max"])
    maxd = spans["max"].max()
    span_days = (pd.to_datetime(spans["max"]) - pd.to_datetime(spans["min"])).dt.days
    window_days = (pd.to_datetime(maxd) - pd.to_datetime(spans["min"])).dt.days
    for r in rows:
        k = r["day_k"]
        obs = span_days[window_days >= k]
        at_risk = int((obs >= k - 1).sum())
        churned = int((obs == k - 1).sum())
        assert (r["n_at_risk"], r["n_churned"]) == (at_risk, churned), k
        if at_risk:
            assert r["hazard"] == churned / at_risk


def test_hazard_survival_identity_on_planted_cohort(spark, tmp_path):
    """On a fully-observed cohort, S(k) = Π_{j≤k} (1 − h(j)) — the
    defining identity of the discrete-time hazard. Planted spans with
    one long-lived anchor so no user is right-censored on the grid."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 10 users with span 0,1,2,...,9 days; anchor user spans 40 days
    eid = 0
    for u in range(10):
        for day in (0, u):
            eid += 1
            rows.append((eid, t0 + dt.timedelta(days=day), u, "view", 1.0, "{}"))
    rows.append((9001, t0, 99, "view", 1.0, "{}"))
    rows.append((9002, t0 + dt.timedelta(days=40), 99, "view", 1.0, "{}"))
    src = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(f"{src}/events.parquet")
    haz = {r["day_k"]: r for r in i7.ev_hazard_rate(spark, src).collect()}
    surv = 1.0
    n0 = haz[1]["n_at_risk"]
    for k in range(1, 11):
        surv *= 1 - haz[k]["hazard"]
        # survivors after day k = at_risk(k) - churned(k)
        assert round(surv * n0) == haz[k]["n_at_risk"] - haz[k]["n_churned"]


# --- samp_horvitz_thompson ----------------------------------------------------


def test_horvitz_thompson_exact_replay_and_sane_error(spark, sf_dir):
    from lime_etl_spark.functions.text import shingle_int  # noqa: F401 (parity)

    row = i7.samp_horvitz_thompson(spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    true_chars = int(docs["n_chars"].sum())
    assert row["true_chars"] == true_chars
    # the estimator must reconstruct exactly from the sampled rows
    picks = {
        r["doc_id"]: r["n_picks"]
        for r in __import__(
            "lime_etl_spark.operators.training", fromlist=["samp_pps_systematic"]
        ).samp_pps_systematic(spark, sf_dir).collect()
    }
    assert row["n_picked_docs"] == len(picks)
    assert row["n_picks_total"] == sum(picks.values())
    nc = docs.set_index("doc_id")["n_chars"]
    nt = docs.set_index("doc_id")["text"].str.split(" ").str.len()
    ht_e6 = sum(
        ((int(nc[d]) * p * 1_000_000) // int(nt[d])) * row["stride"]
        for d, p in picks.items()
    )
    assert row["ht_chars_e6"] == ht_e6
    # PPS with ~100 picks: design-based error is small, not zero
    assert abs(row["rel_err"]) < 0.2
    assert row["rel_err"] == (ht_e6 - true_chars * 1_000_000) / (
        true_chars * 1_000_000
    )


# --- graph_modularity ---------------------------------------------------------


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{path}/documents.parquet")


def test_modularity_high_for_source_aligned_communities(spark, tmp_path):
    """Two template families, each confined to ONE source → every
    near-dup edge is intra-source → Q at the partition's maximum
    1 − Σ(d_c/2m)²; a third family split ACROSS sources drags Q down
    in the second corpus. Exact expectations recomputed from the
    reported integer columns."""
    fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fam_b = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = []
    for i in range(6):
        rows.append((i, fam_a + f" tail{i}", "en", "src_a", 100))
    for i in range(6, 12):
        rows.append((i, fam_b + f" tail{i}", "en", "src_b", 100))
    p1 = str(tmp_path / "aligned")
    _write_docs(spark, p1, rows)
    out1 = {r["source"]: r for r in i7.graph_modularity(spark, p1).collect()}
    m1 = sum(r["degree_sum"] for r in out1.values()) // 2
    assert m1 > 0
    for r in out1.values():  # all edges intra
        assert 2 * sum(x["intra_edges"] for x in out1.values()) == 2 * m1
    q1 = next(iter(out1.values()))["q_total"]
    want_q1 = sum(
        r["intra_edges"] / m1 - (r["degree_sum"] / (2 * m1)) ** 2
        for r in out1.values()
    )
    assert q1 == pytest.approx(want_q1, abs=1e-12)
    assert q1 > 0.4

    # same families but members alternate sources → zero intra edges
    rows2 = [
        (d, t, lang, ("src_a" if d % 2 == 0 else "src_b"), n)
        for d, t, lang, _s, n in rows
    ]
    p2 = str(tmp_path / "split")
    _write_docs(spark, p2, rows2)
    out2 = list(i7.graph_modularity(spark, p2).collect())
    q2 = out2[0]["q_total"]
    assert q2 < 0  # all edges cross the partition → worse than random
    assert q2 < q1


def test_modularity_identity_on_corpus(spark, sf_dir):
    rows = i7.graph_modularity(spark, sf_dir).collect()
    m2 = sum(r["degree_sum"] for r in rows)
    assert m2 % 2 == 0
    m = m2 // 2
    contrib = sum(r["contrib_x4m2"] for r in rows)
    for r in rows:
        assert r["contrib_x4m2"] == 4 * m * r["intra_edges"] - r["degree_sum"] ** 2
        assert r["q_total"] == contrib / (4 * m * m)


# --- txt_unigram_segment_profile ---------------------------------------------


def test_segment_profile_reconciles_with_fertility(spark, sf_dir):
    """Corpus-grain totals must agree with the word-table fertility
    row whenever the top-V cap does not bind (it never does on the
    fixture corpus): Σ pieces and Σ scored words equal the fertility
    row's totals, and OOV counts exactly the non-[a-z] words."""
    from lime_etl_spark.operators.unigram_lm import (
        txt_unigram_fertility,
        txt_unigram_segment_profile,
    )

    prof = txt_unigram_segment_profile(spark, sf_dir).collect()
    fert = txt_unigram_fertility(spark, sf_dir).collect()[0]
    assert sum(r["total_pieces"] for r in prof) == fert["total_tokens"]
    assert sum(r["n_scored"] for r in prof) == fert["total_words"]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    words = docs["text"].str.split(" ").explode()
    n_oov = int((~words.str.fullmatch("[a-z]{1,16}")).sum())
    assert sum(r["n_oov"] for r in prof) == n_oov
    for r in prof:
        assert r["n_words"] == r["n_scored"] + r["n_oov"]
        if r["n_scored"]:
            assert r["pieces_per_word"] == r["total_pieces"] / r["n_scored"]
