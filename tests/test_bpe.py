"""BPE-merge training tests: planted corpora checked against an
INDEPENDENT pure-Python BPE reference (list-of-symbols
implementation — no marker strings, no `replace`, so a shared
encoding bug between the Spark builder and its SQL oracle cannot
satisfy these)."""

from __future__ import annotations

from collections import Counter

import pytest

from lime_etl_spark.operators.bpe import (
    bpe_batched_oracle_sql,
    bpe_merge_table,
    bpe_merge_table_batched,
    bpe_oracle_sql,
)


def _reference_bpe(word_counts: dict[str, int], rounds: int):
    """Canonical BPE on symbol LISTS: count all adjacent pairs
    (overlaps included), argmax with (count desc, marker-pair asc)
    tie-break, merge greedily left-to-right non-overlapping."""
    vocab = {w: (list(w), c) for w, c in word_counts.items()}
    merges = []
    for r in range(1, rounds + 1):
        counts: Counter = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best = min(
            counts.items(),
            key=lambda kv: (-kv[1], "(" + kv[0][0] + ")(" + kv[0][1] + ")"),
        )
        (a, b), pc = best
        merges.append((r, a, b, a + b, pc))
        for w, (syms, c) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = (out, c)
    return merges


def _docs_df(spark, word_counts: dict[str, int]):
    text = " ".join(w for w, c in sorted(word_counts.items()) for _ in range(c))
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_matches_reference_on_planted_corpus(spark):
    wc = {"lower": 5, "flower": 4, "newest": 6, "widest": 3, "low": 7}
    got = [tuple(r) for r in bpe_merge_table(_docs_df(spark, wc), rounds=6).collect()]
    assert got == _reference_bpe(wc, 6)


def test_overlapping_pairs_merge_greedily():
    # 'aaaa' ×3: pair (a,a) counts 3 positions/word = 9; after merging,
    # each word becomes (aa)(aa); round 2 must merge (aa,aa)
    ref = _reference_bpe({"aaaa": 3}, 2)
    assert ref[0][1:] == ("a", "a", "aa", 9)
    assert ref[1][1:] == ("aa", "aa", "aaaa", 3)


def test_spark_handles_overlaps_like_reference(spark):
    wc = {"aaaa": 3, "aab": 2}
    got = [tuple(r) for r in bpe_merge_table(_docs_df(spark, wc), rounds=3).collect()]
    assert got == _reference_bpe(wc, 3)


def test_boundary_safety_no_cross_symbol_merge(spark):
    # after (t,a)→ta, the pair pattern must NOT match 'ta' inside
    # words where 't' and 'a' belong to different merged symbols;
    # reference list-based semantics define the truth
    wc = {"tata": 8, "atat": 8, "tt": 5, "aa": 5}
    got = [tuple(r) for r in bpe_merge_table(_docs_df(spark, wc), rounds=4).collect()]
    assert got == _reference_bpe(wc, 4)


def test_tie_break_is_lexicographic(spark):
    # equal counts: '(a)(b)' < '(a)(c)' → (a,b) must win
    wc = {"ab": 4, "ac": 4}
    got = bpe_merge_table(_docs_df(spark, wc), rounds=1).collect()[0]
    assert (got["left_sym"], got["right_sym"], got["pair_count"]) == ("a", "b", 4)


def test_early_stop_when_fully_merged(spark):
    # one 2-char word: round 1 merges it; round 2 has no pairs left
    got = bpe_merge_table(_docs_df(spark, {"ab": 3}), rounds=5).collect()
    assert len(got) == 1


def test_non_alpha_words_excluded(spark):
    df = _docs_df(spark, {"zz": 3})
    df2 = spark.createDataFrame(
        [(1, "zz zz zz a1b a1b x9 42")], "doc_id long, text string"
    )
    got = [tuple(r)[1:] for r in bpe_merge_table(df2, rounds=1).collect()]
    want = [tuple(r)[1:] for r in bpe_merge_table(df, rounds=1).collect()]
    assert got == want


def test_oracle_replays_training_on_planted_corpus(spark):
    import duckdb

    wc = {"lower": 5, "flower": 4, "newest": 6, "widest": 3, "low": 7}
    sdf = bpe_merge_table(_docs_df(spark, wc), rounds=6).toPandas()
    con = duckdb.connect()
    text = " ".join(w for w, c in sorted(wc.items()) for _ in range(c))
    con.execute(f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text")
    odf = con.execute(bpe_oracle_sql(rounds=6)).fetchdf()
    assert sdf.values.tolist() == odf.values.tolist()


def _reference_bpe_batched(word_counts: dict[str, int], rounds: int, k: int):
    """INDEPENDENT list-based batched-greedy BPE: per round count all
    adjacent pairs once, walk candidates in (count desc, marker-pair
    asc) order accepting only symbol-disjoint pairs up to k, then
    apply all accepted merges simultaneously (disjointness makes the
    order irrelevant — asserted here by applying in REVERSE acceptance
    order, the opposite of the Spark/SQL implementations)."""
    vocab = {w: (list(w), c) for w, c in word_counts.items()}
    rows = []
    for r in range(1, rounds + 1):
        counts: Counter = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        accepted, used = [], set()
        for (a, b), pc in sorted(
            counts.items(),
            key=lambda kv: (-kv[1], "(" + kv[0][0] + ")(" + kv[0][1] + ")"),
        ):
            if a in used or b in used:
                continue
            accepted.append(((a, b), pc))
            used.update((a, b))
            if len(accepted) == k:
                break
        if not accepted:
            break
        for slot, ((a, b), pc) in enumerate(accepted, start=1):
            rows.append((r, slot, a, b, a + b, pc))
        for (a, b), _pc in reversed(accepted):
            for w, (syms, c) in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = (out, c)
    return rows


def test_batched_matches_reference_on_planted_corpus(spark):
    wc = {"lower": 5, "flower": 4, "newest": 6, "widest": 3, "low": 7, "mist": 2}
    got = [
        tuple(r)
        for r in bpe_merge_table_batched(_docs_df(spark, wc), rounds=3, k=3).collect()
    ]
    assert got == _reference_bpe_batched(wc, 3, 3)


def test_batched_skips_symbol_sharing_pairs(spark):
    # counts: (e,s) from newest+widest = 9, (s,t) = 9, (n,e) = 6 ...
    # (e,s) wins round 1 slot 1 on tie-break; (s,t) shares 's' and must
    # be SKIPPED; slot 2 falls to the best disjoint pair
    wc = {"newest": 6, "widest": 3}
    got = bpe_merge_table_batched(_docs_df(spark, wc), rounds=1, k=2).collect()
    assert (got[0]["left_sym"], got[0]["right_sym"], got[0]["pair_count"]) == ("e", "s", 9)
    assert got[1]["left_sym"] not in ("e", "s") and got[1]["right_sym"] not in ("e", "s")
    assert [tuple(r) for r in got] == _reference_bpe_batched(wc, 1, 2)


def test_batched_oracle_replays_training(spark):
    import duckdb

    wc = {"lower": 5, "flower": 4, "newest": 6, "widest": 3, "low": 7, "mist": 2}
    sdf = bpe_merge_table_batched(_docs_df(spark, wc), rounds=3, k=3).toPandas()
    con = duckdb.connect()
    text = " ".join(w for w, c in sorted(wc.items()) for _ in range(c))
    con.execute(f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text")
    odf = con.execute(bpe_batched_oracle_sql(rounds=3, k=3)).fetchdf()
    assert sdf.values.tolist() == odf.values.tolist()


def test_batched_early_stop_when_fully_merged(spark):
    got = bpe_merge_table_batched(_docs_df(spark, {"ab": 3}), rounds=5, k=4).collect()
    assert len(got) == 1
    assert (got[0]["round"], got[0]["slot"]) == (1, 1)


def test_batched_covers_more_merges_per_round_trip(spark):
    """The scale claim: rounds*k batched merges vs rounds classic
    merges for the same number of driver round-trips; the merged
    vocabularies agree with each independent reference."""
    wc = {"lower": 5, "flower": 4, "newest": 6, "widest": 3, "low": 7}
    batched = bpe_merge_table_batched(_docs_df(spark, wc), rounds=2, k=4).collect()
    classic = bpe_merge_table(_docs_df(spark, wc), rounds=2).collect()
    assert len(batched) > len(classic)


def test_vocab_limit_is_deterministic(spark):
    # limit cuts on (cnt DESC, word ASC): with limit 2 of three equal-
    # count words, the two lexicographically smallest survive
    df = spark.createDataFrame([(0, "xy xy zy zy ay ay")], "doc_id long, text string")
    got = bpe_merge_table(df, rounds=1, vocab_limit=2).collect()[0]
    # surviving vocab {ay, xy}: best pair is (a,y) on tie-break
    assert (got["left_sym"], got["right_sym"]) == ("a", "y")
    assert got["pair_count"] == 2


def _reference_fertility(word_counts: dict[str, int], rounds: int):
    """Fertility rows derived from the independent list-based
    reference: re-run reference merges, measuring after each round."""
    vocab = {w: (list(w), c) for w, c in word_counts.items()}

    def measure(r):
        syms = set()
        toks = wrds = 0
        for s, c in vocab.values():
            syms.update(s)
            toks += c * len(s)
            wrds += c
        return (r, len(syms), wrds, toks, toks / wrds)

    rows = [measure(0)]
    merges = _reference_bpe(word_counts, rounds)
    mi = 0
    for r in range(1, rounds + 1):
        if mi < len(merges):
            _r, a, b, _m, _pc = merges[mi]
            mi += 1
            for w, (s, c) in vocab.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                vocab[w] = (out, c)
        rows.append(measure(r))
    return rows


def test_fertility_matches_reference(spark):
    from lime_etl_spark.operators.bpe import bpe_fertility_table

    wc = {"lower": 5, "flower": 4, "newest": 6, "widest": 3, "low": 7}
    got = [tuple(r) for r in bpe_fertility_table(_docs_df(spark, wc), rounds=5).collect()]
    want = _reference_fertility(wc, 5)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], abs=1e-12)


def test_fertility_invariants(spark):
    from lime_etl_spark.operators.bpe import bpe_fertility_table

    wc = {"abcd": 4, "bcda": 3, "dcba": 2}
    rows = bpe_fertility_table(_docs_df(spark, wc), rounds=4).collect()
    assert rows[0]["total_tokens"] == sum(len(w) * c for w, c in wc.items())
    assert len({r["total_words"] for r in rows}) == 1
    toks = [r["total_tokens"] for r in rows]
    assert all(a >= b for a, b in zip(toks, toks[1:]))  # monotone compression
    assert all(rows[i + 1]["vocab_syms"] <= rows[i]["vocab_syms"] + 1 for i in range(len(rows) - 1))


def test_fertility_flattens_at_fixpoint_like_oracle(spark):
    import duckdb

    from lime_etl_spark.operators.bpe import bpe_fertility_oracle_sql, bpe_fertility_table

    wc = {"ab": 3}  # fully merged after round 1; rounds 2-3 flatten
    sdf = bpe_fertility_table(_docs_df(spark, wc), rounds=3).toPandas()
    assert len(sdf) == 4
    assert sdf["total_tokens"].tolist() == [6, 3, 3, 3]
    con = duckdb.connect()
    text = " ".join(["ab"] * 3)
    con.execute(f"CREATE VIEW documents AS SELECT 0 AS doc_id, '{text}' AS text")
    odf = con.execute(bpe_fertility_oracle_sql(rounds=3)).fetchdf()
    assert sdf.values.tolist() == odf.values.tolist()
