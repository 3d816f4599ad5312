"""Unigram-LM (SentencePiece-style) tokenizer training over the
documents corpus — the second production tokenizer family next to BPE
(r8 verdict #7).

The unigram language model (Kudo 2018, public literature) trains a
piece vocabulary the opposite way from BPE: start from a LARGE seed of
candidate substrings, alternate EM (segment the corpus with current
piece scores, re-estimate piece counts from the segmentations) with
PRUNING (drop the least-used pieces), and keep the survivors. This
implementation is the deterministic, oracle-replayable variant:

- **Hard-EM (Viterbi) E-step.** Each word is segmented into its
  single best piece sequence under the current scores; piece usage
  accumulates the EXACT int64 word counts of the winning paths — the
  E-step accumulators are pure integers (stronger than fixed-point:
  no rounding at all), while the 2^20 fixed point lives in the
  SCORES below. Ties break lexicographically on
  (score DESC, n_pieces ASC, boundary_mask ASC); the mask adds bit j
  when a piece starts at offset j, so the tie-break prefers earlier
  long pieces and — because extending a path ORs a bit strictly above
  all present bits — lexicographic optimality composes and the DP is
  exact in both engines.
- **2^20 fixed-point integer log-prob scores.** score(p) =
  ilog2_fp(c_p) − ilog2_fp(Σc) where ilog2_fp is floor(2^20·log2(·))
  computed by the classic shift-and-square INTEGER recurrence
  (normalize the mantissa to [2^30, 2^31), then 20 square-and-
  compare steps — every intermediate fits int64). No libm
  transcendental is ever evaluated on data, so Spark (driver Python
  on the bounded vocab) and DuckDB (the same recurrence unrolled 20
  CTE steps over the distinct-count roster) agree bit-for-bit — the
  SPRT/Lloyd fixed-point discipline extended from constants to
  data-dependent logs.
- **Bounded model state, distributed data.** The only
  data-proportional work is the word-frequency scan (top-V cap like
  BPE). Seed candidates (all substrings up to UNI_MAX_PIECE chars,
  usage-weighted, top UNI_SEED_K + every single char) and per-round
  usage tables are vocab-bounded; they collect to the driver as model
  state (the txt_bpe_train_batched bounded-collect shape) while
  segmentation runs row-parallel in an Arrow-batched pandas UDF with
  the ≤(SEED_K+26)-entry score dict in its closure. At 100 TB the
  plan is identical with a bigger first scan.
- **MATERIALIZED-CTE oracle.** The DuckDB oracle unrolls the full
  run: seed selection, per-round score kernel (20 log steps), the
  16-position Viterbi DP (one CTE per position, ≤UNI_MAX_PIECE join
  legs each), mask→piece decoding, usage aggregation, and the
  prune — training replayed bit-identically, the bpe_oracle_sql /
  unrolled-Lloyd pattern.

Laplace floor: re-estimated counts enter the next round as usage+1,
so pruned-surviving single characters (always kept — coverage) never
hit log(0) and the model stays proper.

Reference parity: lime-etl has no tokenizer training; this extends
the §2G text family beside txt_bpe_train.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

UNI_VOCAB_LIMIT = 1000  # word-frequency cap (the BPE discipline)
UNI_MAX_WORD = 16  # words longer than this are excluded (documented)
UNI_MAX_PIECE = 4  # candidate piece length 1..4
UNI_SEED_K = 64  # seed candidates kept by (count DESC, piece ASC)
UNI_KEEP_K = 40  # vocab kept per prune round (plus all single chars)
UNI_ROUNDS = 2  # EM + prune rounds
FP_BITS = 20  # fixed-point fraction bits of the log2 scores
_MANT = 30  # mantissa normalization bits of the ilog2 kernel


def ilog2_fp(c: int) -> int:
    """floor-ish(2^20 · log2 c) by the shift-and-square integer
    recurrence — EXACTLY the arithmetic the oracle unrolls, so the
    two engines can never disagree on a score. c must be ≥ 1."""
    if c < 1:
        raise ValueError(f"ilog2_fp needs a positive count, got {c}")
    ip = c.bit_length() - 1
    m = c << (_MANT - ip) if ip <= _MANT else c >> (ip - _MANT)
    frac = 0
    for _ in range(FP_BITS):
        m = (m * m) >> _MANT
        frac <<= 1
        if m >= (1 << (_MANT + 1)):
            m >>= 1
            frac |= 1
    return (ip << FP_BITS) | frac


def _viterbi(
    word: str, scores: Dict[str, int], max_piece: int = UNI_MAX_PIECE
) -> Tuple[int, int, int]:
    """Best (score, n_pieces, boundary_mask) segmentation of one word.
    Tie-break (score DESC, n ASC, mask ASC) — identical to the
    oracle's ROW_NUMBER ordering."""
    length = len(word)
    best: List[Tuple[int, int, int] | None] = [None] * (length + 1)
    best[0] = (0, 0, 0)
    for k in range(1, length + 1):
        cand = None
        for j in range(max(0, k - max_piece), k):
            prev = best[j]
            if prev is None:
                continue
            sc = scores.get(word[j:k])
            if sc is None:
                continue
            t = (prev[0] + sc, prev[1] + 1, prev[2] | (1 << j))
            if cand is None or (t[0], -t[1], -t[2]) > (cand[0], -cand[1], -cand[2]):
                cand = t
        best[k] = cand
    got = best[length]
    if got is None:  # unreachable: single chars are always in vocab
        raise ValueError(f"word {word!r} not segmentable")
    return got


def _mask_pieces(word: str, mask: int) -> List[str]:
    starts = [j for j in range(len(word)) if (mask >> j) & 1]
    bounds = starts + [len(word)]
    return [word[bounds[i] : bounds[i + 1]] for i in range(len(starts))]


def _uni_words(docs: DataFrame) -> DataFrame:
    """documents.text → (word, cnt): ^[a-z]+$ words of ≤UNI_MAX_WORD
    chars, top-V by (cnt DESC, word ASC) — the BPE cap, so every later
    round is bounded no matter the corpus size."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$") & (F.length("word") <= UNI_MAX_WORD))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(UNI_VOCAB_LIMIT)
    )


_SUBSTR_EXPR = (
    f"flatten(transform(filter(sequence(1, {UNI_MAX_PIECE}), l -> l <= length(word)), "
    "l -> transform(sequence(0, length(word) - l), i -> substring(word, i + 1, l))))"
)


def _seed_vocab(words: DataFrame) -> List[Tuple[str, int]]:
    """Seed candidates: every substring of length 1..UNI_MAX_PIECE,
    weighted by word count × occurrences; the top UNI_SEED_K by
    (count DESC, piece ASC) plus EVERY single character (coverage —
    they are never pruned either). Collected: ≤ SEED_K + 26 rows of
    model state."""
    cand = (
        words.select(F.explode(F.expr(_SUBSTR_EXPR)).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )
    top = cand.orderBy(F.col("c").desc(), F.col("piece")).limit(UNI_SEED_K)
    singles = cand.where(F.length("piece") == 1)
    rows = top.unionByName(singles).distinct().collect()
    return sorted(((r["piece"], int(r["c"])) for r in rows), key=lambda t: t[0])


def _scores(vocab: List[Tuple[str, int]]) -> Dict[str, int]:
    n = sum(c for _, c in vocab)
    ln = ilog2_fp(n)
    return {p: ilog2_fp(c) - ln for p, c in vocab}


def _segment_usage(words: DataFrame, scores: Dict[str, int]) -> Dict[str, int]:
    """Distributed hard-EM E-step: Viterbi-segment every word
    row-parallel (Arrow-batched pandas UDF, score dict in closure),
    explode pieces, aggregate EXACT int64 usage; collect the
    vocab-bounded usage table."""
    frozen = dict(scores)

    @F.pandas_udf(ArrayType(StringType()))
    def seg(col: pd.Series) -> pd.Series:
        return col.map(
            lambda w: _mask_pieces(w, _viterbi(w, frozen)[2])
        )

    usage = (
        words.select(F.explode(seg(F.col("word"))).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").cast("bigint").alias("usage"))
        .collect()
    )
    return {r["piece"]: int(r["usage"]) for r in usage}


def _prune(
    vocab: List[Tuple[str, int]], usage: Dict[str, int]
) -> List[Tuple[str, int, int]]:
    """Keep the top UNI_KEEP_K pieces by (usage DESC, piece ASC) plus
    every single char; next-round counts are usage+1 (Laplace floor).
    Returns (piece, next_count, usage) sorted by piece."""
    ranked = sorted(vocab, key=lambda t: (-usage.get(t[0], 0), t[0]))
    kept = {p for p, _ in ranked[:UNI_KEEP_K]} | {p for p, _ in vocab if len(p) == 1}
    return sorted(
        (p, usage.get(p, 0) + 1, usage.get(p, 0)) for p, _ in vocab if p in kept
    )


def unigram_train_table(docs: DataFrame, rounds: int = UNI_ROUNDS) -> DataFrame:
    """Train the unigram-LM vocabulary; returns the FINAL vocab, one
    row per surviving piece: (piece, usage, lp_fp) where usage is the
    last E-step's exact hard count and lp_fp the final 2^20
    fixed-point log2 probability (ilog2_fp(usage+1) − ilog2_fp(Σ))."""
    spark = docs.sparkSession
    words = _uni_words(docs).persist()
    words.count()
    vocab = _seed_vocab(words)
    final: List[Tuple[str, int, int]] = []
    for _r in range(rounds):
        usage = _segment_usage(words, _scores(vocab))
        pruned = _prune(vocab, usage)
        vocab = [(p, c) for p, c, _u in pruned]
        final = pruned
    words.unpersist()
    n = sum(c for _p, c, _u in final)
    ln = ilog2_fp(n)
    rows = [(p, u, ilog2_fp(c) - ln) for p, c, u in final]
    out = spark.createDataFrame(rows, "piece string, usage bigint, lp_fp bigint")
    return out.orderBy(F.col("usage").desc(), F.col("piece"))


def unigram_fertility_row(docs: DataFrame, rounds: int = UNI_ROUNDS) -> DataFrame:
    """Segment the corpus once more with the FINAL vocabulary and
    report the tokenizer-budget row: words, char baseline tokens,
    unigram tokens, fertility (ONE double division of exact ints)."""
    spark = docs.sparkSession
    words = _uni_words(docs).persist()
    words.count()
    vocab = _seed_vocab(words)
    for _r in range(rounds):
        usage = _segment_usage(words, _scores(vocab))
        vocab = [(p, c) for p, c, _u in _prune(vocab, usage)]
    frozen = _scores(vocab)

    @F.pandas_udf("int")
    def n_pieces(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _viterbi(w, frozen)[1])

    agg = words.agg(
        F.sum("cnt").cast("bigint").alias("total_words"),
        F.sum(F.col("cnt") * F.length("word")).cast("bigint").alias("char_tokens"),
        F.sum(F.col("cnt") * n_pieces(F.col("word"))).cast("bigint").alias("total_tokens"),
    )
    words.unpersist()
    return agg.select(
        "total_words",
        "char_tokens",
        "total_tokens",
        (F.col("total_tokens").cast("double") / F.col("total_words")).alias(
            "tokens_per_word"
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle — the full training run unrolled
# ---------------------------------------------------------------------------


def _log_kernel_ctes(tag: str, vals_sql: str) -> str:
    """CTE chain computing lp = ilog2_fp(v) for every v in `vals_sql`
    (a query yielding column v): the SAME shift-and-square recurrence,
    20 unrolled steps over the bounded roster. Exposes {tag}_lp(v, lp)."""
    steps = [
        f"""{tag}_in AS MATERIALIZED (
  SELECT v, (SELECT MAX(p.p) FROM pows p WHERE (CAST(1 AS BIGINT) << p.p) <= v) AS ip
  FROM ({vals_sql})),
{tag}_s0 AS MATERIALIZED (
  SELECT v, ip,
    CASE WHEN ip <= {_MANT} THEN v << ({_MANT} - ip) ELSE v >> (ip - {_MANT}) END AS m,
    CAST(0 AS BIGINT) AS frac
  FROM {tag}_in)"""
    ]
    for i in range(1, FP_BITS + 1):
        steps.append(
            f"""{tag}_s{i} AS MATERIALIZED (
  SELECT v, ip,
    CASE WHEN ((m * m) >> {_MANT}) >= (CAST(1 AS BIGINT) << {_MANT + 1})
         THEN ((m * m) >> {_MANT}) >> 1 ELSE (m * m) >> {_MANT} END AS m,
    frac * 2 + CASE WHEN ((m * m) >> {_MANT}) >= (CAST(1 AS BIGINT) << {_MANT + 1})
               THEN 1 ELSE 0 END AS frac
  FROM {tag}_s{i - 1})"""
        )
    steps.append(
        f"{tag}_lp AS (SELECT v, (ip << {FP_BITS}) + frac AS lp FROM {tag}_s{FP_BITS})"
    )
    return ",\n".join(steps)


def _dp_ctes(r: int, score_cte: str, words_cte: str = "wf") -> str:
    """Viterbi DP unrolled over positions 1..UNI_MAX_WORD for round r.
    Exposes seg{r}(word, cnt, mask) — the winning boundary mask per
    word under (score DESC, n ASC, mask ASC)."""
    ctes = [
        f"""d{r}_0 AS MATERIALIZED (
  SELECT word, cnt, CAST(0 AS BIGINT) AS score, 0 AS n, CAST(0 AS BIGINT) AS mask
  FROM {words_cte})"""
    ]
    for k in range(1, UNI_MAX_WORD + 1):
        legs = []
        for j in range(max(0, k - UNI_MAX_PIECE), k):
            legs.append(
                f"""      SELECT d.word, d.cnt, d.score + s.score AS score, d.n + 1 AS n,
             d.mask + (CAST(1 AS BIGINT) << {j}) AS mask
      FROM d{r}_{j} d JOIN {score_cte} s
        ON len(d.word) >= {k} AND s.piece = substr(d.word, {j + 1}, {k - j})"""
            )
        union = "\n      UNION ALL\n".join(legs)
        ctes.append(
            f"""d{r}_{k} AS MATERIALIZED (
  SELECT word, cnt, score, n, mask FROM (
    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY c.word
        ORDER BY c.score DESC, c.n ASC, c.mask ASC) AS rn
    FROM (
{union}
    ) c) WHERE rn = 1)"""
        )
    finals = "\n  UNION ALL ".join(
        f"SELECT word, cnt, mask FROM d{r}_{k} WHERE len(word) = {k}"
        for k in range(1, UNI_MAX_WORD + 1)
    )
    ctes.append(f"seg{r} AS MATERIALIZED (\n  {finals})")
    return ",\n".join(ctes)


def _usage_ctes(r: int) -> str:
    """Decode seg{r} masks to pieces and aggregate exact usage."""
    return f"""sb{r} AS MATERIALIZED (
  SELECT word, cnt, CAST(t.j AS INT) AS j
  FROM seg{r}, UNNEST(range(len(word))) AS t(j)
  WHERE (mask >> CAST(t.j AS INT)) & 1 = 1),
sp{r} AS MATERIALIZED (
  SELECT word, cnt, j,
         LEAD(j, 1, len(word)) OVER (PARTITION BY word ORDER BY j) AS nx
  FROM sb{r}),
u{r} AS MATERIALIZED (
  SELECT substr(word, j + 1, nx - j) AS piece, CAST(SUM(cnt) AS BIGINT) AS usage
  FROM sp{r} GROUP BY 1)"""


def _prune_cte(r: int, prev_vocab: str) -> str:
    return f"""v{r} AS MATERIALIZED (
  SELECT piece, usage + 1 AS c, usage FROM (
    SELECT pv.piece, COALESCE(u{r}.usage, 0) AS usage,
           ROW_NUMBER() OVER (ORDER BY COALESCE(u{r}.usage, 0) DESC, pv.piece) AS rk
    FROM {prev_vocab} pv LEFT JOIN u{r} ON u{r}.piece = pv.piece)
  WHERE rk <= {UNI_KEEP_K} OR len(piece) = 1)"""


def _score_ctes(r: int, vocab_cte: str) -> str:
    """Scores for round r from vocab {vocab_cte}(piece, c):
    lp(c) − lp(Σc) via the log kernel on the distinct-value roster."""
    vals = (
        f"SELECT DISTINCT c AS v FROM {vocab_cte} "
        f"UNION SELECT CAST(SUM(c) AS BIGINT) AS v FROM {vocab_cte}"
    )
    return f"""{_log_kernel_ctes(f"lg{r}", vals)},
s{r} AS MATERIALIZED (
  SELECT vc.piece, lc.lp - ln.lp AS score
  FROM {vocab_cte} vc
  JOIN lg{r}_lp lc ON lc.v = vc.c
  JOIN lg{r}_lp ln ON ln.v = (SELECT CAST(SUM(c) AS BIGINT) FROM {vocab_cte}))"""


def _base_ctes() -> str:
    return f"""pows AS (SELECT CAST(range AS INT) AS p FROM range(63)),
wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE regexp_matches(word, '^[a-z]+$') AND len(word) <= {UNI_MAX_WORD}
  GROUP BY word ORDER BY cnt DESC, word LIMIT {UNI_VOCAB_LIMIT}
),
cand AS MATERIALIZED (
  SELECT substr(word, CAST(t.i AS INT) + 1, CAST(l.l AS INT)) AS piece,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM wf,
       UNNEST(range(1, {UNI_MAX_PIECE} + 1)) AS l(l),
       UNNEST(range(0, len(word))) AS t(i)
  WHERE CAST(t.i AS INT) + CAST(l.l AS INT) <= len(word)
  GROUP BY 1),
seed_top AS (SELECT piece, c FROM cand ORDER BY c DESC, piece LIMIT {UNI_SEED_K}),
v0 AS MATERIALIZED (
  SELECT DISTINCT piece, c FROM (
    SELECT * FROM seed_top
    UNION ALL SELECT piece, c FROM cand WHERE len(piece) = 1))"""


def unigram_oracle_sql(rounds: int = UNI_ROUNDS) -> str:
    """Full unrolled replay of unigram_train_table."""
    parts = [_base_ctes()]
    for r in range(1, rounds + 1):
        parts.append(_score_ctes(r, f"v{r - 1}"))
        parts.append(_dp_ctes(r, f"s{r}"))
        parts.append(_usage_ctes(r))
        parts.append(_prune_cte(r, f"v{r - 1}"))
    parts.append(_log_kernel_ctes(
        "lgf",
        f"SELECT DISTINCT c AS v FROM v{rounds} "
        f"UNION SELECT CAST(SUM(c) AS BIGINT) AS v FROM v{rounds}",
    ))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vf.piece, vf.usage, lc.lp - ln.lp AS lp_fp
FROM v{rounds} vf
JOIN lgf_lp lc ON lc.v = vf.c
JOIN lgf_lp ln ON ln.v = (SELECT CAST(SUM(c) AS BIGINT) FROM v{rounds})
ORDER BY vf.usage DESC, vf.piece"""
    )


def unigram_fertility_oracle_sql(rounds: int = UNI_ROUNDS) -> str:
    """unigram_oracle_sql plus one more scoring + DP pass with the
    final vocabulary, aggregated to the fertility row."""
    parts = [_base_ctes()]
    for r in range(1, rounds + 1):
        parts.append(_score_ctes(r, f"v{r - 1}"))
        parts.append(_dp_ctes(r, f"s{r}"))
        parts.append(_usage_ctes(r))
        parts.append(_prune_cte(r, f"v{r - 1}"))
    fin = rounds + 1
    parts.append(_score_ctes(fin, f"v{rounds}"))
    parts.append(_dp_ctes(fin, f"s{fin}"))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(SUM(cnt) AS BIGINT) AS total_words,
       CAST(SUM(cnt * len(word)) AS BIGINT) AS char_tokens,
       CAST(SUM(cnt * n) AS BIGINT) AS total_tokens,
       CAST(SUM(cnt * n) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS tokens_per_word
FROM (SELECT w.word, w.cnt, d.n
      FROM wf w JOIN (
        {" UNION ALL ".join(f"SELECT word, n FROM d{fin}_{k} WHERE len(word) = {k}" for k in range(1, UNI_MAX_WORD + 1))}
      ) d ON d.word = w.word)"""
    )


@register(
    "txt_unigram_train",
    oracle=unigram_oracle_sql(),
    description="unigram-LM (SentencePiece-style) tokenizer training: seed substrings → hard-EM Viterbi rounds with 2^20 fixed-point integer log2 scores → prune; the full run replayed by an unrolled MATERIALIZED-CTE oracle (16-position DP + 20-step integer log kernel)",
)
def txt_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second production tokenizer trainer (r8 verdict #7) —
    see the module docstring for the full design. Scale: one
    word-frequency shuffle is the only data-proportional job;
    everything else is bounded model state or row-parallel
    Arrow-batched segmentation."""
    return unigram_train_table(load_table(spark, sf_dir, "documents"))


@register(
    "txt_unigram_fertility",
    oracle=unigram_fertility_oracle_sql(),
    description="unigram-LM compression payoff: corpus words, char-baseline tokens, unigram tokens and fertility under the trained vocabulary — the budget row reconciled against the BPE curve in pytest",
)
def txt_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the tokenizer budget buys: corpus fertility under the
    trained unigram vocabulary vs the character baseline; pytest
    reconciles it against txt_bpe_fertility's curve (same corpus,
    comparable vocab budget). One double division of exact ints."""
    return unigram_fertility_row(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# corpus-grain application: per-source segmentation profile
# ---------------------------------------------------------------------------


def unigram_segment_profile(docs: DataFrame, rounds: int = UNI_ROUNDS) -> DataFrame:
    """Apply the trained vocabulary at CORPUS grain: every word
    occurrence in every document is scored through the final model —
    per source, word counts, OOV counts (words outside the trainer's
    frame: non-[a-z], longer than UNI_MAX_WORD, or beyond the top-V
    cap), total pieces, tokenizer-hostile occurrences (≥3 pieces),
    and fertility. The production shape: the corpus-proportional
    explode joins a BROADCAST (word → n_pieces) map derived from the
    bounded distinct-word table, so the only big job is one scan."""
    spark = docs.sparkSession
    words = _uni_words(docs).persist()
    words.count()
    vocab = _seed_vocab(words)
    for _r in range(rounds):
        usage = _segment_usage(words, _scores(vocab))
        vocab = [(p, c) for p, c, _u in _prune(vocab, usage)]
    frozen = _scores(vocab)

    @F.pandas_udf("int")
    def n_pieces(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _viterbi(w, frozen)[1])

    word_n = words.select("word", n_pieces(F.col("word")).alias("n")).persist()
    word_n.count()
    words.unpersist()
    corpus = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    joined = corpus.join(F.broadcast(word_n), "word", "left")
    out = (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.when(F.col("n").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_scored"),
            F.sum(F.when(F.col("n").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.sum(F.coalesce(F.col("n"), F.lit(0)))
            .cast("bigint")
            .alias("total_pieces"),
            F.sum(F.when(F.col("n") >= 3, 1).otherwise(0))
            .cast("bigint")
            .alias("hostile_words"),
        )
        .select(
            "source",
            "n_words",
            "n_scored",
            "n_oov",
            "total_pieces",
            "hostile_words",
            F.when(
                F.col("n_scored") > 0,
                F.col("total_pieces").cast("double") / F.col("n_scored"),
            )
            .otherwise(F.lit(0.0))
            .alias("pieces_per_word"),
        )
        .orderBy("source")
    )
    word_n.unpersist()
    return out


def unigram_segment_profile_oracle_sql(rounds: int = UNI_ROUNDS) -> str:
    """The training replay plus one more scoring+DP pass for the
    word → n_pieces map, joined back to the corpus-grain word
    explode — identical OOV rule (LEFT JOIN miss)."""
    parts = [_base_ctes()]
    for r in range(1, rounds + 1):
        parts.append(_score_ctes(r, f"v{r - 1}"))
        parts.append(_dp_ctes(r, f"s{r}"))
        parts.append(_usage_ctes(r))
        parts.append(_prune_cte(r, f"v{r - 1}"))
    fin = rounds + 1
    parts.append(_score_ctes(fin, f"v{rounds}"))
    parts.append(_dp_ctes(fin, f"s{fin}"))
    word_n = " UNION ALL ".join(
        f"SELECT word, n FROM d{fin}_{k} WHERE len(word) = {k}"
        for k in range(1, UNI_MAX_WORD + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
word_n AS MATERIALIZED ({word_n}),
corpus AS (
  SELECT source, w.word AS word
  FROM documents, UNNEST(string_split(text, ' ')) AS w(word))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(COALESCE(n, 0)) AS BIGINT) AS total_pieces,
       CAST(SUM(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hostile_words,
       CASE WHEN SUM(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END) > 0
            THEN CAST(SUM(COALESCE(n, 0)) AS DOUBLE)
                 / SUM(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END)
            ELSE 0.0 END AS pieces_per_word
FROM corpus LEFT JOIN word_n USING (word)
GROUP BY source
ORDER BY source"""
    )


@register(
    "txt_unigram_segment_profile",
    oracle=unigram_segment_profile_oracle_sql(),
    description="trained unigram vocabulary APPLIED at corpus grain: per source, word/OOV counts, total pieces, tokenizer-hostile share and fertility — one corpus scan joining a broadcast word->pieces map from the bounded trainer",
)
def txt_unigram_segment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The apply-side of the unigram trainer: per-source segmentation
    profile under the final model (see unigram_segment_profile). The
    per-source OOV and hostile-word columns are the routing signal a
    curation pipeline reads (a source whose words won't tokenize is a
    charset/langid problem upstream of dedup)."""
    return unigram_segment_profile(load_table(spark, sf_dir, "documents"))
