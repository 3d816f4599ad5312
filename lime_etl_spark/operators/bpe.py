"""Distributed BPE-merge training over the documents corpus.

Byte-pair encoding (Gage 1994; Sennrich et al. 2016 for subword NLP —
public literature) is THE tokenizer-training algorithm of LLM data
pipelines, and its training loop is the classic "model state to the
driver, data stays distributed" shape this repo already uses for
Lloyd k-means (functions/clustering.py) and PageRank
(operators/graph.py):

- **Tokenize + count once.** The only data-proportional work is one
  scan of `documents` → word-frequency table (split, filter,
  groupBy word). Map-side combine means each task emits at most
  |vocab| partial rows; the shuffled table is bounded by vocabulary
  size, not corpus size. A deterministic top-V cap
  (count DESC, word ASC, V=1000) bounds every later round no matter
  how big the corpus is — at 100 TB this is the same plan with a
  bigger first scan.
- **Iterate on the bounded vocab table.** Each merge round explodes
  adjacent symbol pairs of ≤V weighted words (a few thousand rows),
  aggregates exact int64 pair counts, and collects ONE row — the
  argmax pair — to the driver as model state. The merge is applied
  as a string `replace` on the symbol column; round r+1 recomputes
  pairs from the updated symbols.
- **Exactness / SQL replayability.** Pair counts are int64 sums of
  int64 word counts (order-free); the argmax tie-breaks on
  (count DESC, pair ASC) over ASCII strings — identical binary
  collation in Spark and DuckDB — so the full 10-round training run
  is replayed bit-identically by an unrolled CTE chain
  (`bpe_oracle_sql`), the same pattern that converted trained-Lloyd
  IVF and PageRank to hash-matched oracles.

Symbol strings delimit EVERY symbol on BOTH sides:
"table" → "(t)(a)(b)(l)(e)", so a pair pattern ``(x)(y)`` can only
match two exact whole symbols. A prefix-guard-only scheme (marker
before each symbol) is genuinely wrong — pattern ``_at_a`` matches
inside ``_at_at`` because the right symbol ``a`` is a prefix of the
following symbol ``at``; the independent-reference pytest
(test_boundary_safety_no_cross_symbol_merge) catches exactly that.
Fully-delimited symbols also make plain left-to-right
non-overlapping ``replace`` — the same semantics in Spark and
DuckDB — implement the canonical greedy BPE merge: adjacent merges
share no delimiter chars, so "(a)(a)(a)(a)" → "(aa)(aa)". Words are
restricted to ``^[a-z]+$`` so delimiter bytes cannot collide with
symbol bytes.

Reference parity: lime-etl has no tokenizer training; this extends
the §2G/§2K text family (txt_token_count, cur_tokenizer_fertility)
with the trainer that produces the merges those ops consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

BPE_ROUNDS = 10
BPE_VOCAB_LIMIT = 1000
# Batched trainer: merges per round. 4 rounds x 4 disjoint merges
# covers 16 merges in 4 driver round-trips (vs 16 for the classic
# trainer) — the shape that scales to production merge counts.
BPE_BATCH_ROUNDS = 4
BPE_BATCH_K = 4
# Classic trainer extrapolation contract: each merge costs ONE driver
# round-trip (a 1-row argmax collect) and ONE lineage node. Fine at
# the registered 10 rounds; a production 30-50k-merge tokenizer should
# use the batched trainer below (k merges per round-trip) — lineage is
# additionally truncated every _CHECKPOINT_EVERY rounds so neither
# trainer's plan depth grows unboundedly with rounds.
_CHECKPOINT_EVERY = 16
# Batched trainer cadence, MEASURED at 48 rounds x k=8 on a 50k-word
# vocab (tools/scale_bench.py bpe leg, r7): each round nests k
# replace() calls into the plan, so analysis cost grows k x faster
# than the classic trainer's — every=16 bent the per-round curve 1.40x
# (122.7 s), every=8 was flat but paid 94.0 s, every=2 won at 69.7 s
# (ratio 1.11), every=1 over-materialized (78.4 s). Checkpointing the
# vocab-bounded words table is cheap; k nested replaces per round are
# not.
_BATCH_CHECKPOINT_EVERY = 2


def _word_symbols(docs: DataFrame, vocab_limit: int) -> DataFrame:
    """documents.text → (sym, cnt): top-V word frequencies with each
    word exploded into marker-prefixed single-char symbols."""
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(vocab_limit)
    )
    return words.select(
        F.regexp_replace("word", "(.)", "($1)").alias("sym"), "cnt"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts (delimited form '(a)(b)'),
    weighted by word frequency; exact int64."""
    parts = words.select(
        F.split(F.expr("btrim(sym, '()')"), "\\)\\(").alias("parts"), "cnt"
    )
    pairs = parts.select(
        F.explode(
            F.expr(
                "CASE WHEN size(parts) >= 2 THEN "
                "transform(sequence(0, size(parts)-2), "
                "i -> concat('(', parts[i], ')(', parts[i+1], ')')) "
                "ELSE CAST(array() AS array<string>) END"
            )
        ).alias("pair"),
        "cnt",
    )
    return pairs.groupBy("pair").agg(F.sum("cnt").cast("bigint").alias("pc"))


def bpe_merge_table(
    docs: DataFrame, rounds: int = BPE_ROUNDS, vocab_limit: int = BPE_VOCAB_LIMIT
) -> DataFrame:
    """Train `rounds` BPE merges; returns one row per round:
    (round, left_sym, right_sym, merged, pair_count)."""
    spark = docs.sparkSession
    base = _word_symbols(docs, vocab_limit).persist()
    base.count()
    words = base
    results = []
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("pc").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:  # vocabulary fully merged
            break
        pair, pc = best[0]["pair"], int(best[0]["pc"])
        left, right = pair[1:-1].split(")(")
        merged = "(" + left + right + ")"
        results.append((r, left, right, left + right, pc))
        words = words.select(
            F.replace(F.col("sym"), F.lit(pair), F.lit(merged)).alias("sym"),
            "cnt",
        )
        if r % _CHECKPOINT_EVERY == 0:
            # bound plan depth: without this, `replace` lineage grows
            # one node per merge and a 50k-merge run would carry a
            # 50k-deep plan (r5 verdict #5)
            words = words.localCheckpoint()
    # every result row is already collected — the merge table below
    # does not read the persisted word-freq table
    base.unpersist()
    out = spark.createDataFrame(
        results, "round int, left_sym string, right_sym string, merged string, pair_count bigint"
    )
    return out.orderBy("round")


def bpe_oracle_sql(rounds: int = BPE_ROUNDS, vocab_limit: int = BPE_VOCAB_LIMIT) -> str:
    """Unrolled CTE replay of bpe_merge_table for DuckDB — identical
    word-freq cap, pair counting, argmax tie-break, and left-to-right
    non-overlapping replace per round."""
    ctes = [
        f"""wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE regexp_matches(word, '^[a-z]+$')
  GROUP BY word ORDER BY cnt DESC, word LIMIT {vocab_limit}
)""",
        r"""w0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', '(\1)', 'g') AS sym, cnt FROM wf)""",
    ]
    finals = []
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT '(' || parts[i] || ')(' || parts[i+1] || ')' AS pair,
         CAST(SUM(cnt) AS BIGINT) AS pc
  FROM (SELECT parts, cnt, unnest(range(1, len(parts))) AS i
        FROM (SELECT string_split(trim(sym, '()'), ')(') AS parts, cnt FROM {prev}))
  GROUP BY 1
)"""
        )
        ctes.append(f"b{r} AS MATERIALIZED (SELECT pair, pc FROM p{r} ORDER BY pc DESC, pair LIMIT 1)")
        ctes.append(
            f"""w{r} AS MATERIALIZED (
  SELECT replace(sym, (SELECT pair FROM b{r}),
                 (SELECT '(' || replace(trim(pair, '()'), ')(', '') || ')' FROM b{r})) AS sym,
         cnt
  FROM {prev}
)"""
        )
        finals.append(
            f"""SELECT CAST({r} AS INTEGER) AS round,
       string_split(trim(pair, '()'), ')(')[1] AS left_sym,
       string_split(trim(pair, '()'), ')(')[2] AS right_sym,
       replace(trim(pair, '()'), ')(', '') AS merged,
       pc AS pair_count
FROM b{r}"""
        )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(finals)
        + "\n) ORDER BY round"
    )


@register(
    "txt_bpe_train",
    oracle=bpe_oracle_sql(),
    description="BPE tokenizer training: 10 merge rounds over the documents word-freq table, bit-replayed by an unrolled CTE oracle",
)
def txt_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-training capstone of the text family: learn the
    first 10 BPE merges from the corpus. See module docstring for the
    100 TB argument (one corpus-proportional shuffle, then bounded
    per-round work with one-row model-state collects)."""
    return bpe_merge_table(load_table(spark, sf_dir, "documents"))


def _greedy_disjoint(
    pairs: list[tuple[str, int]], k: int
) -> list[tuple[str, int]]:
    """Greedy top-k SYMBOL-DISJOINT selection over (pair, count) rows:
    walk candidates in (count DESC, pair ASC) order, accept a pair iff
    neither of its symbols appears in an already-accepted pair of this
    batch. Disjoint symbols => the k `replace` applications can never
    overlap positionally, so they commute and equal a simultaneous
    batch merge. Identical to the oracle's unrolled argmax chain:
    accept j is the argmax over pairs disjoint from accepts 1..j-1."""
    accepted: list[tuple[str, int]] = []
    used: set[str] = set()
    for pair, pc in sorted(pairs, key=lambda t: (-t[1], t[0])):
        left, right = pair[1:-1].split(")(")
        if left in used or right in used:
            continue
        accepted.append((pair, pc))
        used.update((left, right))
        if len(accepted) == k:
            break
    return accepted


def bpe_merge_table_batched(
    docs: DataFrame,
    rounds: int = BPE_BATCH_ROUNDS,
    k: int = BPE_BATCH_K,
    vocab_limit: int = BPE_VOCAB_LIMIT,
    on_round=None,
) -> DataFrame:
    """Batched BPE training: per round, collect the FULL pair-count
    table (bounded by the capped vocabulary — a few thousand rows of
    model state, never corpus-proportional), pick the top-k
    symbol-disjoint pairs driver-side, and apply all k merges in ONE
    select. k merges per driver round-trip and per lineage node is
    what makes production merge counts (30-50k) feasible where the
    classic trainer's one-collect-per-merge loop is not (r5 verdict
    #5). Returns (round, slot, left_sym, right_sym, merged,
    pair_count) — slot = acceptance order within the round.

    ``on_round(r, seconds)`` (optional) is invoked after each round's
    collect — the hook tools/scale_bench.py's bpe leg uses to measure
    that seconds-per-merge-round stays FLAT to 512+ merges under the
    _BATCH_CHECKPOINT_EVERY lineage-truncation cadence (r6 verdict
    #4); a round's wall includes the previous round's lazily-applied
    merges, which is exactly the per-round marginal cost."""
    import time as _time

    spark = docs.sparkSession
    base = _word_symbols(docs, vocab_limit).persist()
    base.count()
    words = base
    results = []
    for r in range(1, rounds + 1):
        t0 = _time.perf_counter()
        pair_rows = [(row["pair"], int(row["pc"])) for row in _pair_counts(words).collect()]
        batch = _greedy_disjoint(pair_rows, k)
        if not batch:
            break
        col = F.col("sym")
        for slot, (pair, pc) in enumerate(batch, start=1):
            left, right = pair[1:-1].split(")(")
            results.append((r, slot, left, right, left + right, pc))
            col = F.replace(col, F.lit(pair), F.lit("(" + left + right + ")"))
        words = words.select(col.alias("sym"), "cnt")
        if r % _BATCH_CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint()
        if on_round is not None:
            on_round(r, _time.perf_counter() - t0)
    base.unpersist()
    out = spark.createDataFrame(
        results,
        "round int, slot int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )
    return out.orderBy("round", "slot")


def _sql_pair_syms(alias: str) -> tuple[str, str]:
    return (
        f"string_split(trim({alias}pair, '()'), ')(')[1]",
        f"string_split(trim({alias}pair, '()'), ')(')[2]",
    )


def bpe_batched_oracle_sql(
    rounds: int = BPE_BATCH_ROUNDS,
    k: int = BPE_BATCH_K,
    vocab_limit: int = BPE_VOCAB_LIMIT,
) -> str:
    """Unrolled DuckDB replay of bpe_merge_table_batched: per round,
    k chained argmax CTEs, each restricted to pairs symbol-disjoint
    from every earlier accept of the round; then one w{r} applying all
    k replaces (coalesce to a chr(1) needle when a slot is empty)."""
    ctes = [
        f"""wf AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  WHERE regexp_matches(word, '^[a-z]+$')
  GROUP BY word ORDER BY cnt DESC, word LIMIT {vocab_limit}
)""",
        r"""w0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', '(\1)', 'g') AS sym, cnt FROM wf)""",
    ]
    finals = []
    # the candidate table MUST be aliased and its pair column qualified:
    # inside the NOT EXISTS subquery an unqualified `pair` resolves to
    # the INNER table q and the disjointness test becomes vacuously
    # self-referential (every candidate excluded)
    cand_l, cand_r = _sql_pair_syms("c.")
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT '(' || parts[i] || ')(' || parts[i+1] || ')' AS pair,
         CAST(SUM(cnt) AS BIGINT) AS pc
  FROM (SELECT parts, cnt, unnest(range(1, len(parts))) AS i
        FROM (SELECT string_split(trim(sym, '()'), ')(') AS parts, cnt FROM {prev}))
  GROUP BY 1
)"""
        )
        for j in range(1, k + 1):
            disjoint = ""
            if j > 1:
                prior_l, prior_r = _sql_pair_syms("q.")
                clauses = [
                    f"""NOT EXISTS (SELECT 1 FROM a{r}_{i} q
    WHERE {prior_l} IN ({cand_l}, {cand_r})
       OR {prior_r} IN ({cand_l}, {cand_r}))"""
                    for i in range(1, j)
                ]
                disjoint = "\n  WHERE " + "\n    AND ".join(clauses)
            ctes.append(
                f"""a{r}_{j} AS MATERIALIZED (
  SELECT c.pair, c.pc FROM p{r} c{disjoint}
  ORDER BY c.pc DESC, c.pair LIMIT 1
)"""
            )
            finals.append(
                f"""SELECT CAST({r} AS INTEGER) AS round, CAST({j} AS INTEGER) AS slot,
       string_split(trim(pair, '()'), ')(')[1] AS left_sym,
       string_split(trim(pair, '()'), ')(')[2] AS right_sym,
       replace(trim(pair, '()'), ')(', '') AS merged,
       pc AS pair_count
FROM a{r}_{j}"""
            )
        expr = "sym"
        for j in range(1, k + 1):
            needle = f"coalesce((SELECT pair FROM a{r}_{j}), chr(1))"
            repl = (
                f"coalesce((SELECT '(' || replace(trim(pair, '()'), ')(', '') || ')' "
                f"FROM a{r}_{j}), chr(1))"
            )
            expr = f"replace({expr}, {needle}, {repl})"
        ctes.append(f"w{r} AS MATERIALIZED (SELECT {expr} AS sym, cnt FROM {prev})")
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(finals)
        + "\n) ORDER BY round, slot"
    )


@register(
    "txt_bpe_train_batched",
    oracle=bpe_batched_oracle_sql(),
    description="Batched BPE training: top-4 symbol-disjoint merges per round x 4 rounds (one bounded model-state collect per round), replayed by an unrolled argmax-chain oracle",
)
def txt_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for tokenizer training: k symbol-disjoint merges
    per driver round-trip, so 50k production merges cost ~50k/k
    bounded collects and rounds/16 checkpointed lineage nodes instead
    of 50k of each. Semantics = batched greedy BPE (counts are
    computed once per round, then k disjoint merges apply
    simultaneously); the classic one-merge-per-round trainer
    (txt_bpe_train) remains the canonical-BPE reference."""
    return bpe_merge_table_batched(load_table(spark, sf_dir, "documents"))


def _fertility_row(words: DataFrame) -> tuple[int, int, int]:
    """(vocab_syms, total_words, total_tokens) of a symbolized
    word-frequency table — three exact int64 scalars."""
    parts = words.select(
        F.split(F.expr("btrim(sym, '()')"), "\\)\\(").alias("parts"), "cnt"
    )
    a = parts.agg(
        F.sum(F.col("cnt") * F.size("parts")).cast("bigint").alias("toks"),
        F.sum("cnt").cast("bigint").alias("wrds"),
    ).collect()[0]
    v = (
        parts.select(F.explode("parts").alias("s"))
        .agg(F.countDistinct("s").cast("bigint").alias("v"))
        .collect()[0]["v"]
    )
    return int(v), int(a["wrds"]), int(a["toks"])


def bpe_fertility_table(
    docs: DataFrame, rounds: int = BPE_ROUNDS, vocab_limit: int = BPE_VOCAB_LIMIT
) -> DataFrame:
    """Re-run the merge training and measure, after every round, what
    the tokenizer team actually reads off a BPE run: symbol-vocabulary
    size, total corpus tokens, and tokens-per-word (fertility). Row 0
    is the character baseline. If the vocabulary merges to fixpoint
    before `rounds`, the remaining rows repeat the fixpoint (the curve
    flattens, it never truncates) — mirrored by the oracle's
    never-matching sentinel needle."""
    spark = docs.sparkSession
    base = _word_symbols(docs, vocab_limit).persist()
    base.count()
    words = base
    rows = []
    v, wrds, toks = _fertility_row(words)
    rows.append((0, v, wrds, toks, toks / wrds if wrds else 0.0))
    for r in range(1, rounds + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("pc").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if best:
            pair = best[0]["pair"]
            merged = "(" + pair[1:-1].replace(")(", "") + ")"
            words = words.select(
                F.replace(F.col("sym"), F.lit(pair), F.lit(merged)).alias("sym"),
                "cnt",
            )
            if r % _CHECKPOINT_EVERY == 0:
                words = words.localCheckpoint()
        v, wrds, toks = _fertility_row(words)
        rows.append((r, v, wrds, toks, toks / wrds if wrds else 0.0))
    base.unpersist()
    out = spark.createDataFrame(
        rows,
        "round int, vocab_syms bigint, total_words bigint, "
        "total_tokens bigint, tokens_per_word double",
    )
    return out.orderBy("round")


def bpe_fertility_oracle_sql(
    rounds: int = BPE_ROUNDS, vocab_limit: int = BPE_VOCAB_LIMIT
) -> str:
    """Unrolled replay of bpe_fertility_table: the same w0..wN chain
    as bpe_oracle_sql plus one fertility aggregate per round. chr(1)
    is the never-matching needle when a round has no pairs left."""
    base = bpe_oracle_sql(rounds, vocab_limit)
    ctes = base[len("WITH ") : base.index("\nSELECT * FROM (")]
    # harden the w{r} CTEs against empty b{r} (scalar subquery -> NULL)
    for r in range(1, rounds + 1):
        ctes = ctes.replace(
            f"replace(sym, (SELECT pair FROM b{r}),",
            f"replace(sym, coalesce((SELECT pair FROM b{r}), chr(1)),",
        ).replace(
            f"(SELECT '(' || replace(trim(pair, '()'), ')(', '') || ')' FROM b{r})",
            f"coalesce((SELECT '(' || replace(trim(pair, '()'), ')(', '') || ')' FROM b{r}), chr(1))",
        )
    finals = []
    for r in range(0, rounds + 1):
        finals.append(
            f"""SELECT CAST({r} AS INTEGER) AS round,
       (SELECT CAST(COUNT(DISTINCT s) AS BIGINT)
        FROM (SELECT unnest(string_split(trim(sym, '()'), ')(')) AS s FROM w{r})) AS vocab_syms,
       CAST(SUM(cnt) AS BIGINT) AS total_words,
       CAST(SUM(cnt * len(string_split(trim(sym, '()'), ')('))) AS BIGINT) AS total_tokens,
       CAST(SUM(cnt * len(string_split(trim(sym, '()'), ')('))) AS DOUBLE)
         / CAST(SUM(cnt) AS BIGINT) AS tokens_per_word
FROM w{r}"""
        )
    return (
        "WITH " + ctes + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(finals)
        + "\n) ORDER BY round"
    )


@register(
    "txt_bpe_fertility",
    oracle=bpe_fertility_oracle_sql(),
    description="BPE compression curve: vocab size, total tokens and tokens-per-word after each merge round (round 0 = char baseline)",
)
def txt_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured payoff of txt_bpe_train: how much each merge
    round compresses the corpus (fertility curve) and what it costs
    in vocabulary size — the two axes every tokenizer budget trades.
    Same bounded per-round jobs as the trainer; the only
    data-proportional work is the single word-frequency shuffle."""
    return bpe_fertility_table(load_table(spark, sf_dir, "documents"))
