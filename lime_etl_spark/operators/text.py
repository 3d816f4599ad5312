"""Text analysis over the documents table (LLM-pipeline operators).

Everything is built-in column expressions (split / transform / filter /
regexp) — whole-stage-codegen'd JVM work, no Python in the hot path.
At 100 TB the documents fact is the scaling table and every operator
here is embarrassingly parallel (per-row projections + one groupBy for
the corpus-level stats).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_etl_spark.functions.numeric import to_double
from lime_etl_spark.functions.text import tokens, word_shingles
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table, spread

# Per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Tiny on purpose: they broadcast as literals inside the
# expression tree.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "to", "is"),
    "es": ("el", "las", "de", "y", "que", "los"),
    "fr": ("le", "la", "et", "les", "des", "une"),
    "zh": ("的", "是", "在", "了", "我", "有"),
}

# BPE-ish token pattern: runs of letters, runs of digits, single other.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _hits(toks: F.Column, words: tuple[str, ...]) -> F.Column:
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def _hits_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({inlist})))"


@register(
    "txt_token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars_calc
    FROM documents
    """,
    description="whitespace + BPE-ish regex token counting",
)
def txt_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens()).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_RE)).cast("int").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars_calc"),
    )


@register(
    "txt_quality_score",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_token_len,
           CAST({_hits_sql(LANG_PROFILES['en'])} AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
    FROM documents
    """,
    description="length / stopword / lexical-diversity quality features",
)
def txt_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: per-doc tokenize/regex work is the whole query; hash-
    # spread so it is not single-task on the one-split test scan
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = tokens()
    n_tok = to_double(F.size(toks))
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        (to_double(F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))) / n_tok).alias(
            "mean_token_len"
        ),
        (to_double(_hits(toks, LANG_PROFILES["en"])) / n_tok).alias("stopword_ratio"),
        (to_double(F.size(F.array_distinct(toks))) / n_tok).alias("distinct_ratio"),
    )


def _langid_case_sql() -> str:
    hits = {lang: _hits_sql(words) for lang, words in LANG_PROFILES.items()}
    m = "greatest(" + ", ".join(hits.values()) + ")"
    whens = " ".join(
        f"WHEN {hits[lang]} = {m} THEN '{lang}'" for lang in sorted(LANG_PROFILES)
    )
    return f"CASE {whens} END"


@register(
    "txt_langid",
    oracle=f"""
    SELECT doc_id, lang, {_langid_case_sql()} AS pred_lang,
           {_langid_case_sql()} = lang AS is_correct
    FROM documents
    """,
    description="stopword-profile language-ID heuristic (argmax, alphabetic ties)",
)
def txt_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    hits = {lang: _hits(toks, words) for lang, words in LANG_PROFILES.items()}
    m = F.greatest(*hits.values())
    expr = None
    for lang in sorted(LANG_PROFILES):
        cond = hits[lang] == m
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return docs.select(
        "doc_id",
        "lang",
        expr.alias("pred_lang"),
        (expr == F.col("lang")).alias("is_correct"),
    )


@register(
    "txt_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS token_set_fp
    FROM documents
    """,
    description="content md5 + order-insensitive token-set fingerprint",
)
def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(tokens())), " ")).alias(
            "token_set_fp"
        ),
    )


@register(
    "txt_ngram_stats",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    description="corpus-level top-20 bigrams",
)
def txt_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(F.explode(word_shingles(tokens(), 2)).alias("bigram"))
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


@register(
    "txt_chunk_windows",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {CHUNK_STRIDE}, 1), {CHUNK_STRIDE})) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_ix,
           CAST(len(list_slice(t, start, start + {CHUNK_TOKENS} - 1)) AS INT) AS n_chunk_tokens,
           array_to_string(list_slice(t, start, start + {CHUNK_TOKENS} - 1), ' ') AS chunk_text
    FROM starts
    """,
    description="overlapping token-window chunking (32-token chunks, stride 16)",
)
def txt_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping token windows — the unit a
    training pipeline embeds/tokenizes downstream. Pure array
    expressions (sequence/explode/slice): the chunk explosion happens
    JVM-side in the scan stage, no shuffle until a consumer needs one;
    stride < chunk gives tail coverage without runt chunks."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - CHUNK_STRIDE, F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_TOKENS)
    return (
        docs.select("doc_id", toks.alias("t"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_ix"),
            F.size(chunk).alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@register(
    "txt_doc_frequency",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM toks
    ),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT bigram,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n_docs FROM tot) AS doc_share
    FROM grams
    GROUP BY bigram
    HAVING COUNT(*) * 20 >= (SELECT n_docs FROM tot)
    ORDER BY doc_freq DESC, bigram
    """,
    description="document frequency of bigrams above a 5% floor (IDF input without the non-reproducible log)",
)
def txt_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency table — the IDF input and the standard
    boilerplate detector (grams in a large share of documents are
    template/stop phrases). Emits exact counts and shares, not IDF
    itself: ln() is not bit-stable cross-engine, and every consumer
    (tf-idf weighting, stop-gram lists) can apply its own transform.

    Scale: distinct-per-doc before the count (one row per (doc,gram))
    so hot grams don't multiply; the 5% floor is cross-multiplied in
    exact integers against a 1-row broadcast total — same pattern as
    the q11/q15 scalar subqueries, never a collect."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(word_shingles(tokens(), 2)).alias("bigram")
    ).distinct()
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .join(F.broadcast(total))
        .where(F.col("doc_freq") * 20 >= F.col("n_docs"))
        .select(
            "bigram",
            F.col("doc_freq").cast("bigint").alias("doc_freq"),
            (F.col("doc_freq").cast("double") / F.col("n_docs")).alias("doc_share"),
        )
        .orderBy(F.desc("doc_freq"), "bigram")
    )


@register(
    "txt_langid_confusion",
    oracle=f"""
    SELECT lang, {_langid_case_sql()} AS pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang
    """,
    description="language-ID confusion matrix: labeled vs heuristic-predicted language",
)
def txt_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the stopword-profile language classifier —
    the eval artifact any classifier component ships with (which
    language pairs the heuristic confuses, not just the accuracy
    scalar txt_langid exposes per doc). The prediction expression is
    evaluated once in the scan projection and the rollup is a
    |langs|²-key groupBy — counters-only shuffle at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    hits = {lang: _hits(toks, words) for lang, words in LANG_PROFILES.items()}
    m = F.greatest(*hits.values())
    expr = None
    for lang in sorted(LANG_PROFILES):
        cond = hits[lang] == m
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return (
        docs.select("lang", expr.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


TFIDF_TOP_K = 5


@register(
    "txt_tfidf_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf * (SELECT n_docs FROM tot) AS DOUBLE) / df.df
                   AS tfidf_ratio,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * (SELECT n_docs FROM tot) AS DOUBLE)
                                / df.df DESC,
                            df.df ASC, tf.term ASC
               ) AS rnk
        FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, tf, df, tfidf_ratio, CAST(rnk AS BIGINT) AS rnk
    FROM scored
    WHERE rnk <= {TFIDF_TOP_K}
    ORDER BY doc_id, rnk
    """,
    description="per-doc top-k salient terms by the tf*(N/df) ratio (log-free tf-idf)",
)
def txt_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k most salient terms per document, ranked by tf * N / df —
    tf-idf with the monotone ln() dropped so the score is pure integer
    arithmetic plus ONE double division (correctly rounded per IEEE
    754, hence bit-identical cross-engine; ln() is not). Ranking is
    identical to classic tf-idf within a document because N is
    constant and ln is monotone. Ties break on rarer-term-first
    (df asc) then term text, so row_number is a total order.

    Scale: tf is the explode fan-out (one row per token) immediately
    reduced by a map-side-combining groupBy on (doc_id, term); df is a
    counters-only rollup OF tf (never re-tokenizes); tf is persisted
    because it feeds both the df rollup and the scoring join — the
    never-self-join-an-unpersisted-pipeline rule. N is a 1-row
    broadcast, not a collect. The final top-k is one window over the
    (doc_id, term)-partitioned join output."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .persist()
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .join(F.broadcast(total))
        .withColumn(
            "tfidf_ratio",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_ratio"), F.asc("df"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "tfidf_ratio", "rnk")
        .orderBy("doc_id", "rnk")
    )


# Character classes for the charset profile. ASCII-safe regexes that
# mean the same thing to Java regex (Spark) and RE2 (DuckDB).
_CHAR_CLASSES = (
    ("alpha", "[A-Za-z]"),
    ("digit", "[0-9]"),
    ("space", "[ ]"),
    ("punct", "[.,;:!?'\"()-]"),
)


@register(
    "txt_charset_profile",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           {", ".join(
               f"CAST(SUM(len(regexp_extract_all(text, '{_re_.replace(chr(39), chr(39) * 2)}'))) AS DOUBLE)"
               f" / SUM(length(text)) AS {name}_ratio"
               for name, _re_ in _CHAR_CLASSES
           )},
           CAST(SUM(length(text) - len(regexp_extract_all(text, '[ -~]'))) AS BIGINT)
               AS n_non_ascii
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    description="per-language character-class profile (alpha/digit/space/punct/non-ASCII)",
)
def txt_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset composition per language — the encoding-health screen
    that catches mojibake, binary-in-text and wrong-language ingest
    before tokenization (a zh corpus with 99% ASCII is a red flag, as
    is an en corpus suddenly full of non-ASCII after a crawler change).

    All counting is JVM regexp_count over the row (codegen, no
    Python); the shuffle carries only per-language counter partials.
    The ratio is one IEEE division of two exact integer counts, so it
    hash-matches DuckDB bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    ]
    for name, pat in _CHAR_CLASSES:
        aggs.append(
            (
                F.sum(F.regexp_count("text", F.lit(pat))).cast("double")
                / F.sum(F.length("text"))
            ).alias(f"{name}_ratio")
        )
    aggs.append(
        F.sum(F.length("text") - F.regexp_count("text", F.lit("[ -~]")))
        .cast("bigint")
        .alias("n_non_ascii")
    )
    return docs.groupBy("lang").agg(*aggs).orderBy("lang")


@register(
    "txt_compression_ratio",
    oracle=None,  # zlib has no SQL twin; pytest cross-checks the UDF
    # against direct python zlib on the same rows
    description="per-source zlib compression ratio (Arrow-batched Pandas UDF)",
)
def txt_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression ratio as a text-quality signal (Gopher-style):
    highly repetitive or templated text compresses far below natural
    prose, random/binary junk barely compresses at all — both tails
    are what a curation gate drops.

    This is the engine's canonical example of the SANCTIONED Python
    path: zlib genuinely cannot be expressed in column expressions, so
    it runs as a scalar ``pandas_udf`` — Arrow-batched columnar
    transfer, one Python call per batch (ArrowEvalPython in the plan,
    never row-at-a-time BatchEvalPython). Everything around it stays
    JVM-side, and the AGGREGATED outputs are integer byte counts, so
    the per-source rollup is deterministic (the ratio is one IEEE
    division of two exact integers — no float sums across rows).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def compressed_len(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(lambda t: len(zlib.compress(t.encode("utf-8"), 6)))

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        compressed_len("text").alias("n_compressed"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_compressed").cast("bigint").alias("total_compressed"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            "total_compressed",
            (F.col("total_compressed").cast("double") / F.col("total_chars").cast("double")).alias(
                "compression_ratio"
            ),
        )
        .orderBy("source")
    )


# --- code-vs-prose detection -------------------------------------------------

CODE_SYMBOL_RE = r"[{}()\[\];=<>|&]"  # punctuation prose rarely uses densely
CODE_IDENT_RE = r"[a-zA-Z]+_[a-zA-Z]+|[a-z]+[A-Z][a-zA-Z]*"  # snake/camelCase
CODE_FLAG_E6 = 30_000  # flag docs whose weighted density exceeds 3%


@register(
    "txt_code_score",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               ((len(regexp_extract_all(text, '{CODE_SYMBOL_RE.replace("'", "''")}')) * 3
                 + len(regexp_extract_all(text, '{CODE_IDENT_RE}'))) * 1000000)
                 // GREATEST(n_chars, 1) AS score_e6
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_e6) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_code_density,
           CAST(SUM(CASE WHEN score_e6 > {CODE_FLAG_E6} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_code_like,
           CAST(SUM(CASE WHEN score_e6 > {CODE_FLAG_E6} THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS share_code_like
    FROM scored GROUP BY source ORDER BY source
    """,
    description="code-vs-prose detection: weighted symbol/identifier density per doc, per-source code-like share",
)
def txt_code_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The code-filtering stage of a text-corpus pipeline: score each
    doc by a weighted density of code punctuation (braces, semicolons,
    assignment/comparison operators, ×3) plus snake_case/camelCase
    identifiers, normalized by characters; roll up per source with the
    share of docs over the 3% flag line. A prose corpus sits near
    zero; source shards that are secretly code dumps light up — the
    triage that decides whether a source needs a code-aware tokenizer
    or exclusion.

    Exactness: the per-doc score is pure integer arithmetic
    ((3·symbols + identifiers)·10⁶ div chars); rollups are integer
    sums plus one division each. Scale: two regexp_count projections
    fused into the scan, one counters-only groupBy(source)."""
    docs = load_table(spark, sf_dir, "documents")
    # Spark SQL string literals process backslash escapes (DuckDB's do
    # not) — double them so the parsed regex keeps its \[ \] classes
    sym_sql = CODE_SYMBOL_RE.replace("\\", "\\\\")
    score = F.expr(
        f"((regexp_count(text, '{sym_sql}') * 3"
        f" + regexp_count(text, '{CODE_IDENT_RE}')) * 1000000)"
        " div greatest(n_chars, 1)"
    )
    scored = docs.select("source", score.alias("score_e6"))
    flagged = F.col("score_e6") > CODE_FLAG_E6
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum("score_e6").cast("double") / (F.count(F.lit(1)) * 1000000.0)
            ).alias("mean_code_density"),
            F.sum(F.when(flagged, 1).otherwise(0)).cast("bigint").alias("n_code_like"),
            (
                F.sum(F.when(flagged, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("share_code_like"),
        )
        .orderBy("source")
    )


# --- ingest-order n-gram novelty ---------------------------------------------

NOVELTY_N = 3  # word-trigram granularity (sub-doc redundancy unit)


@register(
    "txt_novelty_rate",
    oracle=f"""
    WITH grams AS (
        SELECT DISTINCT doc_id, lang, sh
        FROM (
            SELECT doc_id, lang,
                   unnest(list_transform(generate_series(1, len(t) - {NOVELTY_N - 1}),
                                         i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
            FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
        )
    ),
    first_seen AS (SELECT sh, MIN(doc_id) AS intro_doc FROM grams GROUP BY sh),
    per_doc AS (
        SELECT g.doc_id, ANY_VALUE(g.lang) AS lang,
               COUNT(*) AS n_grams,
               SUM(CASE WHEN f.intro_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
        FROM grams g JOIN first_seen f ON f.sh = g.sh
        GROUP BY g.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(n_novel) AS BIGINT) AS novel_grams,
           CAST(SUM(n_novel) AS DOUBLE) / SUM(n_grams) AS novelty_rate,
           CAST(SUM(CASE WHEN n_novel * 2 < n_grams THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mostly_redundant_docs
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
    description="ingest-order n-gram novelty: share of each doc's trigrams it introduced to the corpus; per-lang redundancy profile",
)
def txt_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document redundancy at the trigram grain: for every doc,
    the share of its distinct word-trigrams that FIRST appear in it
    (first-seen = min doc_id over the corpus — the deterministic stand-
    in for ingest order). Doc-level dedup misses this entirely: a
    corpus can be 0% duplicate documents and still 80% recycled
    trigrams (syndication, quotes, templates) — this is the table
    that says how much NEW text each language slice actually adds,
    and counts the mostly-redundant docs (<50% novel) a curation
    pass would weight down (same spirit as dedup_repeated_spans at
    span grain; this is corpus-cumulative).

    Scale: distinct (doc, gram) explode, one groupBy(gram) for the
    first-seen reduce (map-side combined), one hash join back on the
    gram, counters-only doc and lang rollups. The <50% flag is an
    integer cross-multiply — everything exact."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(word_shingles(tokens(), NOVELTY_N)).alias("sh"),
        )
        .distinct()
        .persist()
    )
    first_seen = grams.groupBy("sh").agg(F.min("doc_id").alias("intro_doc"))
    per_doc = (
        grams.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("intro_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_grams").cast("bigint").alias("total_grams"),
            F.sum("n_novel").cast("bigint").alias("novel_grams"),
            (
                F.sum("n_novel").cast("double") / F.sum("n_grams")
            ).alias("novelty_rate"),
            F.sum(
                F.when(F.col("n_novel") * 2 < F.col("n_grams"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_mostly_redundant_docs"),
        )
        .orderBy("lang")
    )
