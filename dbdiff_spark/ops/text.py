"""Text-analysis operators for the training-data pipeline tier:
quality scoring, language-ID heuristic, tokenization stats, document
fingerprinting.  All pure built-in expressions (regexp + higher-order
array functions) — no UDFs, fully inside whole-stage codegen.  The
per-document ops are embarrassingly parallel projections; the corpus-
level ops (``inverted_index``, ``top_terms_per_doc``, ``top_terms``)
additionally shuffle on term for their index/frequency aggregations.

Cross-engine exactness: tokenization is ``regexp_extract_all(lower(text),
'[a-z0-9]+')`` (same RE2-compatible pattern semantics in Spark's Java
regex and DuckDB), hashing is md5 (identical lowercase hex), and set
operations only ever contribute SIZES to outputs (DuckDB's list_distinct
does not preserve order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbdiff_spark.io import load_table, spread

TOKEN_PATTERN = "[a-z0-9]+"

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

# Spark-side shared expressions (SQL-expr strings; DuckDB twins below
# differ only where function signatures differ).
_TOKENS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}', 0)"
_D_TOKENS = f"regexp_extract_all(lower(text), '{TOKEN_PATTERN}')"


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics: token counts, char-class ratios,
    stopword ratio, and a deterministic composite score."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.expr(f"CAST(size({_TOKENS}) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(length(text) AS BIGINT)").alias("n_chars"),
        F.expr(
            f"CAST(aggregate({_TOKENS}, 0L, (acc, x) -> acc + length(x)) AS BIGINT)"
        ).alias("n_token_chars"),
        F.expr(
            f"CAST(size(filter({_TOKENS}, x -> x IN ({_SW_LIST}))) AS BIGINT)"
        ).alias("stopword_hits"),
    ).select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_chars",
        "n_token_chars",
        "stopword_hits",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_token_chars / n_tokens END"
        ).alias("avg_token_len"),
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0.0 ELSE stopword_hits / n_tokens END"
        ).alias("stopword_ratio"),
        F.expr(
            "(CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 1.0 ELSE 0.5 END)"
            " * (CASE WHEN n_tokens = 0 THEN 0.0"
            "        ELSE 1.0 - stopword_hits / n_tokens END)"
        ).alias("quality_score"),
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id, lang, n_tokens, n_chars, n_token_chars, stopword_hits,
       CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_token_chars / n_tokens END AS avg_token_len,
       CASE WHEN n_tokens = 0 THEN 0.0 ELSE stopword_hits / n_tokens END AS stopword_ratio,
       (CASE WHEN n_tokens BETWEEN 20 AND 500 THEN 1.0 ELSE 0.5 END)
       * (CASE WHEN n_tokens = 0 THEN 0.0 ELSE 1.0 - stopword_hits / n_tokens END) AS quality_score
FROM (
  SELECT doc_id, lang,
         CAST(len({_D_TOKENS}) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(coalesce(list_sum(list_transform({_D_TOKENS}, x -> length(x))), 0) AS BIGINT) AS n_token_chars,
         CAST(len(list_filter({_D_TOKENS}, x -> x IN ({_SW_LIST}))) AS BIGINT) AS stopword_hits
  FROM documents
)
"""


_LANG_LISTS = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr": ("le", "les", "des", "et", "est", "une", "dans"),
}


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram(1) stopword-hit language heuristic with a deterministic
    argmax tie-break (en > es > de > fr).  Emits prediction + agreement
    with the dataset's label."""
    docs = load_table(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id",
        "lang",
        *[
            F.expr(
                f"size(filter({_TOKENS}, x -> x IN ({', '.join(repr(w) for w in ws)})))"
            ).alias(f"hits_{lg}")
            for lg, ws in _LANG_LISTS.items()
        ],
    )
    pred = (
        "CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en' "
        "WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es' "
        "WHEN hits_de >= hits_fr THEN 'de' ELSE 'fr' END"
    )
    return hits.select(
        "doc_id",
        "lang",
        F.expr(pred).alias("pred_lang"),
        F.expr(f"({pred}) = lang").alias("is_match"),
    )


def _lang_hits_sql(lg: str, ws: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in ws)
    return f"len(list_filter({_D_TOKENS}, x -> x IN ({inlist}))) AS hits_{lg}"


LANG_ID_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
            WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
            WHEN hits_de >= hits_fr THEN 'de' ELSE 'fr' END AS pred_lang,
       (CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
             WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
             WHEN hits_de >= hits_fr THEN 'de' ELSE 'fr' END) = lang AS is_match
FROM (
  SELECT doc_id, lang,
         {", ".join(_lang_hits_sql(lg, ws) for lg, ws in _LANG_LISTS.items())}
  FROM documents
)
"""


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenization counts: words / numbers / punctuation pieces
    via an alternation regex (the classic pre-tokenizer split)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[a-z]+', 0)) AS BIGINT)"
        ).alias("n_word_tokens"),
        F.expr(
            "CAST(size(regexp_extract_all(text, '[0-9]+', 0)) AS BIGINT)"
        ).alias("n_num_tokens"),
        F.expr(
            "CAST(size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)) AS BIGINT)"
        ).alias("n_bpe_tokens"),
        F.expr("CAST(length(text) AS BIGINT)").alias("n_chars"),
    )


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_word_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


# word-3-gram shingles with a whole-text fallback for short docs —
# shared building block for fingerprinting and MinHash (dedup.py)
def shingles_expr_spark(tokens: str = _TOKENS) -> str:
    return (
        f"CASE WHEN size({tokens}) >= 3 THEN "
        f"transform(sequence(1, size({tokens}) - 2), "
        f"i -> concat_ws(' ', element_at({tokens}, i), "
        f"element_at({tokens}, i + 1), element_at({tokens}, i + 2))) "
        f"ELSE array(concat_ws(' ', {tokens})) END"
    )


def shingles_expr_duck(tokens: str = _D_TOKENS) -> str:
    return (
        f"CASE WHEN len({tokens}) >= 3 THEN "
        f"list_transform(generate_series(1, len({tokens}) - 2), "
        f"i -> concat_ws(' ', {tokens}[i], {tokens}[i + 1], {tokens}[i + 2])) "
        f"ELSE [array_to_string({tokens}, ' ')] END"
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: the 4 smallest md5s of the word-3-gram
    shingle set, comma-joined.  Documents sharing a fingerprint are
    near-identical candidates."""
    # spread first: one md5 per shingle is seconds of CPU per core over
    # a byte-tiny file the scan planner gives ONE task (io.spread note)
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    sh = shingles_expr_spark()
    return docs.select(
        "doc_id",
        F.expr(
            f"array_join(slice(array_sort(transform({sh}, x -> md5(x))), 1, 4), ',')"
        ).alias("fingerprint"),
    )


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id,
       array_to_string(list_sort(list_transform({shingles_expr_duck()}, x -> md5(x)))[1:4], ',') AS fingerprint
FROM documents
"""


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition — the boilerplate/template signal used
    by large-corpus quality filters: ``1 - distinct/total`` over word
    3-grams.  A doc that repeats one sentence scores near 1; fresh prose
    scores near 0.  Narrow per-row projection; ratio is one double
    division (bit-identical across engines).  The double shingle
    evaluation (size + distinct-size) is CPU-heavy per row, so the
    byte-tiny input is spread across cores first (io.spread note)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    sh = shingles_expr_spark()
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({sh}) AS BIGINT) AS n_shingles",
        f"CAST(size(array_distinct({sh})) AS BIGINT) AS n_distinct",
    ).selectExpr(
        "doc_id",
        "n_shingles",
        "n_distinct",
        "CAST(n_shingles - n_distinct AS DOUBLE) / n_shingles AS rep_ratio",
    )


REPETITION_RATIO_SQL = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len({shingles_expr_duck()}) AS BIGINT) AS n_shingles,
         CAST(len(list_distinct({shingles_expr_duck()})) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT doc_id, n_shingles, n_distinct,
       CAST(n_shingles - n_distinct AS DOUBLE) / n_shingles AS rep_ratio
FROM sized
"""


# --- Gopher-style repetition filter ------------------------------------------
#
# The within-document repetition rules of the Gopher/MassiveText quality
# pipeline (Rae et al. 2021, appendix A1), the standard pre-training
# corpus filter alongside the char-class heuristics in text_quality:
# a document is dropped when too much of its character mass sits in (a)
# occurrences of its single most frequent word 2-gram or (b) word
# 3-grams that occur more than once.  Char mass is defined exactly:
# occurrences × token characters of the gram (spaces excluded), over
# the document's total token characters.
#
# Shape at scale: explode → groupBy(doc_id, gram) with map-side combine
# (hot grams collapse before the shuffle, same argument as the
# all-columns diff), then a doc-level aggregate; top-gram election is
# max(struct(cnt, gram)) — no window, ties break deterministically on
# the lexicographically greatest gram in BOTH engines.

TOP2_MAX_FRAC = 0.18  # Gopher's top-2-gram character-fraction threshold
DUP3_MAX_FRAC = 0.30  # duplicate-3-gram character-fraction threshold


def _grams_spark(n: int, tokens: str = _TOKENS) -> str:
    parts = ", ".join(f"element_at({tokens}, i + {j})" for j in range(n))
    return (
        f"CASE WHEN size({tokens}) >= {n} THEN "
        f"transform(sequence(1, size({tokens}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def _grams_duck(n: int, tokens: str = _D_TOKENS) -> str:
    parts = ", ".join(f"{tokens}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({tokens}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE [] END"
    )


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    base = docs.selectExpr(
        "doc_id",
        f"CAST(aggregate({_TOKENS}, 0L, (acc, x) -> acc + length(x)) AS BIGINT)"
        " AS n_token_chars",
    )
    gram_chars = "CAST(length(replace(g, ' ', '')) AS BIGINT)"
    bi = (
        docs.selectExpr("doc_id", f"explode({_grams_spark(2)}) AS g")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.expr("max(struct(cnt, g)) AS top"))
        .selectExpr(
            "doc_id",
            "top.g AS top_bigram",
            f"top.cnt * CAST(length(replace(top.g, ' ', '')) AS BIGINT)"
            " AS top2_chars",
        )
    )
    tri = (
        docs.selectExpr("doc_id", f"explode({_grams_spark(3)}) AS g")
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter("cnt >= 2")
        .groupBy("doc_id")
        .agg(F.expr(f"CAST(sum(cnt * {gram_chars}) AS BIGINT) AS dup3_chars"))
    )
    return (
        base.join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_token_chars",
            "coalesce(top_bigram, '') AS top_bigram",
            "CAST(coalesce(top2_chars, 0) AS BIGINT) AS top2_chars",
            "CAST(coalesce(dup3_chars, 0) AS BIGINT) AS dup3_chars",
            "CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)"
            " ELSE CAST(coalesce(top2_chars, 0) AS DOUBLE) / n_token_chars END"
            " AS top2_char_frac",
            "CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)"
            " ELSE CAST(coalesce(dup3_chars, 0) AS DOUBLE) / n_token_chars END"
            " AS dup3_char_frac",
            f"(CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)"
            f" ELSE CAST(coalesce(top2_chars, 0) AS DOUBLE) / n_token_chars END)"
            f" <= {TOP2_MAX_FRAC}"
            f" AND (CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)"
            f" ELSE CAST(coalesce(dup3_chars, 0) AS DOUBLE) / n_token_chars END)"
            f" <= {DUP3_MAX_FRAC} AS keep",
        )
    )


GOPHER_REPETITION_SQL = f"""
WITH base AS (
  -- coalesce: list_sum([]) is NULL in DuckDB, but a token-free doc
  -- must report 0 chars (and keep=true) exactly like the engine
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform({_D_TOKENS}, x -> length(x))),
                       0) AS BIGINT)
         AS n_token_chars
  FROM documents
),
bi_cnt AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest({_grams_duck(2)}) AS g FROM documents)
  GROUP BY doc_id, g
),
bi AS (
  SELECT doc_id, g,
         cnt * CAST(length(replace(g, ' ', '')) AS BIGINT) AS top2_chars
  FROM (
    SELECT doc_id, g, cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g DESC)
           AS rn
    FROM bi_cnt
  ) WHERE rn = 1
),
tri AS (
  SELECT doc_id,
         CAST(sum(cnt * CAST(length(replace(g, ' ', '')) AS BIGINT)) AS BIGINT)
         AS dup3_chars
  FROM (
    SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT doc_id, unnest({_grams_duck(3)}) AS g FROM documents)
    GROUP BY doc_id, g
  ) WHERE cnt >= 2 GROUP BY doc_id
)
SELECT base.doc_id, n_token_chars,
       coalesce(bi.g, '') AS top_bigram,
       CAST(coalesce(bi.top2_chars, 0) AS BIGINT) AS top2_chars,
       CAST(coalesce(tri.dup3_chars, 0) AS BIGINT) AS dup3_chars,
       CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(coalesce(bi.top2_chars, 0) AS DOUBLE) / n_token_chars END
       AS top2_char_frac,
       CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)
            ELSE CAST(coalesce(tri.dup3_chars, 0) AS DOUBLE) / n_token_chars END
       AS dup3_char_frac,
       (CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE CAST(coalesce(bi.top2_chars, 0) AS DOUBLE)
                  / n_token_chars END)
       <= {TOP2_MAX_FRAC}
       AND (CASE WHEN n_token_chars = 0 THEN CAST(0.0 AS DOUBLE)
                 ELSE CAST(coalesce(tri.dup3_chars, 0) AS DOUBLE)
                      / n_token_chars END)
       <= {DUP3_MAX_FRAC} AS keep
FROM base LEFT JOIN bi ON base.doc_id = bi.doc_id
LEFT JOIN tri ON base.doc_id = tri.doc_id
"""


# --- vocabulary growth curve (Heaps'-law raw data) ---------------------------
#
# Vocabulary size as a function of corpus position — the empirical
# curve whose power-law fit is Heaps' law (the fit itself needs
# log/exp, banned by the exactness rules; the engine emits the exact
# integer curve and the fit happens client-side).
#
# The scalable trick: cumulative-distinct at every checkpoint is NOT a
# windowed distinct (quadratic state).  A token first enters the
# vocabulary at min(doc_id) over its occurrences, so ONE grouped min
# per token + a checkpoint-bucketed count + a running sum over the
# (bounded, n_docs/CHECKPOINT-row) bucket table gives the entire curve:
# two corpus-sized map-side-combined aggregates, one tiny window.

VOCAB_CHECKPOINT_DOCS = 100


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    toks = docs.selectExpr("doc_id", f"explode_outer({_TOKENS}) AS t").filter(
        F.col("t").isNotNull()
    )
    ck = f"(doc_id div {VOCAB_CHECKPOINT_DOCS}) AS checkpoint"
    first_seen = (
        toks.groupBy("t")
        .agg(F.min("doc_id").alias("doc_id"))
        .selectExpr(ck)
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new_tokens"))
    )
    token_mass = (
        toks.selectExpr(ck)
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    w = Window.orderBy("checkpoint").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        token_mass.join(first_seen, "checkpoint", "left")
        .selectExpr(
            "checkpoint", "n_tokens", "coalesce(n_new_tokens, 0) AS n_new_tokens"
        )
        .select(
            "checkpoint",
            F.sum("n_tokens").over(w).cast("bigint").alias("tokens_cum"),
            F.sum("n_new_tokens").over(w).cast("bigint").alias("vocab_size"),
            "n_new_tokens",
        )
    )


VOCAB_GROWTH_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_D_TOKENS}) AS t FROM documents
),
first_seen AS (
  SELECT doc_id // {VOCAB_CHECKPOINT_DOCS} AS checkpoint,
         CAST(count(*) AS BIGINT) AS n_new_tokens
  FROM (SELECT t, min(doc_id) AS doc_id FROM toks GROUP BY t)
  GROUP BY 1
),
token_mass AS (
  SELECT doc_id // {VOCAB_CHECKPOINT_DOCS} AS checkpoint,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1
)
SELECT checkpoint,
       CAST(sum(n_tokens) OVER (ORDER BY checkpoint
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
       CAST(sum(coalesce(n_new_tokens, 0)) OVER (ORDER BY checkpoint
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size,
       coalesce(n_new_tokens, 0) AS n_new_tokens
FROM token_mass LEFT JOIN first_seen USING (checkpoint)
"""


# --- vocabulary coverage / OOV rate ------------------------------------------
#
# The tokenizer-prep step of a training pipeline: build the top-V
# vocabulary by corpus frequency (ties broken lexicographically so the
# cut is deterministic in both engines) and report each document's
# out-of-vocabulary token rate — the standard gauge of how well a fixed
# vocab covers a corpus slice.
#
# Shape at scale: token counts are VOCAB-sized after the map-side-
# combined groupBy (distinct tokens, not corpus tokens, cross the
# shuffle); the top-V cut sorts that small frame; the membership check
# is a broadcast join against V rows.  One corpus-sized shuffle total
# (the per-doc aggregation).

VOCAB_SIZE = 16


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    toks = docs.selectExpr("doc_id", f"explode({_TOKENS}) AS t")
    vocab = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "t")
        .limit(VOCAB_SIZE)
        .select("t", F.lit(True).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("__in_vocab").isNull()).alias("n_oov"),
        )
        .selectExpr(
            "doc_id",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(n_oov AS BIGINT) AS n_oov",
            "CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate",
        )
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_D_TOKENS}) AS t FROM documents
),
vc AS (
  SELECT t FROM (
    SELECT t, count(*) AS cnt FROM toks GROUP BY t
    ORDER BY cnt DESC, t LIMIT {VOCAB_SIZE}
  )
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE t NOT IN (SELECT t FROM vc)) AS BIGINT)
       AS n_oov,
       CAST(count(*) FILTER (WHERE t NOT IN (SELECT t FROM vc)) AS DOUBLE)
       / count(*) AS oov_rate
FROM toks GROUP BY doc_id
"""


def corpus_clean_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text ops composed into a cleaning pipeline: quality-filter →
    per-language acceptance stats.  This is the shape of a real
    training-data prep job (score → threshold → per-slice accounting)."""
    scored = text_quality(spark, sf_dir)
    return (
        scored.withColumn(
            "accepted",
            (F.col("quality_score") >= 0.5)
            & (F.col("n_tokens") >= 10)
            & (F.col("avg_token_len") >= 2.0),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("accepted").cast("long")).alias("n_accepted"),
            F.sum(F.when(F.col("accepted"), F.col("n_tokens")).otherwise(0)).alias(
                "accepted_tokens"
            ),
        )
    )


CORPUS_CLEAN_STATS_SQL = f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN accepted THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       CAST(sum(CASE WHEN accepted THEN n_tokens ELSE 0 END) AS BIGINT) AS accepted_tokens
FROM (
  SELECT lang, n_tokens,
         (quality_score >= 0.5 AND n_tokens >= 10 AND avg_token_len >= 2.0) AS accepted
  FROM ({TEXT_QUALITY_SQL})
)
GROUP BY lang
"""


# power-of-two bucket via integer CASE ladder — log2/pow are libm calls
# whose last-ulp differences across engines can flip floor() exactly at
# bucket boundaries; integer comparisons cannot
_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]


def _bucket_case(n_expr: str) -> str:
    whens = " ".join(
        f"WHEN {n_expr} < {b * 2} THEN {b}" for b in _BUCKETS[:-1]
    )
    return f"CAST(CASE {whens} ELSE {_BUCKETS[-1]} END AS BIGINT)"


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram (power-of-two buckets) — the standard
    corpus profile before sequence-length planning."""
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.selectExpr(f"size({_TOKENS}) AS n_tokens").selectExpr(
        f"{_bucket_case('greatest(n_tokens, 1)')} AS token_bucket"
    )
    return bucketed.groupBy("token_bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


TOKEN_HISTOGRAM_SQL = f"""
SELECT {_bucket_case('greatest(n_tokens, 1)')} AS token_bucket,
       count(*) AS n_docs
FROM (SELECT len({_D_TOKENS}) AS n_tokens FROM documents)
GROUP BY 1
"""


# --- deterministic stratified sampling --------------------------------------
#
# Per-language keep rates out of 65536 hash buckets: downsample the
# dominant language, keep the rest at higher rates.  Hash-based (not
# random) so the sample is reproducible across engines, runs, and
# cluster layouts — the property a training-data pipeline needs for
# auditable mixes.
SAMPLE_RATE_CASE = (
    "CASE lang WHEN 'en' THEN 16384 "  # 25%
    "WHEN 'zh' THEN 32768 "  # 50%
    "ELSE 49152 END"  # 75%
)


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic sample of the documents table.

    Bucket = first 4 hex chars of md5(doc_id) → uniform 0..65535; a doc
    is kept when its bucket falls under its language's rate threshold.
    Pure per-row filter — no shuffle, no RNG state, trivially parallel
    at any scale, and the SAME docs are kept on Spark and DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.selectExpr(
            "doc_id",
            "lang",
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"
            " AS bucket",
            f"CAST({SAMPLE_RATE_CASE} AS BIGINT) AS rate_per_64k",
        )
        .filter(F.col("bucket") < F.col("rate_per_64k"))
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, bucket, rate_per_64k
FROM (
  SELECT doc_id, lang,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)))::BIGINT AS bucket,
         CAST({SAMPLE_RATE_CASE} AS BIGINT) AS rate_per_64k
  FROM documents
)
WHERE bucket < rate_per_64k
"""


def top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document: rank by term frequency,
    breaking ties toward RARER terms (lower document frequency) then
    lexicographically — a tf-idf-shaped ranking with integer-only
    arithmetic (no log, so the oracle comparison is exact; memory rule:
    libm last-ulp divergence).

    Scale shape: one explode + (doc,term) aggregation; the document-
    frequency side aggregates to vocabulary size and joins back keyed on
    term (broadcastable — vocabularies are small next to corpora); the
    final top-k is a row_number window partitioned by doc."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.selectExpr("doc_id", f"explode({_TOKENS}) AS term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    )


TOP_TERMS_SQL = f"""
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_D_TOKENS}) AS term FROM documents)
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, rank
FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(row_number() OVER (PARTITION BY tf.doc_id
                                 ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC)
              AS INTEGER) AS rank
  FROM tf JOIN dfreq USING (term)
)
WHERE rank <= 3
"""


# --- deterministic train/val/test split -------------------------------------
#
# 80/10/10 by hashed doc_id (salted so the assignment is independent of
# the stratified-sample buckets above).  Hash-based splits are the only
# kind that survive re-partitioning, re-runs, and incremental corpus
# growth: a doc's split never changes when other docs are added.
_SPLIT_CASE = (
    "CASE WHEN split_bucket < 52429 THEN 'train' "  # 80% of 65536
    "WHEN split_bucket < 58982 THEN 'val' "  # +10%
    "ELSE 'test' END"
)


def split_bucket_spark(id_expr: str) -> str:
    """Deterministic 16-bit split bucket from an id — the ONE salt/hash
    both engines and every split-family op (per-doc and leakage-safe
    per-cluster) must share; edit here, never inline."""
    return (
        "CAST(conv(substr(md5(concat('split:', CAST("
        + id_expr
        + " AS STRING))), 1, 4), 16, 10) AS BIGINT)"
    )


def split_bucket_duck(id_expr: str) -> str:
    return (
        "('0x' || substr(md5('split:' || CAST("
        + id_expr
        + " AS VARCHAR)), 1, 4))::BIGINT"
    )


def train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment per document.
    Pure per-row projection — no shuffle, no RNG, reproducible on any
    cluster layout."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "lang",
        f"{split_bucket_spark('doc_id')} AS split_bucket",
    ).selectExpr("doc_id", "lang", "split_bucket", f"{_SPLIT_CASE} AS split")


TRAIN_VAL_SPLIT_SQL = f"""
SELECT doc_id, lang, split_bucket, {_SPLIT_CASE} AS split
FROM (
  SELECT doc_id, lang,
         {split_bucket_duck('doc_id')} AS split_bucket
  FROM documents
)
"""


# --- PII scrubbing -----------------------------------------------------------
#
# The redaction pass every shared-corpus pipeline runs before training.
# The testdata carries no contact strings, so the query SYNTHESIZES a
# deterministic dirty contact line from customer columns (same pure
# string expression on both engines — the analogue of the multimodal
# tier's deterministic fake payloads), then runs the real scrub operator
# over it: staged regexp_replace passes (email → phone → long digit
# runs) with per-row redaction counts.  Per-row projection, no shuffle,
# patterns chosen to mean the same thing in Java regex and RE2.
_EMAIL_RE = "[a-z0-9.#]+@[a-z0-9.]+"
_PHONE_RE = "[0-9]{3}-555-[0-9]{4}"
_IDRUN_RE = "[0-9]{4,}"


def _contact_expr(cast_str: str) -> str:
    """Dirty contact line from customer columns; `cast_str` is the
    engine's string-cast type name (STRING / VARCHAR)."""
    return (
        "concat(c_name, ' <', lower(replace(c_name, '#', '.')), '@example.com>',"
        f" ' phone ', lpad(CAST(c_custkey % 1000 AS {cast_str}), 3, '0'),"
        f" '-555-', lpad(CAST(c_custkey % 10000 AS {cast_str}), 4, '0'),"
        f" ' acct ', CAST(10000000 + c_custkey AS {cast_str}))"
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    customers = load_table(spark, sf_dir, "customer")
    return (
        customers.selectExpr("c_custkey", f"{_contact_expr('STRING')} AS contact")
        .selectExpr(
            "c_custkey",
            f"CAST(size(regexp_extract_all(contact, '{_EMAIL_RE}', 0)) AS BIGINT) AS n_emails",
            f"CAST(size(regexp_extract_all(contact, '{_PHONE_RE}', 0)) AS BIGINT) AS n_phones",
            f"regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '[EMAIL]'),"
            f" '{_PHONE_RE}', '[PHONE]') AS partial",
        )
        .selectExpr(
            "c_custkey",
            "n_emails",
            "n_phones",
            f"CAST(size(regexp_extract_all(partial, '{_IDRUN_RE}', 0)) AS BIGINT) AS n_id_runs",
            f"regexp_replace(partial, '{_IDRUN_RE}', '[NUM]') AS clean_text",
        )
    )


PII_SCRUB_SQL = f"""
SELECT c_custkey, n_emails, n_phones,
       CAST(len(regexp_extract_all(partial, '{_IDRUN_RE}')) AS BIGINT) AS n_id_runs,
       regexp_replace(partial, '{_IDRUN_RE}', '[NUM]', 'g') AS clean_text
FROM (
  SELECT c_custkey,
         CAST(len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(contact, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '{_PHONE_RE}', '[PHONE]', 'g') AS partial
  FROM (SELECT c_custkey, {_contact_expr('VARCHAR')} AS contact FROM customer)
)
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + a capped,
    sorted posting list — the secondary-index structure a corpus search
    or decontamination probe reads instead of rescanning text.

    Scale shape: per-doc ``array_distinct`` BEFORE the explode keeps the
    dedup narrow (each doc emits each term once — no global distinct
    shuffle); the posting cap is applied with a ``row_number`` window
    partitioned by term, NOT by collecting every posting and slicing —
    a stop-word term at corpus scale would otherwise materialize a
    multi-GB array in one aggregation buffer.  The groupBy reuses the
    window's hash partitioning on term, so the whole build is ONE
    shuffle of distinct (term, doc) pairs.  Restricted to df ≥ 5 terms
    to keep the report query bounded; the full index drops the HAVING.
    """
    docs = load_table(spark, sf_dir, "documents")
    # explode_outer: plain explode makes Catalyst infer a size()>0
    # filter that re-evaluates the regex per row (see corpus.py note)
    td = docs.selectExpr(
        "doc_id", f"explode_outer(array_distinct({_TOKENS})) AS term"
    ).filter(F.col("term").isNotNull())
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        td.withColumn("rn", F.row_number().over(w))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            # cast AFTER the sort: the list must order numerically (as
            # DuckDB's list_sort does); casting first would sort
            # lexicographically.  The explicit transform replaces the
            # version-fragile implicit array<bigint>→array<string>
            # coercion inside array_join (ADVICE r2).
            F.expr(
                "array_join(transform(array_sort(collect_list(CASE WHEN rn <= 20"
                " THEN doc_id END)), x -> CAST(x AS STRING)), ',')"
            ).alias("postings_csv"),
        )
        .filter(F.col("df") >= 5)
    )


INVERTED_INDEX_SQL = f"""
WITH td AS (
  SELECT doc_id, unnest(list_distinct({_D_TOKENS})) AS term FROM documents
),
r AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM td
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= 20)), ',')
         AS postings_csv
FROM r
GROUP BY term
HAVING count(*) >= 5
"""


# --- positional index + index-answered phrase search ------------------------
#
# The retrieval tier's third structure: ``inverted_index`` stores doc
# sets, this stores token POSITIONS, which is what phrase and proximity
# queries consume.  ``phrase_search`` then answers a two-word phrase
# from position postings alone — positions of w₁ shifted by one
# intersected with positions of w₂ — never re-scanning text.
#
# Scale shape (positional_index): ONE exchange total — the exploded
# (doc, pos, term) stream is repartitioned on term, so the (term, doc)
# aggregation AND the per-term posting-cap window both reuse that
# partitioning (hash(term) satisfies the groupBy's (term, doc)
# clustering; a groupBy-first plan would shuffle twice).  Per-(term,doc)
# position lists cap at 8 and per-term postings at 10 via the ranked
# window — the same bounded-posting rule as inverted_index; stop-word
# skew concentrates on few reducers, the cap bounds their output.

POSITIONAL_MIN_DF = 40
POSITIONAL_DOC_CAP = 10
POSITIONAL_POS_CAP = 8
PHRASE = ("table", "hash")


def positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = (
        docs.selectExpr("doc_id", f"posexplode_outer({_TOKENS}) AS (pos0, term)")
        .filter(F.col("term").isNotNull())
        .selectExpr("doc_id", "pos0 + 1 AS pos", "term")
        .repartition("term")
    )
    per_doc = ex.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.expr(
            f"array_join(transform(slice(array_sort(collect_list(pos)), 1, "
            f"{POSITIONAL_POS_CAP}), x -> CAST(x AS STRING)), ',')"
        ).alias("positions_csv"),
    )
    w = Window.partitionBy("term")
    wo = Window.partitionBy("term").orderBy("doc_id")
    return (
        per_doc.withColumn("df", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(wo))
        .filter(
            (F.col("df") >= POSITIONAL_MIN_DF)
            & (F.col("rn") <= POSITIONAL_DOC_CAP)
        )
        .select("term", "doc_id", "tf", "positions_csv", "df")
    )


POSITIONAL_INDEX_SQL = f"""
WITH ex AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, unnest(t) AS term
  FROM (SELECT doc_id, {_D_TOKENS} AS t FROM documents)
),
per_doc AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         array_to_string(list_sort(list(pos))[1:{POSITIONAL_POS_CAP}], ',')
           AS positions_csv
  FROM ex GROUP BY term, doc_id
),
ranked AS (
  SELECT term, doc_id, tf, positions_csv,
         CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM per_doc
)
SELECT term, doc_id, tf, positions_csv, df
FROM ranked
WHERE df >= {POSITIONAL_MIN_DF} AND rn <= {POSITIONAL_DOC_CAP}
"""


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing the probe phrase, answered from position postings
    for the two probe terms only (filtered before any aggregation):
    one doc-keyed combine shuffle, intersection as an array expression."""
    w1, w2 = PHRASE
    docs = load_table(spark, sf_dir, "documents")
    ex = (
        docs.selectExpr("doc_id", f"posexplode_outer({_TOKENS}) AS (pos0, term)")
        .filter(F.col("term").isin(w1, w2))
        .selectExpr("doc_id", "pos0 + 1 AS pos", "term")
    )
    return (
        ex.groupBy("doc_id")
        .agg(
            F.expr(
                f"array_sort(collect_list(CASE WHEN term = '{w1}' THEN pos END))"
            ).alias("p1"),
            F.expr(
                f"array_sort(collect_list(CASE WHEN term = '{w2}' THEN pos END))"
            ).alias("p2"),
        )
        .selectExpr(
            "doc_id",
            "CAST(size(array_intersect(transform(p1, x -> x + 1), p2)) AS BIGINT)"
            " AS n_matches",
        )
        .filter(F.col("n_matches") > 0)
        .orderBy("doc_id")
    )


PHRASE_SEARCH_SQL = f"""
WITH ex AS (
  SELECT doc_id, unnest(generate_series(1, len(t))) AS pos, unnest(t) AS term
  FROM (SELECT doc_id, {_D_TOKENS} AS t FROM documents)
),
pp AS (
  SELECT doc_id,
         list_sort(list(pos) FILTER (WHERE term = '{PHRASE[0]}')) AS p1,
         list_sort(list(pos) FILTER (WHERE term = '{PHRASE[1]}')) AS p2
  FROM ex WHERE term IN ('{PHRASE[0]}', '{PHRASE[1]}')
  GROUP BY doc_id
)
SELECT doc_id,
       CAST(len(list_intersect(list_transform(p1, x -> x + 1), p2)) AS BIGINT)
         AS n_matches
FROM pp
WHERE len(list_intersect(list_transform(p1, x -> x + 1), p2)) > 0
ORDER BY doc_id
"""


# --- BM25-style ranked retrieval ---------------------------------------------
#
# Top-k documents for a fixed conjunctive probe query, scored with the
# BM25 term-frequency saturation (k1=1.2, b=0.75) and a LOG-FREE
# rational idf surrogate (N - df + 0.5)/(df + 0.5) — the classic
# Robertson-Spärck-Jones odds WITHOUT the ln wrapper, which keeps every
# arithmetic step a correctly-rounded IEEE double op (ln is libm-
# dependent; last-ulp divergence would break the bit-exact oracle).
# Per term the surrogate is strictly monotone in the classic idf.
#
# Scale shape — deliberately NOT the textbook explode+join pipeline:
# per-document tf for a FIXED term set is a higher-order-function
# projection (size(filter(tokens, = term))), so scoring is one corpus
# scan; the corpus statistics (N, total length, per-term df) aggregate
# to a SINGLE row that broadcasts back; top-k is orderBy+limit, which
# Spark plans as TakeOrdered (per-partition heaps + driver merge of k
# rows — no single-partition window at any scale).  Summation order
# across terms is a fixed textual expression, so the double result is
# bit-identical on every engine and any partitioning.

BM25_TERMS = ("the", "data", "model")
_D = "CAST({} AS DOUBLE)"


def _bm25_score(doc_tf: str, df_col: str) -> str:
    """Shared scoring snippet (both engines): BM25 saturation × rational
    idf.  All literals explicitly DOUBLE so neither engine slips into
    DECIMAL arithmetic."""
    tf, df = _D.format(doc_tf), _D.format(df_col)
    idf = f"(((CAST(n_docs AS DOUBLE) - {df}) + CAST(0.5 AS DOUBLE)) / ({df} + CAST(0.5 AS DOUBLE)))"
    tfp = (
        f"(({tf} * CAST(2.2 AS DOUBLE)) / "
        f"({tf} + (CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + "
        f"(CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE) / avgdl))))))"
    )
    return (
        f"CASE WHEN {doc_tf} > 0 THEN ({idf} * {tfp}) "
        "ELSE CAST(0 AS DOUBLE) END"
    )


def bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the fixed probe query, BM25-scored."""
    docs = load_table(spark, sf_dir, "documents")
    tf_cols = [
        f"size(filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    ]
    per_doc = docs.selectExpr("doc_id", f"{_TOKENS} AS toks").selectExpr(
        "doc_id", "size(toks) AS dl", *tf_cols
    )
    stats = per_doc.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_docs",
        "CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl",
        *[
            f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
            for i in range(len(BM25_TERMS))
        ],
    )
    score = " + ".join(
        f"({_bm25_score(f'tf_{i}', f'df_{i}')})" for i in range(len(BM25_TERMS))
    )
    scored = per_doc.crossJoin(F.broadcast(stats)).selectExpr(
        "doc_id", f"({score}) AS score"
    )
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(20)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(w).alias("rank"), "doc_id", "score"
    )


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"({_bm25_score(f'tf_{i}', f'df_{i}')})" for i in range(len(BM25_TERMS))
    )
    return f"""
WITH toked AS (SELECT doc_id, {_D_TOKENS} AS toks FROM documents),
per_doc AS (SELECT doc_id, len(toks) AS dl, {tf_cols} FROM toked),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {df_cols}
  FROM per_doc
),
scored AS (
  SELECT doc_id, ({score}) AS score FROM per_doc CROSS JOIN stats
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
       doc_id, score
FROM scored ORDER BY score DESC, doc_id LIMIT 20
"""


BM25_RANK_SQL = _bm25_sql()


# --- n-gram language-model counts -------------------------------------------
#
# The count statistics a Kneser-Ney-smoothed bigram LM is built from,
# all integers (the smoothing DIVISIONS stay with the consumer — ln/
# float ratios never reach oracle-compared output):
#   c(w1,w2)            bigram count
#   c(w1,·)             left context total
#   N1+(·,w2)           continuation count (distinct left contexts) —
#                       the KN novelty signal
#   N1+(w1,·)           distinct right continuations of w1
# Top-50 bigrams by count (ties: lexicographic) keeps output bounded.
#
# Scale shape: adjacent pairs come from a per-document HOF zip of the
# token array with itself shifted (no self-join, no posexplode+join);
# one (w1,w2) aggregation; the context/continuation tables aggregate
# FROM the bigram table (vocabulary-sized, not corpus-sized) and join
# back broadcast-style.

NGRAM_TOP_K = 50


def ngram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # explode_outer + NULL post-filter, NOT plain explode: Catalyst
    # infers size>0 from explode and re-inlines the whole regexp+slice
    # chain below the exchange (the decontam lesson, ARCHITECTURE.md).
    pairs = docs.selectExpr(f"{_TOKENS} AS toks").selectExpr(
        "explode_outer(zip_with("
        " slice(toks, 1, greatest(size(toks) - 1, 0)),"
        " slice(toks, 2, greatest(size(toks) - 1, 0)),"
        " (a, b) -> struct(a AS w1, b AS w2))) AS p"
    ).filter(F.col("p").isNotNull())
    big = pairs.groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")).agg(
        F.count(F.lit(1)).alias("c_bigram")
    )
    left_tot = big.groupBy("w1").agg(
        F.sum("c_bigram").alias("c_left_total"),
        F.count(F.lit(1)).alias("n_right_types"),
    )
    cont = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n_left_types"))
    return (
        big.join(F.broadcast(left_tot), "w1")
        .join(F.broadcast(cont), "w2")
        .selectExpr(
            "w1",
            "w2",
            "c_bigram",
            "CAST(c_left_total AS BIGINT) AS c_left_total",
            "CAST(n_right_types AS BIGINT) AS n_right_types",
            "CAST(n_left_types AS BIGINT) AS n_left_types",
        )
        .orderBy(F.col("c_bigram").desc(), "w1", "w2")
        .limit(NGRAM_TOP_K)
    )


NGRAM_LM_SQL = f"""
WITH toked AS (SELECT {_D_TOKENS} AS toks FROM documents),
pairs AS (
  SELECT unnest(CASE WHEN len(toks) < 2 THEN list_zip([], [])
                ELSE list_zip(toks[1:len(toks)-1], toks[2:len(toks)])
                END) AS p
  FROM toked
),
big AS (
  SELECT p[1] AS w1, p[2] AS w2, CAST(count(*) AS BIGINT) AS c_bigram
  FROM pairs GROUP BY 1, 2
),
left_tot AS (
  SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_left_total,
         CAST(count(*) AS BIGINT) AS n_right_types
  FROM big GROUP BY w1
),
cont AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n_left_types FROM big GROUP BY w2
)
SELECT big.w1, big.w2, c_bigram, c_left_total, n_right_types, n_left_types
FROM big JOIN left_tot USING (w1) JOIN cont USING (w2)
ORDER BY c_bigram DESC, w1, w2
LIMIT {NGRAM_TOP_K}
"""




# --- LM-frequency document scoring (perplexity-filter shape) ----------------
#
# The model-based quality filter a pretraining pipeline runs next to the
# heuristic ratios: score each document by how typical its bigrams are
# under the corpus's own bigram statistics (the KenLM-perplexity-filter
# shape — CCNet, Wenzek et al. 2020 — with integer corpus frequencies
# standing in for log-probs: no transcendentals may reach oracle-
# compared output, and mean corpus frequency ranks documents the same
# direction as negative perplexity for a count LM).
#
# Scale shape: ONE expression builds (doc_id, w1, w2) pairs; the corpus
# count table aggregates from that lineage (vocabulary²-bounded, Zipf-
# concentrated) and joins back.  The pair lineage is deliberately
# recomputed on the scoring side rather than persisted — a corpus-sized
# exploded cache is worse than a second scan at 100 TB, while the vocab-
# sized count table is what a real pipeline persists and reuses across
# batches.  The count-table join key is Zipf-skewed; AQE's skew-join
# split handles the hot bigrams (same posture as join_skew_report).

_PAIRS_EXPR = (
    "explode_outer(zip_with("
    " slice(toks, 1, greatest(size(toks) - 1, 0)),"
    " slice(toks, 2, greatest(size(toks) - 1, 0)),"
    " (a, b) -> struct(a AS w1, b AS w2))) AS p"
)


def lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    pairs = docs.selectExpr("doc_id", f"{_TOKENS} AS toks").selectExpr(
        "doc_id", _PAIRS_EXPR
    ).selectExpr("doc_id", "p.w1 AS w1", "p.w2 AS w2")
    big = (
        pairs.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bigram"))
    )
    # left join keeps zero-bigram docs (w1 NULL misses → n_bigrams 0)
    return (
        pairs.join(big, ["w1", "w2"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("w1")).alias("n_bigrams"),
            F.coalesce(F.sum("c_bigram"), F.lit(0)).alias("freq_sum"),
        )
        .selectExpr(
            "doc_id",
            "n_bigrams",
            "freq_sum",
            "CASE WHEN n_bigrams > 0 THEN CAST(freq_sum AS DOUBLE) / n_bigrams"
            " ELSE NULL END AS mean_freq",
        )
    )


LM_DOC_SCORE_SQL = f"""
WITH toked AS (SELECT doc_id, {_D_TOKENS} AS toks FROM documents),
pairs AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) < 2 THEN [NULL]
                  ELSE list_zip(toks[1:len(toks)-1], toks[2:len(toks)])
                  END) AS p
    FROM toked
  )
),
big AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bigram
  FROM pairs WHERE w1 IS NOT NULL GROUP BY 1, 2
)
SELECT doc_id,
       CAST(count(pairs.w1) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sum(c_bigram), 0) AS BIGINT) AS freq_sum,
       CASE WHEN count(pairs.w1) > 0
            THEN CAST(coalesce(sum(c_bigram), 0) AS DOUBLE) / count(pairs.w1)
            ELSE NULL END AS mean_freq
FROM pairs
LEFT JOIN big ON pairs.w1 = big.w1 AND pairs.w2 = big.w2
GROUP BY doc_id
"""


# --- RAG chunking via a Python UDTF ------------------------------------------
#
# The one Python UDTF in the engine, and deliberately so: overlapping-
# window chunking EMITS A VARIABLE NUMBER OF ROWS PER INPUT ROW with
# per-row loop state (offset stepping) — the table-function shape, and
# the RAG-ingestion primitive (chunk → embed → index).  Fixed-size
# chunking IS expressible with sequence+transform (passage_dedup does
# exactly that), so the docstring contract is: prefer the built-in HOF
# form in hot paths; this covers the UDTF API surface with a real use.
# Arrow-optimized (useArrow) and deterministic, so it oracle-checks.

CHUNK_SIZE = 32
CHUNK_STRIDE = 24  # size - overlap of 8


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document via a lateral-joined
    Python UDTF: ``doc_id, chunk_idx, n_tokens, chunk_md5``."""
    from pyspark.sql.functions import udtf

    size, stride = CHUNK_SIZE, CHUNK_STRIDE

    # useArrow: the UDTF's rows cross the JVM/Python boundary in Arrow
    # batches instead of pickled row-at-a-time (BatchEvalPython) —
    # the same fast path mapInPandas uses, pinned by the registry-wide
    # plan-governance test
    @udtf(
        returnType="chunk_idx int, n_tokens bigint, chunk_md5 string",
        useArrow=True,
    )
    class ChunkUdtf:
        def eval(self, text: str):
            import hashlib
            import re as _re

            toks = _re.findall(r"[a-z0-9]+", (text or "").lower())
            for k, off in enumerate(range(0, len(toks), stride)):
                chunk = toks[off : off + size]
                yield (
                    k,
                    len(chunk),
                    hashlib.md5(" ".join(chunk).encode()).hexdigest(),
                )

    spark.udtf.register("dbdiff_chunk_udtf", ChunkUdtf)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__dbdiff_chunk_src")
    return spark.sql(
        "SELECT doc_id, c.chunk_idx, c.n_tokens, c.chunk_md5 "
        "FROM __dbdiff_chunk_src, LATERAL dbdiff_chunk_udtf(text) c"
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (SELECT doc_id, {_D_TOKENS} AS t FROM documents),
offs AS (
  SELECT doc_id, t, off,
         CAST(off // {CHUNK_STRIDE} AS INT) AS chunk_idx
  FROM toks, unnest(CASE WHEN len(t) = 0 THEN []
                         ELSE generate_series(0, len(t) - 1, {CHUNK_STRIDE}) END) AS u(off)
)
SELECT doc_id, chunk_idx,
       CAST(len(t[off + 1 : off + {CHUNK_SIZE}]) AS BIGINT) AS n_tokens,
       md5(array_to_string(t[off + 1 : off + {CHUNK_SIZE}], ' ')) AS chunk_md5
FROM offs
"""


# --- hashed linear classifier inference (fastText-shaped) -------------------
#
# Quality *classifier* inference as distinct from the heuristic
# ``text_quality`` ratios: bag of hashed features (unigrams + '_'-joined
# bigrams, the fastText / Joulin et al. 2016 hashing trick), each
# feature's weight looked up by hash, scores summed per document.  The
# weight "table" here is hash-derived (w(h) = top-3 hex digits of
# md5(feature) − 2048, a symmetric integer in [−2048, 2047]) because the
# container ships no trained model — a real deployment broadcasts a
# bucket→weight table and the plan shape is unchanged (the lookup stays
# a map-side expression or a broadcast hash join; never a shuffle).
#
# Scale shape: one corpus scan → explode → codegen'd md5+weight
# expression → per-doc sum with map-side combine (the simhash lesson:
# exploded codegen beats interpreted higher-order lambdas).  The only
# shuffle carries one 3-column row per document.

_HEX = "0123456789abcdef"


def _weight_expr(h: str) -> str:
    """Integer weight in [-2048, 2047] from a hex digest's top 3 chars —
    identical arithmetic in Spark and DuckDB (instr/substr agree)."""
    return (
        f"((instr('{_HEX}', substr({h}, 1, 1)) - 1) * 256"
        f" + (instr('{_HEX}', substr({h}, 2, 1)) - 1) * 16"
        f" + (instr('{_HEX}', substr({h}, 3, 1)) - 1) - 2048)"
    )


def _features_spark(tokens: str) -> str:
    bigrams = (
        f"CASE WHEN size({tokens}) >= 2 THEN "
        f"transform(sequence(1, size({tokens}) - 1), "
        f"i -> concat(element_at({tokens}, i), '_', element_at({tokens}, i + 1))) "
        f"ELSE array() END"
    )
    return f"concat({tokens}, {bigrams})"


def classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document linear-classifier score and keep/drop verdict."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark, "doc_id")
    ex = (
        docs.selectExpr("doc_id", f"{_features_spark(_TOKENS)} AS feats")
        # explode_outer: zero-feature docs must still score (as 0), and
        # plain explode would re-evaluate the regex via an inferred
        # size()>0 filter (corpus.py note)
        .selectExpr("doc_id", "explode_outer(feats) AS f")
        .selectExpr("doc_id", "md5(f) AS h")
    )
    return (
        ex.groupBy("doc_id")
        .agg(
            F.count(F.col("h")).alias("n_feats"),
            F.coalesce(
                F.sum(F.expr(_weight_expr("h"))), F.lit(0)
            ).alias("score"),
        )
        .selectExpr(
            "doc_id",
            "n_feats",
            "score",
            "CASE WHEN score > 0 THEN 'keep' ELSE 'drop' END AS verdict",
        )
    )


CLASSIFIER_SCORE_SQL = f"""
WITH tok AS (SELECT doc_id, {_D_TOKENS} AS t FROM documents),
feat AS (
  SELECT doc_id,
         list_concat(
           t,
           CASE WHEN len(t) >= 2 THEN
             list_transform(generate_series(1, len(t) - 1),
                            i -> concat(t[i], '_', t[i + 1]))
           ELSE []::VARCHAR[] END
         ) AS feats
  FROM tok
)
SELECT doc_id,
       CAST(len(feats) AS BIGINT) AS n_feats,
       CAST(coalesce(
         list_sum(list_transform(feats, f -> {_weight_expr('md5(f)')})), 0
       ) AS BIGINT) AS score,
       CASE WHEN coalesce(
         list_sum(list_transform(feats, f -> {_weight_expr('md5(f)')})), 0
       ) > 0 THEN 'keep' ELSE 'drop' END AS verdict
FROM feat
"""


QUERIES = {
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "classifier_score": (classifier_score, CLASSIFIER_SCORE_SQL),
    "lm_doc_score": (lm_doc_score, LM_DOC_SCORE_SQL),
    "positional_index": (positional_index, POSITIONAL_INDEX_SQL),
    "phrase_search": (phrase_search, PHRASE_SEARCH_SQL),
    "bm25_rank": (bm25_rank, BM25_RANK_SQL),
    "ngram_lm_counts": (ngram_lm_counts, NGRAM_LM_SQL),
    "inverted_index": (inverted_index, INVERTED_INDEX_SQL),
    "train_val_split": (train_val_split, TRAIN_VAL_SPLIT_SQL),
    "pii_scrub": (pii_scrub, PII_SCRUB_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "top_terms_per_doc": (top_terms_per_doc, TOP_TERMS_SQL),
    "lang_id": (lang_id, LANG_ID_SQL),
    "token_stats": (token_stats, TOKEN_STATS_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "corpus_clean_stats": (corpus_clean_stats, CORPUS_CLEAN_STATS_SQL),
    "token_histogram": (token_histogram, TOKEN_HISTOGRAM_SQL),
    "repetition_ratio": (repetition_ratio, REPETITION_RATIO_SQL),
    "gopher_repetition": (gopher_repetition, GOPHER_REPETITION_SQL),
    "vocab_coverage": (vocab_coverage, VOCAB_COVERAGE_SQL),
    "vocab_growth_curve": (vocab_growth_curve, VOCAB_GROWTH_SQL),
    "chunk_documents": (chunk_documents, CHUNK_DOCUMENTS_SQL),
}
