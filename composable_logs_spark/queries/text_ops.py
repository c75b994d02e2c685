"""Text-analysis operators over the documents table (north-star L5 ops:
token counting, quality scoring, language-ID heuristic, fingerprinting).

All pure built-in expressions (split/filter/aggregate/md5) — no Python
UDFs — so they run JVM-side at 100 TB. Each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on"]


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


# ---------------------------------------------------------------------------
# Token counting (whitespace tokenization + distinct counts + avg length).
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length("text").alias("text_len"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


TOKEN_SQL = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT)            AS n_tokens,
       CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS INT)
                                                                           AS n_unique_tokens,
       CAST(length(text) AS INT)                                           AS text_len,
       round(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                     t -> CAST(length(t) AS DOUBLE)))
             / len(string_split_regex(trim(text), '\\s+')), 4)             AS avg_token_len
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scoring: stopword ratio, lexical diversity, length band.
def text_quality_scores(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    diversity = F.size(F.array_distinct(toks)) / n_tokens
    return d.select(
        "doc_id",
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(diversity, 4).alias("lexical_diversity"),
        F.when(n_tokens < 30, "short")
        .when(n_tokens <= 80, "medium")
        .otherwise("long")
        .alias("length_band"),
        (
            (n_stop / n_tokens > 0.02) & (diversity > 0.2) & (n_tokens >= 20)
        ).alias("passes_quality"),
    )


QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), m AS (
  SELECT doc_id,
         len(toks)                                                          AS n_tokens,
         len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','on')))
                                                                            AS n_stop,
         len(list_distinct(toks))                                           AS n_uniq
  FROM t
)
SELECT doc_id,
       round(CAST(n_stop AS DOUBLE) / n_tokens, 4)  AS stopword_ratio,
       round(CAST(n_uniq AS DOUBLE) / n_tokens, 4)  AS lexical_diversity,
       CASE WHEN n_tokens < 30 THEN 'short'
            WHEN n_tokens <= 80 THEN 'medium'
            ELSE 'long' END                         AS length_band,
       (CAST(n_stop AS DOUBLE) / n_tokens > 0.02
        AND CAST(n_uniq AS DOUBLE) / n_tokens > 0.2
        AND n_tokens >= 20)                         AS passes_quality
FROM m
"""


# ---------------------------------------------------------------------------
# Language-ID heuristic: marker-token scoring (n-gram heuristic family).
# The same scoring runs in both engines; prediction = argmax score with a
# deterministic tie-break on language code order.
_LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["agg", "vector", "group"],
    "es": ["data", "stream", "big"],
    "fr": ["window", "line", "small"],
    "zh": ["merge", "batch", "join"],
}


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = _tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.filter(toks, lambda t: t.isin(markers))).alias(f"score_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    # argmax with deterministic tie-break: compare in fixed language order,
    # strict > keeps the earliest language on ties.
    langs = list(_LANG_MARKERS)
    best = F.lit(langs[0])
    best_score = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.select(
        "doc_id", "actual_lang", best.alias("predicted_lang"), best_score.alias("score")
    )


def _lang_sql() -> str:
    score_cols = ",\n         ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS score_{}".format(
            ", ".join(f"'{m}'" for m in markers), lang
        )
        for lang, markers in _LANG_MARKERS.items()
    )
    langs = list(_LANG_MARKERS)
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END"
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, lang AS actual_lang,
         {score_cols}
  FROM t
)
SELECT doc_id, actual_lang,
       {pred} AS predicted_lang,
       CAST({best} AS INT) AS score
FROM s
"""


# ---------------------------------------------------------------------------
# Document fingerprinting: md5 over the normalised text, plus a coarse
# locality bucket from the fingerprint prefix (rolling-hash family).
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", "")
    fp = F.md5(norm)
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 4), 16, 10).cast("long").alias("bucket"),
    )


FINGERPRINT_SQL = """
SELECT doc_id,
       md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))         AS fingerprint,
       CAST(('0x' || substring(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 4))
            AS BIGINT)                                                  AS bucket
FROM documents
"""


QUERIES = {
    "text_token_stats": QuerySpec(text_token_stats, TOKEN_SQL),
    "text_quality_scores": QuerySpec(text_quality_scores, QUALITY_SQL),
    "text_lang_id": QuerySpec(text_lang_id, _lang_sql()),
    "text_fingerprint": QuerySpec(text_fingerprint, FINGERPRINT_SQL),
}
