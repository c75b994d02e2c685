"""Vocabulary-growth curve + Heaps'-law exponent (Heaps 1978): the
corpus-planning statistic a training-data pipeline reads before sizing
a tokenizer or estimating dedup head-room — V(N) ≈ K·N^β, where V is
distinct vocabulary and N the tokens scanned so far. β near 1 means the
corpus keeps minting new terms (noisy / unnormalised text); β well
under 1 means vocabulary saturation (and explains why the substring
family's gram tables flatten — SCALE.md's measured 1.13-1.33x per 2x
rows IS this curve from the other side).

Growth checkpoints are ten doc_id-RANGE deciles (pure integer
arithmetic over the corpus min/max id — no global sort, no
partition-less window; the curve's x-axis is the measured cumulative
token count, so uneven decile populations bend nothing). The cumulative
vocabulary at decile d is computed with the FIRST-OCCURRENCE trick:
tag each term with the minimal decile it appears in (one groupBy), then
V(d) is a 10-row running sum — the corpus is scanned ONCE, never once
per checkpoint.

β is the closed-form OLS slope of ln V on ln N over the (<= 10)
checkpoints, rounded to 4dp (sum-order double noise over 10 points is
~1e-15, far inside the rounding).

100 TB shape: one tokenize pass, two token-frame aggregations (term →
min-decile is vocab-sized, decile → count is 10 rows), and every
cumulative/regression step runs over <= 10 rows via broadcast joins.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no text-statistics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_N_DECILES = 10


def text_heaps_law(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents").select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("toks")
    )
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    tokens = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"CAST(({_N_DECILES} * (doc_id - lo))"
                " div (hi - lo + 1) + 1 AS INT)"
            ).alias("decile"),
            F.explode("toks").alias("term"),
        )
    )
    per_decile_tokens = tokens.groupBy("decile").agg(
        F.count("*").alias("n_tokens")
    )
    # first-occurrence trick: a term contributes to V(d) for every
    # d >= its minimal decile — one vocab-sized aggregation, then 10 rows
    new_terms = (
        tokens.groupBy("term")
        .agg(F.min("decile").alias("md"))
        .groupBy("md")
        .agg(F.count("*").alias("n_new"))
    )
    # triangular accumulations over the <= 10 checkpoint rows
    cum_tokens = (
        per_decile_tokens.alias("a")
        .join(
            F.broadcast(per_decile_tokens.alias("b")),
            F.col("b.decile") <= F.col("a.decile"),
        )
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(F.sum("b.n_tokens").alias("cum_tokens"))
    )
    cum_vocab = (
        per_decile_tokens.select("decile")
        .join(F.broadcast(new_terms), F.col("md") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("n_new").alias("cum_vocab"))
    )
    curve = cum_tokens.join(cum_vocab, "decile")
    pts = curve.select(
        "decile",
        "cum_tokens",
        "cum_vocab",
        F.log("cum_tokens").alias("x"),
        F.log("cum_vocab").alias("y"),
    )
    ols = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            4,
        ).alias("heaps_beta_r")
    )
    return pts.crossJoin(F.broadcast(ols)).select(
        "decile", "cum_tokens", "cum_vocab", "heaps_beta_r"
    )


HEAPS_SQL = f"""
WITH docs AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
tokens AS (
  SELECT CAST(({_N_DECILES} * (doc_id - b.lo)) // (b.hi - b.lo + 1) + 1
           AS INT) AS decile,
         unnest(toks) AS term
  FROM docs CROSS JOIN bounds b
),
per_decile_tokens AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_tokens
  FROM tokens GROUP BY decile
),
new_terms AS (
  SELECT md, CAST(count(*) AS BIGINT) AS n_new
  FROM (SELECT term, min(decile) AS md FROM tokens GROUP BY term)
  GROUP BY md
),
cum_tokens AS (
  SELECT a.decile, CAST(sum(b.n_tokens) AS BIGINT) AS cum_tokens
  FROM per_decile_tokens a
  JOIN per_decile_tokens b ON b.decile <= a.decile
  GROUP BY a.decile
),
cum_vocab AS (
  SELECT d.decile, CAST(sum(n.n_new) AS BIGINT) AS cum_vocab
  FROM (SELECT decile FROM per_decile_tokens) d
  JOIN new_terms n ON n.md <= d.decile
  GROUP BY d.decile
),
pts AS (
  SELECT t.decile, t.cum_tokens, v.cum_vocab,
         ln(t.cum_tokens) AS x, ln(v.cum_vocab) AS y
  FROM cum_tokens t JOIN cum_vocab v ON t.decile = v.decile
),
ols AS (
  SELECT round((count(*) * sum(x * y) - sum(x) * sum(y))
             / (count(*) * sum(x * x) - sum(x) * sum(x)), 4)
           AS heaps_beta_r
  FROM pts
)
SELECT decile, cum_tokens, cum_vocab, heaps_beta_r
FROM pts CROSS JOIN ols
"""


QUERIES = {
    "text_heaps_law": QuerySpec(text_heaps_law, HEAPS_SQL),
}
