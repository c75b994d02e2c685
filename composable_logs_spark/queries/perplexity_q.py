"""CCNet perplexity bucketing (Wenzek et al. 2020): split each
language's corpus into head / middle / tail TERCILES by language-model
score — the step the CCNet pipeline runs between language ID and the
final mixture, so that downstream consumers can choose "head only" or
"head+middle" slices per language.

Differences from ``pipeline_ccnet_recipe``'s LM stage: the recipe uses
a FIXED floor (one global constant); the real CCNet bucket boundaries
are data-derived per language. Boundaries here are RANK-based tercile
cuts (doc at rank r of n is head iff 3r <= n, middle iff 3r <= 2n) —
deliberately NOT interpolated percentiles, so there is no float
quantile definition to keep aligned across engines; ranks over the
exact-integer score (total micro-nats div bigrams, ties broken by
doc_id) are identical everywhere.

Scoring reuses ``text_ops.bigram_doc_scores`` — the corpus-trained
add-1 bigram LM in exact integer micro-nats (the KenLM stand-in the
bigram-logprob query documents).

Scale shape: the LM passes are text_ops' (two map-side-combinable hash
aggs + one equi-join back onto the bigram stream); bucketing adds one
window partitioned BY LANGUAGE over a doc-count-sized frame of
(doc_id, lang, score) triples — at 100 TB that frame is ~0.1% of the
corpus bytes, and the per-language partition is exactly how CCNet
shards this step anyway. Output is the per-(lang, bucket) summary a
mixture step consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec, load
from .text_ops import bigram_doc_scores


def perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    scores = bigram_doc_scores(d.select("doc_id", "text")).select(
        "doc_id",
        F.expr("lp_sum_micro div n_bigrams").alias("score_micro"),
    )
    # cached (one narrow row per doc): both the rank window and the
    # per-language counts read per_doc — without the cache the whole
    # bigram-LM pipeline would execute twice (dedup_q.py:255 discipline;
    # pinned because the returned plan is lazy)
    per_doc = scores.join(d.select("doc_id", "lang"), "doc_id").cache()
    # rank best-scoring (least negative) first, CCNet's head
    w = Window.partitionBy("lang").orderBy(F.desc("score_micro"), "doc_id")
    n = per_doc.groupBy("lang").agg(F.count("*").alias("n_lang"))
    bucketed = (
        per_doc.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(n), "lang")
        .withColumn(
            "bucket",
            F.when(F.col("rn") * 3 <= F.col("n_lang"), F.lit("head"))
            .when(F.col("rn") * 3 <= F.col("n_lang") * 2, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
    )
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("score_micro").alias("best_micro"),
            F.min("score_micro").alias("worst_micro"),
        )
        .orderBy("lang", "bucket")
    )


_PPL_SQL = """
WITH arrs AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents
),
big AS (
  SELECT doc_id, arr[x] AS w1, arr[x + 1] AS w2
  FROM arrs, UNNEST(generate_series(1, len(arr) - 1)) AS u(x)
  WHERE len(arr) >= 2
),
uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c1
  FROM (SELECT unnest(arr) AS tok FROM arrs) GROUP BY tok
),
vs AS (SELECT count(*) AS v FROM uni),
lp AS (
  SELECT b.w1, b.w2,
         CAST(round(ln((count(*) + 1)
                       / CAST(u.c1 + (SELECT v FROM vs) AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS lp_micro
  FROM big b JOIN uni u ON u.tok = b.w1
  GROUP BY b.w1, b.w2, u.c1
),
doc_scores AS (
  SELECT b.doc_id,
         CAST(SUM(l.lp_micro) AS BIGINT) // COUNT(*) AS score_micro
  FROM big b JOIN lp l ON b.w1 = l.w1 AND b.w2 = l.w2
  GROUP BY b.doc_id
),
per_doc AS (
  SELECT s.doc_id, d.lang, s.score_micro
  FROM doc_scores s JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT lang, score_micro,
         row_number() OVER (PARTITION BY lang
                            ORDER BY score_micro DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM per_doc
)
SELECT lang,
       CASE WHEN rn * 3 <= n_lang THEN 'head'
            WHEN rn * 3 <= n_lang * 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       MAX(score_micro) AS best_micro,
       MIN(score_micro) AS worst_micro
FROM ranked
GROUP BY 1, 2
ORDER BY lang, bucket
"""


QUERIES = {
    "perplexity_buckets": QuerySpec(perplexity_buckets, _PPL_SQL),
}
