"""CCNet perplexity bucketing (Wenzek et al. 2020): split each
language's corpus into head / middle / tail TERCILES by language-model
score — the step the CCNet pipeline runs between language ID and the
final mixture, so that downstream consumers can choose "head only" or
"head+middle" slices per language.

``pipeline_ccnet_recipe``'s LM stage applies this query's rank-cut
device as a keep gate (head+middle by trigram score); this query
reports the full three-bucket breakdown on the add-1 bigram scale.
Boundaries are RANK-based tercile cuts
(doc at rank r of n is head iff 3r <= n, middle iff 3r <= 2n) —
deliberately NOT interpolated percentiles, so there is no float
quantile definition to keep aligned across engines.

Scoring reuses ``text_ops.bigram_doc_scores`` — the corpus-trained
add-1 bigram LM in exact integer micro-nats. (The engine's highest-
fidelity KenLM stand-in is now the trigram stupid-backoff model,
``trigram_q``, which the CCNet recipe's gate uses; this query stays on
the bigram scale so its bucket boundaries remain comparable across
rounds.)

Scale shape — the TWO-PASS rank-cut form (the SCALE.md remedy, now the
shipped plan; earlier rounds sorted every language's doc rows through
one window task, the acknowledged 100x killer for a dominant
language):

1. PASS 1 collapses the (doc_id, lang, score) stream into the
   per-(lang, score_micro) HISTOGRAM — one map-side-combinable hash
   aggregate; partition size is DISTINCT integer scores per language
   (score_micro = lp_sum div n_bigrams is heavily collided), not
   documents.
2. PASS 2 runs the cumulative-rank window over histogram rows only —
   the same bounded-frame trick as ``classifier_group_auc`` — and
   derives each language's two rank-cut positions (n div 3,
   2n div 3) from the broadcast per-language totals.
3. Bucket assignment is pure comparison arithmetic on (cum_start,
   cum_end) x (lo, hi]: a score group contributes
   ``least(hi, cum_end) - greatest(lo, cum_start)`` docs to a bucket.
   No doc row is ever sorted, and no per-doc second pass is needed:
   the per-bucket outputs (count, best/worst score) are exactly
   determined by the histogram, because the old plan's doc_id
   tie-break only permutes docs WITHIN one score value — invariant
   for every reported aggregate. Semantics (and the oracle) are
   byte-identical to the windowed form; ``tests/
   test_perplexity_buckets.py`` asserts the plan has no doc-grain
   row_number and its only window sits above the histogram aggregate.
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
    per_doc = scores.join(d.select("doc_id", "lang"), "doc_id")
    # PASS 1: the only doc-grain aggregate — per-(lang, score) histogram.
    # cached (a handful of rows per language): both the cumulative window
    # and the per-language totals read it — without the cache the whole
    # bigram-LM pipeline would execute twice (dedup_q.py:255 discipline;
    # pinned because the returned plan is lazy).
    hist = (
        per_doc.groupBy("lang", "score_micro").agg(F.count("*").alias("c")).cache()
    )
    # PASS 2: cumulative ranks over HISTOGRAM rows (never doc rows).
    w = Window.partitionBy("lang").orderBy(F.desc("score_micro"))
    cum = hist.withColumn("cum_end", F.sum("c").over(w)).withColumn(
        "cum_start", F.col("cum_end") - F.col("c")
    )
    n = hist.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    # rank r is head iff 3r <= n  <=>  r <= n div 3 (r integer), so the
    # three buckets are the rank ranges (0, n div 3], (n div 3,
    # 2n div 3], (2n div 3, n]
    bucket_spec = F.explode(
        F.array(
            F.struct(
                F.lit("head").alias("bucket"),
                F.lit(0).cast("long").alias("lo"),
                F.expr("n_lang div 3").alias("hi"),
            ),
            F.struct(
                F.lit("middle").alias("bucket"),
                F.expr("n_lang div 3").alias("lo"),
                F.expr("(2 * n_lang) div 3").alias("hi"),
            ),
            F.struct(
                F.lit("tail").alias("bucket"),
                F.expr("(2 * n_lang) div 3").alias("lo"),
                F.col("n_lang").alias("hi"),
            ),
        )
    ).alias("b")
    assigned = (
        cum.join(F.broadcast(n), "lang")
        .select("lang", "score_micro", "cum_start", "cum_end", bucket_spec)
        .withColumn(
            "n_in",
            F.least("b.hi", "cum_end") - F.greatest("b.lo", "cum_start"),
        )
        .where(F.col("n_in") > 0)
    )
    return (
        assigned.groupBy("lang", F.col("b.bucket").alias("bucket"))
        .agg(
            F.sum("n_in").alias("n_docs"),
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
