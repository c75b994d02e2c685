"""Asymmetric n-gram CONTAINMENT dedup (Broder 1997, "On the
resemblance and containment of documents"): find documents whose
shingle set is (nearly) a subset of a LARGER document's —

    containment(A, B) = |S(A) ∩ S(B)| / |S(A)|

The symmetric near-dup family (``dedup_ngram_jaccard``,
``dedup_minhash_lsh``) misses exactly this shape: a quote, boilerplate
block, or truncated crawl of A inside a much larger B has high
containment but LOW Jaccard (the union is dominated by B), and it is
the shape a training-data pipeline must catch to avoid double-counting
content that rides inside bigger pages. Requiring ``n_b > n_a`` keeps
the output to proper containments — the symmetric pairs are the other
queries' job.

Candidate generation is the rare-shingle blocking of
``dedup_ngram_jaccard`` (shared constants, same discipline: never
all-pairs — only pairs sharing >= _MIN_COMMON shingles with document
frequency <= _MAX_DF are verified), then containment is computed
EXACTLY over the full shingle sets of candidates only. The DF cut gates
candidate generation; it does not bias the statistic.

100 TB shape: one shingle pass over the corpus, one self-join of the
RARE-shingle postings (bounded fan-out: <= _MAX_DF² pairs per shingle),
and the exact verify touches candidates only, with shingle arrays
riding the candidate join the same way the Jaccard verify does.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no dedup surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from .dedup_q import (
    _MAX_DF,
    _MIN_COMMON,
    _NEAR_DUP_CORPUS_SQL,
    _SHINGLES_SQL,
    _near_dup_corpus,
    _shingles,
)

_MIN_CONTAINMENT = 0.9


def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    # r14 (guide §2.3/§4.1): dictionary-encoded postings (see
    # dedup_q._encoded_shingle_postings) — the directed candidate
    # self-join equi-joins on dense 8-byte ids and the exact verify
    # intersects long arrays; |A ∩ B| / |A| / |B| are invariant under
    # the injective relabeling, so the output is bit-identical. The
    # encode join replaces the old rare join; inv_enc arrives
    # checkpointed, so both self-join sides share one materialization.
    from .dedup_q import _encoded_shingle_postings

    corpus = _near_dup_corpus(spark, sf)
    docs = corpus.select(
        "doc_id", _shingles(F.col("text")).alias("shingles")
    )
    inv_enc, doc_sids = _encoded_shingle_postings(docs)
    inv_rare = inv_enc.where(F.col("df") <= _MAX_DF).select("doc_id", "sid")
    # DIRECTED candidates (a != b, both orientations): containment is
    # asymmetric, so (small-in-big) and (big-in-small) are different
    # hypotheses — the n_b > n_a filter below keeps the proper ones
    cand = (
        inv_rare.alias("a")
        .join(inv_rare.alias("b"), "sid")
        .where(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_rare_common"))
        .where(F.col("n_rare_common") >= _MIN_COMMON)
        .select("doc_a", "doc_b")
    )
    sh = doc_sids
    return (
        cand.join(
            sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "sids", "sh_a"
            ),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "sids", "sh_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_shared"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        .withColumn(
            "containment_r", F.round(F.col("n_shared") / F.col("n_a"), 4)
        )
        .where(
            (F.col("containment_r") >= _MIN_CONTAINMENT)
            & (F.col("n_b") > F.col("n_a"))
        )
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b", "containment_r")
    )


CONTAINMENT_SQL = f"""
WITH corpus AS ({_NEAR_DUP_CORPUS_SQL}),
docs AS (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM corpus
),
inv AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM docs
),
rare AS (
  SELECT shingle FROM inv GROUP BY shingle HAVING count(*) <= {_MAX_DF}
),
inv_rare AS (
  SELECT i.doc_id, i.shingle FROM inv i JOIN rare r ON i.shingle = r.shingle
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM inv_rare a JOIN inv_rare b ON a.shingle = b.shingle
  WHERE a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {_MIN_COMMON}
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(da.shingles, db.shingles)) AS INT) AS n_shared,
         CAST(len(da.shingles) AS INT) AS n_a,
         CAST(len(db.shingles) AS INT) AS n_b
  FROM cand c
  JOIN docs da ON da.doc_id = c.doc_a
  JOIN docs db ON db.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_shared, n_a, n_b,
       round(n_shared / CAST(n_a AS DOUBLE), 4) AS containment_r
FROM scored
WHERE round(n_shared / CAST(n_a AS DOUBLE), 4) >= {_MIN_CONTAINMENT}
  AND n_b > n_a
"""


QUERIES = {
    "dedup_containment": QuerySpec(dedup_containment, CONTAINMENT_SQL),
}
