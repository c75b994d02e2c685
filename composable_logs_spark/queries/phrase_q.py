"""Exact phrase search over a positional inverted index — the
retrieval op BM25 (bag-of-words) cannot express: "these words, in this
order, adjacent". Every search engine keeps term POSITIONS in its
postings for this; the operator here is the distributed form of the
classic positional-intersection algorithm.

Queries are three-word phrases lifted from the corpus itself (the
first three tokens of the three lowest-id documents — deterministic on
both engines, and each phrase is guaranteed >= 1 hit so the operator's
positive path is always exercised at any SF).

Pipeline:
1. positional postings: one posexplode -> (doc_id, pos, tok) — the
   standard index layout; at 100 TB this relation is the search index
   itself, bucketed by tok.
2. seed: postings equi-join the BROADCAST query table on the phrase's
   FIRST word -> candidate (doc_id, pos, query).
3. extend: for word k = 2..3, equi-join candidates to postings on
   (doc_id, pos + k - 1) and filter tok = w_k. The join key is
   (doc_id, pos) — a plain shuffle equi-join whose size shrinks at
   every step (each extension keeps only candidates whose next
   position matches).
4. per-query rollup: matched docs + total occurrences.

Scale note: production engines seed from the phrase's RAREST word,
not its first, so step 2's candidate set is minimal; that reordering
is a broadcast-side permutation of the same plan (the seed column
choice), not a different shape. Selectivity then shrinks
monotonically exactly as here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec, load

_N_QUERIES = 3
_PHRASE_LEN = 3


def _postings(d: DataFrame) -> DataFrame:
    toks = d.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("arr"),
    )
    return toks.select(
        "doc_id", F.posexplode("arr").alias("pos", "tok")
    )


def text_phrase_search(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select("doc_id", "text")
    post = _postings(d)
    qwords = (
        d.where(F.col("doc_id") < _N_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("arr"),
        )
        .select(
            "query_id",
            *[
                F.element_at("arr", i + 1).alias(f"w{i + 1}")
                for i in range(_PHRASE_LEN)
            ],
        )
    )
    cand = post.join(
        F.broadcast(qwords), post["tok"] == qwords["w1"]
    ).select("query_id", "doc_id", "pos", "w2", "w3")
    for k in range(2, _PHRASE_LEN + 1):
        nxt = post.select(
            "doc_id",
            (F.col("pos") - (k - 1)).alias("pos"),
            F.col("tok").alias(f"t{k}"),
        )
        cand = (
            cand.join(nxt, ["doc_id", "pos"])
            .where(F.col(f"t{k}") == F.col(f"w{k}"))
            .drop(f"t{k}", f"w{k}")
        )
    return (
        cand.join(F.broadcast(qwords.select("query_id", "w1", "w2", "w3")), "query_id")
        .groupBy(
            "query_id",
            F.concat_ws(" ", "w1", "w2", "w3").alias("phrase"),
        )
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .orderBy("query_id")
    )


_PHRASE_SQL = f"""
WITH arrs AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr
  FROM documents
),
post AS (
  SELECT doc_id, x - 1 AS pos, arr[x] AS tok
  FROM arrs, UNNEST(generate_series(1, len(arr))) AS u(x)
),
qwords AS (
  SELECT doc_id AS query_id, arr[1] AS w1, arr[2] AS w2, arr[3] AS w3
  FROM arrs WHERE doc_id < {_N_QUERIES}
),
c1 AS (
  SELECT q.query_id, p.doc_id, p.pos, q.w2, q.w3
  FROM post p JOIN qwords q ON p.tok = q.w1
),
c2 AS (
  SELECT c.query_id, c.doc_id, c.pos, c.w3
  FROM c1 c JOIN post p ON p.doc_id = c.doc_id AND p.pos = c.pos + 1
  WHERE p.tok = c.w2
),
c3 AS (
  SELECT c.query_id, c.doc_id, c.pos
  FROM c2 c JOIN post p ON p.doc_id = c.doc_id AND p.pos = c.pos + 2
  WHERE p.tok = c.w3
)
SELECT c.query_id,
       q.w1 || ' ' || q.w2 || ' ' || q.w3 AS phrase,
       COUNT(DISTINCT c.doc_id) AS n_docs,
       COUNT(*) AS n_occurrences
FROM c3 c JOIN qwords q USING (query_id)
GROUP BY 1, 2
ORDER BY query_id
"""


QUERIES = {
    "text_phrase_search": QuerySpec(text_phrase_search, _PHRASE_SQL),
}
