"""Incremental hybrid RRF retrieval: stream new (doc, embedding) rows
into a persisted two-sided index — the always-on ingest counterpart of
the batch ``queries.rrf_q`` fusion, composing ``incremental_bm25``'s
postings with a growing dense candidate store.

The two sides have different incremental algebra, and the module is
honest about which is which:

- **Dense side is truly delta.** Cosine against a fixed query panel is
  corpus-stat-INDEPENDENT: an old document's score never changes when
  new documents arrive. So each batch scores only ITS OWN vectors
  against the query panel (work proportional to the batch) and lands
  its per-query top-``_CAND_K`` candidate list under a
  ``batch_id=N`` partition. Because the batches partition the corpus
  and per-query top-k over a union equals top-k over the union of
  per-subset top-k's, merging the (bounded: #batches x #queries x K
  rows) candidate partitions at search time is EXACT — the brute-force
  full-corpus rescan never happens again.

- **Sparse side recomputes from the cumulative index.** BM25 is
  corpus-stat-DEPENDENT (idf, avgdl shift with every batch, re-ranking
  docs that never arrived again), so per-doc scores cannot be frozen
  per batch without drift. What IS incremental is the expensive part —
  tokenization: postings append per batch (``incremental_bm25``
  partitions) and search re-scores the cumulative postings join, the
  same work the batch ranker does minus the corpus re-tokenize.

Search reuses ``rrf_q.rrf_rank`` verbatim (shared ``_ranked_topk`` +
``fuse_rrf``), so streaming and batch fusion cannot drift — the
equality test is literal.

Replay idempotence (foreachBatch is at-least-once): both sides land
under ``batch_id=N`` partitions with overwrite (the
``incremental_substr``/``mv_sink`` discipline), so a replayed batch
rewrites its own partitions instead of duplicating candidates.

Reference anchor: none (north-star scope, SURVEY.md §2.10) — the
reference has no retrieval surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.bm25_q import _postings
from ..queries.rrf_q import (
    _CAND_K,
    _QUERY_STRIDE,
    _ranked_topk,
    dense_scores,
    query_terms,
    query_vecs,
    rrf_rank,
)

_DOC_SCHEMA = "doc_id long, text string, embedding array<float>"


def _vecs(batch: DataFrame) -> DataFrame:
    return batch.select(
        F.col("doc_id").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _dense_cands(batch: DataFrame, qvecs: DataFrame) -> DataFrame:
    """Per-query top-K candidates of ONE batch against the fixed query
    panel, score kept so the search-time merge can re-rank exactly."""
    scored = dense_scores(_vecs(batch), qvecs)
    return _ranked_topk(
        scored, F.col("cosine_r"), _CAND_K, "cos_rank", keep=("cosine_r",)
    ).select("query_id", "doc_id", "cosine_r")


def init_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    query_stride: int = _QUERY_STRIDE,
) -> None:
    """Index the pre-existing corpus (``_DOC_SCHEMA`` rows) and freeze
    the query panel: every ``query_stride``-th initial document becomes
    a standing hybrid query (its distinct terms + its embedding)."""
    query_terms(docs, query_stride).write.mode("overwrite").parquet(
        f"{index_dir}/qterms"
    )
    qvecs = query_vecs(_vecs(docs), query_stride)
    qvecs.write.mode("overwrite").parquet(f"{index_dir}/qvecs")
    _postings(docs).write.mode("overwrite").parquet(
        f"{index_dir}/postings/batch_id=-1"
    )
    _dense_cands(docs, qvecs).write.mode("overwrite").parquet(
        f"{index_dir}/dense_cands/batch_id=-1"
    )


def fold_batch(batch: DataFrame, index_dir: str, batch_id: int) -> None:
    """Land one batch's postings + dense candidates under their own
    batch_id partitions (overwrite => replay-idempotent)."""
    spark = batch.sparkSession
    qvecs = spark.read.parquet(f"{index_dir}/qvecs")
    _postings(batch.select("doc_id", "text")).write.mode("overwrite").parquet(
        f"{index_dir}/postings/batch_id={batch_id}"
    )
    _dense_cands(batch, qvecs).write.mode("overwrite").parquet(
        f"{index_dir}/dense_cands/batch_id={batch_id}"
    )


def start_index_stream(
    spark: SparkSession, docs_dir: str, index_dir: str, ckpt: str
):
    """File-source stream of (doc_id, text, embedding) rows."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch(batch_df, index_dir, batch_id)

    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )


def search(spark: SparkSession, index_dir: str) -> DataFrame:
    """Hybrid RRF top-k over the cumulative index — identical fusion to
    the batch operator on the union corpus (shared ``rrf_rank``)."""
    postings = spark.read.parquet(f"{index_dir}/postings").select(
        "doc_id", "term", "tf", "dl"
    )
    qterms = spark.read.parquet(f"{index_dir}/qterms")
    cands = spark.read.parquet(f"{index_dir}/dense_cands").select(
        "query_id", "doc_id", "cosine_r"
    )
    return rrf_rank(postings, qterms, cands)
