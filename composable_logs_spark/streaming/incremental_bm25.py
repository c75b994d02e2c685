"""Incremental BM25 postings index: stream new documents into a
persisted inverted index — the always-on ingest side of the batch
``queries.bm25_q`` retrieval operator, completing the streaming
counterpart set (minhash: ``incremental_dedup``, exact substring:
``incremental_substr``, aggregates: ``mv_sink``).

At 100 TB you do not re-tokenize the corpus per crawl; each arriving
batch of NEW documents tokenizes once (work proportional to the batch,
the shared ``bm25_q._postings`` code) and its (doc_id, term, tf, dl)
rows join the index by plain append — postings are disjoint across
batches because doc_ids are new, so the merged index IS the batch
index of the cumulative corpus, no merge algebra needed. Corpus
statistics (df, N, sum_dl) derive from the merged postings at query
time with one index-sized aggregation; a deployment chasing the last
10% would maintain them as mergeable per-batch partials (df and totals
are plain sums over disjoint batches), but the postings table is the
only state either way.

Search reuses ``bm25_q.bm25_topk`` verbatim, so streaming and batch
ranking cannot drift — the equality test is literal.

Replay idempotence (foreachBatch is at-least-once): each batch's
postings land under a ``batch_id=N`` partition with overwrite (the
``incremental_substr``/``mv_sink`` discipline), so a replayed batch
rewrites its own partition instead of double-counting its term
frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..queries.bm25_q import _postings, bm25_topk

_DOC_SCHEMA = "doc_id long, text string"


def init_postings(corpus: DataFrame, postings_dir: str) -> None:
    """Index the pre-existing corpus under the batch_id=-1 partition."""
    _postings(corpus).write.mode("overwrite").parquet(
        f"{postings_dir}/batch_id=-1"
    )


def read_postings(spark: SparkSession, postings_dir: str) -> DataFrame:
    return spark.read.parquet(postings_dir).select(
        "doc_id", "term", "tf", "dl"
    )


def search(
    spark: SparkSession,
    postings_dir: str,
    queries: list[tuple[int, str]] | None = None,
    k: int = 5,
) -> DataFrame:
    """BM25 top-k over the cumulative index — identical scoring to the
    batch operator on the union corpus (shared ``bm25_topk``)."""
    return bm25_topk(spark, read_postings(spark, postings_dir), queries, k)


def start_postings_stream(
    spark: SparkSession, docs_dir: str, postings_dir: str, ckpt: str
):
    """File-source stream of (doc_id, text); each micro-batch's
    postings land under their own batch_id partition."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        _postings(batch_df).write.mode("overwrite").parquet(
            f"{postings_dir}/batch_id={batch_id}"
        )

    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
