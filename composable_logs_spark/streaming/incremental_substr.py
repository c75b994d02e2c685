"""Incremental EXACT-substring dedup: stream new documents against a
persisted L-gram index — the always-on ingest side of the batch
``queries.substr_q`` operator, mirroring ``incremental_dedup`` (minhash)
for the verbatim-span modality.

At 100 TB you do not re-run the corpus-wide L-gram frequency pass per
crawl; you keep the corpus' gram hashes as an index table and check
each arriving batch against it:

- the index is 8-byte gram hashes only (one column), not text — bytes
  per token position, mergeable by plain append;
- each micro-batch grams the NEW docs with the exact same
  ``substr_q._grams`` code the batch query uses (work proportional to
  the batch), so stream and batch span verdicts agree;
- a position in a new doc is duplicated iff its gram is in the index OR
  occurs >= 2 times within the batch itself (new-vs-old and
  new-vs-new); the island merge is the shared
  ``substr_q.merge_windows``;
- with ``grow_index`` the batch's grams append to the index, so later
  arrivals match earlier STREAM arrivals too, not just the initial
  corpus.

Directionality note (inherent to ingest-time dedup, same as the minhash
variant): only NEW docs are flagged; an old doc does not retroactively
gain spans when a future duplicate of it arrives. For which-pairs-exist
symmetry run the batch operator; this path answers "does this incoming
doc duplicate anything we already have" at batch-sized cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.substr_q import _L, _grams, merge_windows

_DOC_SCHEMA = "doc_id long, text string"


def build_gram_index(docs: DataFrame, l: int = _L) -> DataFrame:
    """Distinct gram hashes of the existing corpus. Callers persist
    this; every micro-batch equi-joins against it."""
    return _grams(docs, l).select("h").distinct()


def batch_dup_spans_against_index(
    batch_docs: DataFrame, index: DataFrame, l: int = _L
) -> DataFrame:
    """Duplicated spans in ``batch_docs``: positions whose gram is in
    the index (new-vs-corpus) or repeats within the batch (new-vs-new).
    All joins are equi-joins on the 8-byte hash; a small batch against
    a large index plans as a broadcast of the batch side under AQE."""
    g = _grams(batch_docs, l)
    batch_freq = g.groupBy("h").agg(F.count("*").alias("cnt"))
    dup_h = (
        batch_freq.where(F.col("cnt") >= 2)
        .select("h")
        .unionByName(index.select("h"))
        .distinct()
    )
    dup = g.join(dup_h, "h").select("doc_id", "n_tokens", "pos")
    return merge_windows(dup, l)


def stream_substr_against_index(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    spans_out_dir: str,
    ckpt: str,
    l: int = _L,
    grow_index: bool = True,
):
    """File-source stream of (doc_id, text) checked per micro-batch;
    flagged spans append to ``spans_out_dir``; with ``grow_index`` the
    batch's distinct grams append to ``index_dir`` AFTER matching (a
    doc never matches itself through the index)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        index = spark.read.parquet(index_dir).select("h")
        spans = batch_dup_spans_against_index(batch_df, index, l)
        spans.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(spans_out_dir)
        if grow_index:
            _grams(batch_df, l).select("h").distinct().write.mode(
                "append"
            ).parquet(index_dir)

    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
