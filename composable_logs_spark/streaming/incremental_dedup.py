"""Incremental near-dup detection: stream NEW documents against a
static signature index (north-star: the always-on ingest side of corpus
dedup).

At 100 TB you do not re-run pair-finding over the whole corpus every
time a crawl lands; you keep the corpus' minhash signatures as a table
and check each arriving batch against it:

- the index is signatures only (doc_id, hashed shingle set, band keys) —
  bytes per doc, not the text, so it stays cache-/broadcast-friendly
  long after the raw corpus is petabytes;
- each micro-batch computes signatures for the NEW docs only (work
  proportional to the batch, not the corpus) with the exact same
  ``queries.dedup_q.minhash_signatures`` code the batch query uses, so
  stream and batch verdicts agree;
- candidates come from the same banded equi-join (band_idx, band_hash),
  then exact-Jaccard verification over the hashed shingle sets — the
  stream never sees an O(batch x corpus) comparison.

Pairs WITHIN one micro-batch are caught too (round-10 fix): besides the
new-vs-index join, each batch runs the banded self-join over its own
(batch-sized) signatures — without it, two near-dups arriving together
would never be paired by anyone (both enter the grown index and
cross-matching only looks backwards). At-least-once replays stay
idempotent: the cross leg anti-joins away index entries that belong to
the CURRENT batch (a replayed batch whose signatures already reached
the growth dir would otherwise match itself at Jaccard 1), and the
intra leg re-emits exactly what the original attempt emitted.

The foreachBatch pattern keeps the inner joins ordinary batch joins, so
AQE/broadcast decisions apply per micro-batch (a small batch against a
large index plans as a broadcast of the batch side).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dedup_q import (
    _JACCARD_THRESHOLD,
    bands_long,
    jaccard_col,
    minhash_signatures,
)

_DOC_SCHEMA = "doc_id long, text string"


def build_signature_index(docs: DataFrame) -> DataFrame:
    """Signatures for the existing corpus. Callers persist/cache this —
    it is read by every micro-batch."""
    return minhash_signatures(docs.select("doc_id", "text"))


def stream_against_index(
    spark: SparkSession,
    docs_dir: str,
    index_sig: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: Optional[str] = None,
    index_growth_dir: Optional[str] = None,
):
    """Watch ``docs_dir`` for JSONL document files; per micro-batch emit
    verified (doc_id, dup_of, jaccard) rows — new doc vs index doc.

    With ``index_growth_dir`` the index GROWS: each batch's signatures
    are appended there (signatures only — bytes per doc) after matching,
    and later batches match against base index + everything streamed so
    far. That makes this the full incremental corpus-dedup loop: arriving
    near-dups of earlier arrivals are caught, not just near-dups of the
    original corpus. Appending parquet per batch keeps the growth path
    a cheap columnar append, no rewrite of the base index.

    Returns the StreamingQuery; callers stop it (or use
    ``processAllAvailable`` in tests).
    """
    import os

    _SIG_SCHEMA = index_sig.schema

    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(docs_dir)
    )

    def _current_index() -> DataFrame:
        if index_growth_dir and os.path.isdir(index_growth_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_growth_dir)
        ):
            # dropDuplicates(doc_id): foreachBatch is at-least-once, so a
            # retried batch may have appended its signatures twice;
            # deduping on read keeps the match output idempotent
            grown = spark.read.schema(_SIG_SCHEMA).parquet(index_growth_dir)
            return index_sig.unionByName(grown).dropDuplicates(["doc_id"])
        return index_sig

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = _current_index()
        sig = minhash_signatures(batch_df).cache()
        batch_bands = bands_long(sig)
        cand = (
            batch_bands.alias("new")
            .join(bands_long(idx).alias("old"), ["band_idx", "band_hash"])
            .select(
                F.col("new.doc_id").alias("doc_id"),
                F.col("old.doc_id").alias("dup_of"),
            )
            # replay guard: on a retried batch the grown index already
            # holds THIS batch's signatures — those pairs belong to (and
            # are re-emitted identically by) the intra leg below
            .join(sig.select(F.col("doc_id").alias("dup_of")), "dup_of", "anti")
            .distinct()
        )
        cross = (
            cand.join(sig.select("doc_id", F.col("hashes").alias("sh_new")), "doc_id")
            .join(
                idx.select(
                    F.col("doc_id").alias("dup_of"), F.col("hashes").alias("sh_old")
                ),
                "dup_of",
            )
            .withColumn("jaccard", jaccard_col("sh_new", "sh_old"))
            .where(F.col("jaccard") >= _JACCARD_THRESHOLD)
            .select("doc_id", "dup_of", "jaccard")
        )
        # pairs WITHIN this batch: the banded self-join over the
        # batch-sized signatures, emitted as (newer id, older id)
        intra_cand = (
            batch_bands.alias("x")
            .join(batch_bands.alias("y"), ["band_idx", "band_hash"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("y.doc_id").alias("doc_id"),
                F.col("x.doc_id").alias("dup_of"),
            )
            .distinct()
        )
        intra = (
            intra_cand.join(
                sig.select("doc_id", F.col("hashes").alias("sh_new")), "doc_id"
            )
            .join(
                sig.select(
                    F.col("doc_id").alias("dup_of"), F.col("hashes").alias("sh_old")
                ),
                "dup_of",
            )
            .withColumn("jaccard", jaccard_col("sh_new", "sh_old"))
            .where(F.col("jaccard") >= _JACCARD_THRESHOLD)
            .select("doc_id", "dup_of", "jaccard")
        )
        verified = cross.unionByName(intra)
        try:
            on_batch(verified, batch_id)
            if index_growth_dir:
                sig.write.mode("append").parquet(index_growth_dir)
        finally:
            sig.unpersist()

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
