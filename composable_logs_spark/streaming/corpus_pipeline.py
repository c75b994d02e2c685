"""Continuous clean-corpus maintenance: the streaming face of
``queries.pipeline_q.pipeline_clean_corpus``.

Arriving documents are, per micro-batch:

1. quality-filtered with the SAME expression cores as the batch query
   (``text_ops.c4_stats`` / ``repetition_stats`` / ``quality_stats`` —
   narrow maps, so this step adds zero shuffle to the micro-batch);
2. near-dup-checked against the minhash signature index with
   ``incremental_dedup``'s banded join (work proportional to the batch);
3. survivors (quality-pass AND no near-dup) are appended to the corpus
   dataset, and their signatures to the index, so later batches dedup
   against them.

This is the O(new data) maintenance loop: the batch query rebuilds the
clean corpus from scratch; this keeps one continuously current.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dedup_q import _JACCARD_THRESHOLD, bands_long, jaccard_col, minhash_signatures
from ..queries.text_ops import c4_stats, quality_stats, repetition_stats

_DOC_SCHEMA = "doc_id long, text string, lang string, source string"


def quality_mask(docs: DataFrame) -> DataFrame:
    """(doc_id, keep) for the boilerplate/repetition/quality composite —
    the same predicate set the batch clean-corpus query applies."""
    flags = (
        c4_stats(docs)
        .select("doc_id", "has_boilerplate")
        .join(repetition_stats(docs).select("doc_id", "passes_repetition"), "doc_id")
        .join(quality_stats(docs).select("doc_id", "passes_quality"), "doc_id")
    )
    return flags.select(
        "doc_id",
        (
            ~F.col("has_boilerplate")
            & F.col("passes_repetition")
            & F.col("passes_quality")
        ).alias("keep"),
    )


def stream_clean_corpus(
    spark: SparkSession,
    docs_dir: str,
    index_sig: DataFrame,
    corpus_out_dir: str,
    index_growth_dir: str,
    checkpoint_dir: Optional[str] = None,
):
    """Returns the StreamingQuery maintaining ``corpus_out_dir``."""
    import os

    sig_schema = index_sig.schema

    def _current_index() -> DataFrame:
        if os.path.isdir(index_growth_dir) and any(
            f.endswith(".parquet") for f in os.listdir(index_growth_dir)
        ):
            # at-least-once foreachBatch: dedupe retried appends on read
            grown = spark.read.schema(sig_schema).parquet(index_growth_dir)
            return index_sig.unionByName(grown).dropDuplicates(["doc_id"])
        return index_sig

    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(docs_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        passed = (
            batch_df.join(quality_mask(batch_df), "doc_id")
            .where("keep")
            .drop("keep")
            .cache()
        )
        try:
            idx = _current_index()
            sig = minhash_signatures(passed).cache()
            dup_ids = (
                bands_long(sig)
                .alias("new")
                .join(bands_long(idx).alias("old"), ["band_idx", "band_hash"])
                .select(
                    F.col("new.doc_id").alias("doc_id"),
                    F.col("old.doc_id").alias("dup_of"),
                )
                .distinct()
                .join(sig.select("doc_id", F.col("hashes").alias("sh_new")), "doc_id")
                .join(
                    idx.select(
                        F.col("doc_id").alias("dup_of"),
                        F.col("hashes").alias("sh_old"),
                    ),
                    "dup_of",
                )
                .where(jaccard_col("sh_new", "sh_old") >= _JACCARD_THRESHOLD)
                .select("doc_id")
                .distinct()
            )
            kept = passed.join(dup_ids, "doc_id", "left_anti")
            kept.write.mode("append").parquet(corpus_out_dir)
            sig.join(dup_ids, "doc_id", "left_anti").write.mode("append").parquet(
                index_growth_dir
            )
            sig.unpersist()
        finally:
            passed.unpersist()

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
