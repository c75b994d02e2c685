"""Incremental trigram-LM scoring: stream arriving documents against a
STATIC stupid-backoff model — the always-on ingest side of the batch
quality gate (``queries.trigram_q``; the CCNet recipe's stage-3 LM),
completing the quality-LM leg of the streaming counterpart set
(near-dup: incremental_dedup, retrieval: incremental_bm25, embeddings:
incremental_semdedup, substring: incremental_substr).

At 100 TB you do not re-train the quality LM per crawl: the model is
trained ONCE over the reference corpus (`build_lm_index` persists the
four count tables — trigram, bigram, unigram, and the 1-row (N, V))
and each arriving micro-batch is scored with three equi-joins against
them (``trigram_q.score_with_model``, the exact code the batch query
runs, so streaming and batch micro-nats cannot drift — the equality
test is literal). Scoring is stateless: a replayed batch recomputes
identical scores, so no growth/partition discipline is needed; the
index tables are immutable after training.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..queries.trigram_q import score_with_model, trigram_model

_DOC_SCHEMA = "doc_id long, text string"
_TABLES = ("tri_s", "bi_s", "uni", "nv")


def build_lm_index(train: DataFrame, index_dir: str) -> None:
    """Train the stupid-backoff model over ``train`` (doc_id, text) and
    persist its four count tables under ``index_dir``."""
    model = trigram_model(train)
    for name in _TABLES:
        model[name].write.mode("overwrite").parquet(f"{index_dir}/{name}")


def read_lm_index(spark: SparkSession, index_dir: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(f"{index_dir}/{name}") for name in _TABLES
    }


def start_scoring_stream(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    on_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """File-source stream of (doc_id, text); per micro-batch emit
    (doc_id, n_trigrams, lp_sum_micro) under the static model."""
    model = read_lm_index(spark, index_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        on_batch(score_with_model(batch_df, model), batch_id)

    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
