"""Incremental EXACT-substring dedup: stream new documents against a
persisted WINNOWED anchor index — the always-on ingest side of the
batch ``queries.substr_q`` operator, mirroring ``incremental_dedup``
(minhash) for the verbatim-span modality.

At 100 TB you do not re-run the corpus-wide L-gram frequency pass per
crawl, and you cannot afford an index row per token position either
(8 bytes x every token position rivals the compressed corpus). The
index therefore stores only the winnowing-selected anchors
(``substr_q.winnow_anchors``: ~2/(w+1) of k-gram positions, w+k-1 = L)
as (corpus_doc_id, h) rows, and each micro-batch runs a two-phase
probe:

1. PRUNE — gram the incoming batch at full k-gram density (work
   proportional to the batch) and equi-join against the anchor index.
   The winnowing guarantee (substr_q, pytest-proven): any verbatim
   span of length >= w + k - 1 = L shared with an indexed doc contains
   a full winnow window in that doc, hence >= 1 selected anchor whose
   k-gram the batch doc also contains — so the owning corpus doc
   ALWAYS lands in the candidate set. Misses are impossible for
   spans >= L; the phase only prunes.
2. VERIFY — fetch just the candidate corpus docs' text and run the
   exact L-gram comparison (the shared ``substr_q`` code) of the batch
   against candidates + itself. Output spans are therefore EXACTLY the
   spans the batch operator reports for the new docs against the
   cumulative corpus — anchor sparsity affects cost, never results.

Within-batch duplication (new-vs-new) is caught by the batch's own
L-gram frequencies; the island merge is the shared
``substr_q.merge_windows``.

Replay idempotence (foreachBatch is at-least-once): every write —
flagged spans, grown anchors, grown corpus text — goes to a
``batch_id=N`` partition directory with mode("overwrite"), so a
replayed batch overwrites its own partition instead of appending
twice; and the probe reads index/corpus with ``batch_id != N``, so a
replayed batch can never match ITSELF through state its first attempt
already persisted. The initial corpus state lives at ``batch_id=-1``
(see ``init_substr_state``).

Directionality note (inherent to ingest-time dedup, same as the
minhash variant): only NEW docs are flagged; an old doc does not
retroactively gain spans when a future duplicate of it arrives. For
which-pairs-exist symmetry run the batch operator; this path answers
"does this incoming doc duplicate anything we already have" at
batch-plus-candidates cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.substr_q import _L, _WK, _WW, _grams, merge_windows, winnow_anchors

_DOC_SCHEMA = "doc_id long, text string"


def build_anchor_index(docs: DataFrame) -> DataFrame:
    """(doc_id, h): winnowed k-gram anchors of the existing corpus —
    ~2/(w+1) of the full gram density. Callers persist this; every
    micro-batch equi-joins its full-density k-grams against it."""
    return winnow_anchors(docs).select("doc_id", "h").distinct()


def batch_dup_spans_against_index(
    batch_docs: DataFrame,
    index: DataFrame,
    corpus_docs: DataFrame,
    l: int = _L,
) -> DataFrame:
    """Exact duplicated spans (>= l tokens) in ``batch_docs`` against
    the indexed corpus and the batch itself.

    ``index`` is (doc_id, h) winnowed anchors over ``corpus_docs``;
    ``corpus_docs`` is (doc_id, text) — only CANDIDATE rows (docs with
    an anchor hit) are ever read in full. Exact for l >= w + k - 1
    (= the module default); below that the winnowing guarantee does
    not hold and the batch operator must be used instead.

    All joins are equi-joins on the 8-byte hash; a small batch against
    a large index plans the batch side as the build side under AQE.
    """
    assert l >= _WK + _WW - 1, "anchor index only guarantees spans >= w+k-1"
    # phase 1: full-density k-grams of the batch vs the anchor index.
    # winnow_anchors stores the 40-bit reduced hash (h mod 2^40), so
    # reduce the probe side identically; a 40-bit false hit merely adds
    # one candidate doc to the verify phase, never a wrong span.
    cand_ids = (
        _grams(batch_docs, _WK)
        .select(F.pmod(F.col("h"), F.lit(1 << 40)).alias("h"))
        .join(index.select(F.col("doc_id").alias("cand_id"), "h"), "h")
        .select(F.col("cand_id").alias("doc_id"))
        .distinct()
    )
    cand = corpus_docs.join(cand_ids, "doc_id").select("doc_id", "text")
    # phase 2: exact L-gram verify against candidates + the batch itself
    g = _grams(batch_docs, l)
    corpus_h = _grams(cand, l).select("h").distinct()
    batch_dup_h = (
        g.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("h")
    )
    dup = (
        g.join(batch_dup_h.unionByName(corpus_h).distinct(), "h")
        .select("doc_id", "n_tokens", "pos")
    )
    return merge_windows(dup, l)


def init_substr_state(
    corpus: DataFrame, corpus_dir: str, index_dir: str
) -> None:
    """Write the initial corpus text + anchor index under the
    ``batch_id=-1`` partition both stream-state dirs use."""
    corpus.select("doc_id", "text").write.mode("overwrite").parquet(
        f"{corpus_dir}/batch_id=-1"
    )
    build_anchor_index(corpus).write.mode("overwrite").parquet(
        f"{index_dir}/batch_id=-1"
    )


def _batch_ids(state_dir: str) -> list[int]:
    import os

    return sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(state_dir)
        if name.startswith("batch_id=")
    )


def compact_state(
    spark: SparkSession, index_dir: str, corpus_dir: str, retain: int = 2
) -> None:
    """Fold all but the newest ``retain`` batch partitions into the
    consolidated base (``batch_id=-1``) — the ``mv_sink`` retention
    pattern. Without it the index grows one partition directory per
    micro-batch FOREVER: thousands of small files, and every probe
    pays the partition listing.

    Replay safety: the ``batch_id != N`` probe guard only matters for
    batches that can still be REDELIVERED, and Structured Streaming
    redelivers at most the batches not yet committed to the
    checkpoint — always the newest. Keeping the newest ``retain``
    (>= 2, the mv_sink margin) partitions un-folded preserves the
    guard for every redeliverable batch; folded batches are final.

    Runs BETWEEN micro-batches (same contract as
    ``incremental_semdedup.refresh_centroids``); write-aside then swap
    so the merge never reads a directory it is overwriting."""
    import shutil

    if retain < 2:
        raise ValueError("retain must be >= 2 (replay margin)")
    for state_dir in (index_dir, corpus_dir):
        ids = _batch_ids(state_dir)
        live = [i for i in ids if i >= 0]
        protected = set(live[-retain:])
        fold = [i for i in ids if i not in protected and i != -1]
        if not fold:
            continue
        src = ([-1] if -1 in ids else []) + fold
        merged = spark.read.parquet(
            *[f"{state_dir}/batch_id={i}" for i in src]
        )
        tmp = f"{state_dir}/__compact_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        for i in src:
            shutil.rmtree(f"{state_dir}/batch_id={i}")
        shutil.move(tmp, f"{state_dir}/batch_id=-1")


def make_fold(
    spark: SparkSession,
    corpus_dir: str,
    index_dir: str,
    spans_out_dir: str,
    l: int = _L,
    grow_index: bool = True,
):
    """The foreachBatch body, exposed so replay behavior is directly
    testable: calling fold(batch, N) twice must be a no-op the second
    time (same outputs, no self-matching)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        not_self = F.col("batch_id") != batch_id
        index = (
            spark.read.parquet(index_dir).where(not_self).select("doc_id", "h")
        )
        corpus = (
            spark.read.parquet(corpus_dir)
            .where(not_self)
            .select("doc_id", "text")
        )
        spans = batch_dup_spans_against_index(batch_df, index, corpus, l)
        spans.write.mode("overwrite").parquet(
            f"{spans_out_dir}/batch_id={batch_id}"
        )
        if grow_index:
            build_anchor_index(batch_df).write.mode("overwrite").parquet(
                f"{index_dir}/batch_id={batch_id}"
            )
            batch_df.select("doc_id", "text").write.mode("overwrite").parquet(
                f"{corpus_dir}/batch_id={batch_id}"
            )

    return fold


def stream_substr_against_index(
    spark: SparkSession,
    docs_dir: str,
    corpus_dir: str,
    index_dir: str,
    spans_out_dir: str,
    ckpt: str,
    l: int = _L,
    grow_index: bool = True,
):
    """File-source stream of (doc_id, text) checked per micro-batch;
    flagged spans land under ``spans_out_dir/batch_id=N``; with
    ``grow_index`` the batch's winnowed anchors and text join the
    state dirs AFTER matching (a doc never matches itself: the probe
    excludes the current batch_id partition, which also makes
    at-least-once replays idempotent)."""
    fold = make_fold(spark, corpus_dir, index_dir, spans_out_dir, l, grow_index)
    stream = spark.readStream.schema(_DOC_SCHEMA).parquet(docs_dir)
    return (
        stream.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
