"""Incremental hybrid RRF (streaming/incremental_rrf): streamed index
search == batch RRF fusion on the union corpus, the dense candidate
merge is exact (per-batch top-k union == full-corpus top-k), and
at-least-once replay idempotence."""

from pyspark.sql import functions as F

from composable_logs_spark.queries.bm25_q import _postings
from composable_logs_spark.queries.rrf_q import (
    dense_scores,
    query_terms,
    query_vecs,
    rrf_rank,
)
from composable_logs_spark.streaming.incremental_rrf import (
    _vecs,
    fold_batch,
    init_index,
    search,
    start_index_stream,
)

_STRIDE = 3  # every 3rd initial doc is a standing query

_WORDS = [
    "hash", "join", "scan", "sort", "merge", "window", "frame",
    "filter", "probe", "build", "spill", "batch",
]


def _rows(ids):
    """Deterministic (doc_id, text, embedding) rows: text cycles the
    vocab with id-dependent phase, embeddings are id-dependent and
    never zero-norm."""
    out = []
    for i in ids:
        text = " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(5))
        emb = [float(1 + (i * 7 + d * 3) % 11) for d in range(4)]
        out.append((i, text, emb))
    return out


def _df(spark, ids):
    return spark.createDataFrame(
        _rows(ids), "doc_id long, text string, embedding array<float>"
    )


def _batch_reference(spark, initial_ids, all_ids):
    """Batch RRF over the union corpus with the query panel frozen to
    the initial corpus (what the incremental index promises)."""
    initial = _df(spark, initial_ids)
    union = _df(spark, all_ids)
    qterms = query_terms(initial, _STRIDE)
    qvecs = query_vecs(_vecs(initial), _STRIDE)
    return rrf_rank(
        _postings(union.select("doc_id", "text")),
        qterms,
        dense_scores(_vecs(union), qvecs),
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_search_matches_batch_fusion(spark, tmp_path):
    initial_ids = list(range(12))
    b1_ids = [100, 101, 102]
    b2_ids = [200, 201]

    index_dir = str(tmp_path / "index")
    init_index(spark, _df(spark, initial_ids), index_dir, _STRIDE)

    docs_dir = str(tmp_path / "docs")
    _df(spark, b1_ids).coalesce(1).write.mode("append").parquet(docs_dir)
    q = start_index_stream(spark, docs_dir, index_dir, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        _df(spark, b2_ids).coalesce(1).write.mode("append").parquet(docs_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _sorted(search(spark, index_dir))
    want = _sorted(
        _batch_reference(spark, initial_ids, initial_ids + b1_ids + b2_ids)
    )
    assert got == want
    assert got  # the panel actually retrieves documents
    # new-batch docs actually surfaced (the index is not initial-only)
    fused_docs = {r[1] for r in got}
    assert fused_docs & set(b1_ids + b2_ids)


def test_dense_candidate_merge_is_exact(spark, tmp_path):
    """Per-batch top-k union re-ranked == brute-force top-k over the
    union corpus: the property the delta path relies on."""
    initial_ids = list(range(9))
    extra_ids = [50, 51, 52, 53]

    index_dir = str(tmp_path / "index")
    init_index(spark, _df(spark, initial_ids), index_dir, _STRIDE)
    fold_batch(_df(spark, extra_ids), index_dir, 0)

    cands = spark.read.parquet(f"{index_dir}/dense_cands").select(
        "query_id", "doc_id", "cosine_r"
    )
    union = _df(spark, initial_ids + extra_ids)
    qvecs = query_vecs(_vecs(_df(spark, initial_ids)), _STRIDE)
    full = dense_scores(_vecs(union), qvecs)

    def topk(df, k=5):
        from pyspark.sql import Window as W

        w = W.partitionBy("query_id").orderBy(
            F.col("cosine_r").desc(), F.col("doc_id")
        )
        return sorted(
            tuple(r)
            for r in df.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= k)
            .select("query_id", "doc_id", "cosine_r")
            .collect()
        )

    assert topk(cands) == topk(full)


def test_fold_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch (at-least-once delivery) must not duplicate
    candidates or postings: both partitions are overwritten."""
    initial_ids = list(range(6))
    index_dir = str(tmp_path / "index")
    init_index(spark, _df(spark, initial_ids), index_dir, _STRIDE)

    batch = _df(spark, [70, 71])
    fold_batch(batch, index_dir, 0)
    once = _sorted(search(spark, index_dir))
    fold_batch(batch, index_dir, 0)  # replay
    assert _sorted(search(spark, index_dir)) == once

    n_posting_rows = (
        spark.read.parquet(f"{index_dir}/postings")
        .where(F.col("doc_id") >= 70)
        .count()
    )
    assert n_posting_rows == _postings(batch.select("doc_id", "text")).count()
