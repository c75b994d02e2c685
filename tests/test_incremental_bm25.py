"""Incremental BM25 (streaming/incremental_bm25): streamed postings ==
batch postings on the union corpus, search parity with the batch
ranker, and at-least-once replay idempotence."""

from composable_logs_spark.queries.bm25_q import _postings, bm25_topk
from composable_logs_spark.streaming.incremental_bm25 import (
    init_postings,
    read_postings,
    search,
    start_postings_stream,
)

_QUERIES = [(1, "hash join"), (2, "merge sort")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streamed_index_matches_batch_ranking(spark, tmp_path):
    corpus_rows = [
        (0, "hash join hash table scan"),
        (1, "sort merge join plan"),
        (2, "window function frame"),
    ]
    b1_rows = [(10, "hash partition pruning"), (11, "merge interval sort")]
    b2_rows = [(20, "hash join broadcast build side")]

    postings_dir = str(tmp_path / "postings")
    init_postings(_docs(spark, corpus_rows), postings_dir)

    docs_dir = str(tmp_path / "docs")
    _docs(spark, b1_rows).coalesce(1).write.mode("append").parquet(docs_dir)
    q = start_postings_stream(
        spark, docs_dir, postings_dir, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        _docs(spark, b2_rows).coalesce(1).write.mode("append").parquet(docs_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    union = _docs(spark, corpus_rows + b1_rows + b2_rows)
    # postings parity: streamed index == one-shot index of the union
    streamed = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in read_postings(spark, postings_dir).collect()
    }
    batch = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in _postings(union).collect()
    }
    assert streamed == batch

    # ranking parity: the shared scorer over either postings source
    got = [tuple(r) for r in search(spark, postings_dir, _QUERIES).collect()]
    want = [
        tuple(r)
        for r in bm25_topk(spark, _postings(union), _QUERIES).collect()
    ]
    assert got == want
    assert got  # the workload actually matches documents


def test_postings_replay_is_idempotent(spark, tmp_path):
    """Folding the same batch twice (restart replay) must not
    double-count term frequencies: the partition is overwritten."""
    from composable_logs_spark.queries.bm25_q import _postings as P

    postings_dir = str(tmp_path / "postings")
    init_postings(_docs(spark, [(0, "hash join scan")]), postings_dir)
    batch = _docs(spark, [(10, "hash hash hash join")])
    for _ in range(2):  # first delivery + replay
        P(batch).write.mode("overwrite").parquet(
            f"{postings_dir}/batch_id=0"
        )
    rows = read_postings(spark, postings_dir).collect()
    tfs = {
        (r["doc_id"], r["term"]): r["tf"] for r in rows
    }
    assert tfs[(10, "hash")] == 3  # not 6
    assert len([r for r in rows if r["doc_id"] == 10]) == 2  # hash, join
