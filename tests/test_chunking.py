"""Overlapping-window chunking: splitter-contract properties."""

import hashlib

from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.queries.corpus_q import (
    _CHUNK_S,
    _CHUNK_W,
    chunk_overlap_windows,
)


def test_chunks_cover_documents_with_exact_overlap(spark, sf_dir):
    chunks = {}
    for r in chunk_overlap_windows(spark, sf_dir).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    docs = {
        r["doc_id"]: r["text"].strip().split()
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert set(chunks) == set(docs)
    for doc_id, toks in docs.items():
        ch = chunks[doc_id]
        n = len(toks)
        # contiguous indices from 0; short docs get exactly one window
        assert sorted(ch) == list(range(len(ch)))
        if n <= _CHUNK_W:
            assert len(ch) == 1
        # every chunk is the exact slice of the source tokens
        for k, row in ch.items():
            want = toks[k * _CHUNK_S : k * _CHUNK_S + _CHUNK_W]
            assert row["n_tokens"] == len(want)
            assert row["chunk_hash"] == hashlib.md5(
                " ".join(want).encode()
            ).hexdigest()
        # the last window reaches the end of the document
        last = max(ch)
        assert last * _CHUNK_S + ch[last]["n_tokens"] == n
        # full coverage: windows tile with stride < width (overlap)
        assert _CHUNK_S < _CHUNK_W
