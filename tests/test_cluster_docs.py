"""Document clustering over hashed bag-of-words (cluster_docs_q):
feature construction vs a Python replica; registry-query structure."""

import hashlib
from unittest import mock

import composable_logs_spark.queries.cluster_docs_q as C


def test_doc_vectors_match_python_replica(spark):
    docs = [
        (0, "hash join hash table"),
        (1, "window agg window window"),
        (2, "a b c d e f g h"),
    ]
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["vec_id"]: r["vec"] for r in C._doc_vectors(frame).collect()
    }
    for d, text in docs:
        expect = [0.0] * C._TC_B
        for t in text.lower().strip().split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % C._TC_B
            expect[b] += 1.0
        assert got[d] == expect, d
        assert sum(got[d]) == len(text.split())  # nothing lost


def test_registry_query_structure(spark, sf_dir):
    out = C.cluster_docs_hashed_tf(spark, sf_dir).collect()
    assert 1 <= len(out) <= 8
    import pandas as pd

    n_docs = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    assert sum(r["n_docs"] for r in out) == n_docs  # a partition of docs
    digests = [r["member_digest"] for r in out]
    assert len(set(digests)) == len(digests)  # disjoint member sets
    for r in out:
        assert 0 <= r["n_en"] <= r["n_docs"]
        assert r["top_source"].startswith("src")


def test_clustering_separates_planted_vocabularies(spark):
    """Docs drawn from two disjoint vocabularies must not share
    clusters (their hashed vectors are orthogonal)."""
    va = [f"alpha{i}" for i in range(12)]
    vb = [f"beta{i}" for i in range(12)]
    rows = [(i, " ".join(va)) for i in range(0, 12, 2)]
    rows += [(i, " ".join(vb)) for i in range(1, 12, 2)]
    frame = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = C._doc_vectors(frame)
    from composable_logs_spark.queries.similarity_q import (
        _km_assign,
        _train_kmeans_on,
    )

    assigned = _km_assign(vecs, _train_kmeans_on(vecs)).collect()
    cell_of = {r["vec_id"]: r["cell"] for r in assigned}
    cells_a = {cell_of[i] for i in range(0, 12, 2)}
    cells_b = {cell_of[i] for i in range(1, 12, 2)}
    assert cells_a.isdisjoint(cells_b)
    assert len(cells_a) == len(cells_b) == 1  # identical docs co-cluster
