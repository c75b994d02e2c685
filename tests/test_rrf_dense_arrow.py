"""Bit-identity lock for the r13 Arrow rewrite of the RRF dense side.

_dense_scores_arrow (numpy dot/norm folds + parquet-read query panel)
must produce EXACTLY the rows of the expression form dense_scores +
query_vecs (same query set, same cosine_r at 6dp, self-matches
excluded) — the streaming index keeps using the expression form, so the
two must not drift.
"""

from __future__ import annotations

from composable_logs_spark.queries import load
from composable_logs_spark.queries.rrf_q import (
    _dense_scores_arrow,
    dense_scores,
    query_vecs,
    to_vecs,
)


def _rows(df):
    return sorted(
        (r["query_id"], r["doc_id"], r["cosine_r"]) for r in df.collect()
    )


def test_arrow_dense_scores_bit_identical(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    vecs = to_vecs(emb)
    want = _rows(dense_scores(vecs, query_vecs(vecs)))
    got = _rows(_dense_scores_arrow(emb, f"{sf_dir}/embeddings.parquet"))
    assert got == want and len(got) > 0
