"""BM25 (bm25_q): planted corpus vs a from-scratch integer replica,
plus behavioral properties — tf saturation and length normalization."""

import math
from unittest import mock

import composable_logs_spark.queries.bm25_q as B


def _replica(docs, queries, k=5):
    """Pure-Python BM25 with the module's exact integer arithmetic."""
    toks = {d: t.lower().strip().split() for d, t in docs}
    tf = {}
    dl = {}
    for d, ts in toks.items():
        dl[d] = len(ts)
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    n_docs = len(docs)
    sum_dl = sum(dl.values())
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    idf = {
        t: round(math.log((n_docs - c + 0.5) / (c + 0.5) + 1) * 1e6)
        for t, c in df.items()
    }
    out = {}
    for qid, q in queries:
        scores = {}
        nmatch = {}
        for t in sorted(set(q.split())):
            if t not in df:
                continue
            for d in toks:
                if (d, t) not in tf:
                    continue
                f = tf[(d, t)]
                num = 22 * f * sum_dl
                den = 10 * f * sum_dl + 3 * sum_dl + 9 * dl[d] * n_docs
                scores[d] = scores.get(d, 0) + (idf[t] * num) // den
                nmatch[d] = nmatch.get(d, 0) + 1
        ranked = sorted(scores, key=lambda d: (-scores[d], d))[:k]
        out[qid] = [(d, nmatch[d], scores[d]) for d in ranked]
    return out


def test_bm25_matches_replica_on_planted_corpus(spark):
    docs = [
        (0, "hash join hash join hash table"),
        (1, "hash partition"),
        (2, "sort merge join strategy"),
        (3, "the quick brown fox " * 10 + "hash join"),  # long doc
        (4, "window agg"),
        (5, "join"),
    ]
    queries = [(1, "hash join"), (2, "sort merge"), (3, "window")]
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    with mock.patch.object(B, "load", lambda s, sf, t: frame):
        with mock.patch.object(B, "_BM25_QUERIES", queries):
            rows = B.text_bm25_topk(spark, "ignored").collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_terms_matched"], r["score_micro"])
        )
    assert got == _replica(docs, queries)
    # behavioral: doc 0 (both terms, high tf, short) tops "hash join"
    assert got[1][0][0] == 0
    # length normalization: the long doc 3 contains both terms once but
    # ranks below doc 0
    ranks1 = [d for d, _, _ in got[1]]
    assert ranks1.index(0) < ranks1.index(3)


def test_bm25_tf_saturation(spark):
    """k1-saturation: 10x the tf must NOT give 10x the contribution —
    the saturated score grows sublinearly toward idf*(k1+1)."""
    docs = [
        (0, "join " * 1 + "x0 " * 9),
        (1, "join " * 10),
        (2, "filler words only here"),
    ]
    frame = spark.createDataFrame(
        [(d, t.strip()) for d, t in docs], "doc_id long, text string"
    )
    with mock.patch.object(B, "load", lambda s, sf, t: frame):
        with mock.patch.object(B, "_BM25_QUERIES", [(1, "join")]):
            rows = B.text_bm25_topk(spark, "ignored").collect()
    s = {r["doc_id"]: r["score_micro"] for r in rows}
    assert s[1] > s[0]            # more occurrences score higher
    assert s[1] < 10 * s[0] / 2   # but far from linearly


def test_bm25_registry_query_shape(spark, sf_dir):
    out = B.text_bm25_topk(spark, sf_dir).collect()
    assert len(out) == len(B._BM25_QUERIES) * B._TOP_K
    for r in out:
        assert 1 <= r["rank"] <= B._TOP_K
        assert r["n_terms_matched"] >= 1
