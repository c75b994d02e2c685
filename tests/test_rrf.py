"""retrieval_rrf_hybrid: fusion invariants the oracle hash can't state
as directly — rank arithmetic, list membership, monotonicity."""

from composable_logs_spark.queries.rrf_q import (
    _CAND_K,
    _RRF_C,
    _TOP_K,
    retrieval_rrf_hybrid,
)


def test_rrf_fusion_invariants(spark, sf_dir):
    rows = retrieval_rrf_hybrid(spark, sf_dir).collect()
    assert rows, "query workload must be non-empty at the test SF"
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, group in by_q.items():
        group.sort(key=lambda r: r["fused_rank"])
        # fused ranks are 1..n contiguous, n <= _TOP_K
        assert [r["fused_rank"] for r in group] == list(range(1, len(group) + 1))
        assert len(group) <= _TOP_K
        prev = None
        for r in group:
            # a fused row must come from at least one candidate list,
            # never the query document itself
            assert r["bm25_rank"] is not None or r["cos_rank"] is not None
            assert r["doc_id"] != qid
            for c in ("bm25_rank", "cos_rank"):
                if r[c] is not None:
                    assert 1 <= r[c] <= _CAND_K
            # the integer-RRF arithmetic, recomputed independently
            expect = sum(
                1_000_000 // (_RRF_C + r[c])
                for c in ("bm25_rank", "cos_rank")
                if r[c] is not None
            )
            assert r["rrf_micro"] == expect
            # scores weakly decrease with fused rank (ties broken by id)
            if prev is not None:
                assert r["rrf_micro"] <= prev
            prev = r["rrf_micro"]
