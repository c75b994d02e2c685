"""CCNet perplexity bucketing: rank-tercile properties, ordering, and
the two-pass scale guarantee (no doc-grain sort anywhere in the plan)."""

from composable_logs_spark.queries.perplexity_q import perplexity_buckets


def test_buckets_are_rank_terciles(spark, sf_dir):
    rows = perplexity_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}
        n = sum(r["n_docs"] for r in b.values())
        # rank cut 3r <= n gives exactly floor(n/3) head docs,
        # floor(2n/3) head+middle
        assert b["head"]["n_docs"] == n // 3
        assert b["head"]["n_docs"] + b["middle"]["n_docs"] == (2 * n) // 3
        # buckets are ordered: head's worst score >= middle's best, etc.
        assert b["head"]["worst_micro"] >= b["middle"]["best_micro"]
        assert b["middle"]["worst_micro"] >= b["tail"]["best_micro"]
        assert b["head"]["best_micro"] >= b["head"]["worst_micro"]


def _iter_logical_nodes(plan):
    stack = [plan]
    while stack:
        n = stack.pop()
        yield n
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))


def test_no_doc_grain_sort_in_plan(spark, sf_dir):
    """The 100x guarantee of the two-pass rank-cut form: doc rows are
    never ranked or sorted per language. The plan's ONLY window must sit
    on the per-(lang, score) histogram — its input grain is exactly
    (lang, score_micro, count) — and no row_number appears anywhere."""
    df = perplexity_buckets(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan()
    assert "row_number" not in plan.toString()
    windows = [
        n
        for n in _iter_logical_nodes(plan)
        if n.getClass().getSimpleName() == "Window"
    ]
    assert len(windows) == 1, "expected exactly the histogram cumsum window"
    child_out = windows[0].child().output()
    names = sorted(
        child_out.apply(i).name() for i in range(child_out.size())
    )
    assert names == ["c", "lang", "score_micro"], (
        f"window input is not histogram-grain: {names}"
    )
