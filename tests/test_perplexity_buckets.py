"""CCNet perplexity bucketing: rank-tercile properties and ordering."""

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
