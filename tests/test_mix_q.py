"""Corpus-governance operators (mix_q): property-based checks on top of
the gate's value-level oracle."""

from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.queries.mix_q import (
    _DOMAIN_CAP,
    _MIX_TARGET,
    crossdoc_ngram_overlap,
    domain_cap_sample,
    mix_sources_to_target,
)


def test_domain_cap_respects_cap_and_is_deterministic(spark, sf_dir):
    out1 = domain_cap_sample(spark, sf_dir).collect()
    for r in out1:
        assert r["n_kept"] == min(r["n_docs"], _DOMAIN_CAP)
    out2 = domain_cap_sample(spark, sf_dir).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))


def test_domain_cap_uses_window_group_limit(spark, sf_dir):
    """rank<=K must trigger Spark's WindowGroupLimit pushdown: per-task
    K-row heaps per group before the window sort, instead of sorting
    every group member."""
    df = domain_cap_sample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_crossdoc_overlap_flags_planted_variants(spark, sf_dir):
    from composable_logs_spark.queries.dedup_q import _VARIANT_OFFSET

    rows = {r["doc_id"]: r for r in crossdoc_ngram_overlap(spark, sf_dir).collect()}
    originals = [r for i, r in rows.items() if i < _VARIANT_OFFSET]
    variants = [r for i, r in rows.items() if i >= _VARIANT_OFFSET]
    assert originals and len(variants) == len(originals)
    # a variant is the original minus its last 3 words: every one of its
    # shingles also occurs in the original, so its ratio is exactly 1
    assert all(v["shared_ratio"] == 1.0 and v["flagged"] for v in variants)
    # originals keep a private tail (the final shingles the variant
    # lost) unless another doc happens to share them
    assert sum(o["shared_ratio"] < 1.0 for o in originals) > len(originals) // 2
    for r in rows.values():
        assert 0 <= r["n_shared"] <= r["n_ngrams"]


def test_mix_realises_target_proportions(spark, sf_dir):
    rows = {r["lang"]: r for r in mix_sources_to_target(spark, sf_dir).collect()}
    assert set(rows) == set(_MIX_TARGET)
    counts = {
        r["lang"]: r["n"]
        for r in load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    lam = min(counts[lang] / p for lang, p in _MIX_TARGET.items())
    total = sum(r["n_sampled"] for r in rows.values())
    for lang, r in rows.items():
        assert r["n_sampled"] <= r["n_available"] == counts[lang]
        # quota = floor(lam * p), fully filled (hash order never runs dry
        # because quota <= n_available by construction of lam)
        assert r["n_sampled"] == int(lam * _MIX_TARGET[lang])
        # realised share within one document of the target share
        assert abs(r["n_sampled"] - _MIX_TARGET[lang] * total) <= 1 + total * 0.01
    # the binding language is sampled (nearly) fully
    binding = min(_MIX_TARGET, key=lambda k: counts[k] / _MIX_TARGET[k])
    assert rows[binding]["n_sampled"] >= rows[binding]["n_available"] - 1
