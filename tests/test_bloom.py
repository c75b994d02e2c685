"""Bloom-filter join pruning (operators/bloom.py): membership semantics
and plan shape."""

from pyspark.sql import functions as F

from composable_logs_spark.operators.bloom import bloom_build, bloom_prefilter

N_BITS = 1 << 14
K = 5


def test_no_false_negatives(spark):
    build = spark.range(0, 500).select((F.col("id") * 3).alias("key"))
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    filt = bloom_build(build, "key", N_BITS, K)
    kept = set(
        r.key for r in bloom_prefilter(probe, "key", filt, N_BITS, K).collect()
    )
    true_keys = set(r.key for r in build.collect()) & set(
        r.key for r in probe.collect()
    )
    # one-sided error: every true key must survive the prefilter
    assert true_keys <= kept


def test_false_positive_rate_bounded(spark):
    build = spark.range(0, 500).select((F.col("id") * 3).alias("key"))
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    filt = bloom_build(build, "key", N_BITS, K)
    kept = bloom_prefilter(probe, "key", filt, N_BITS, K).count()
    true_hits = 1000  # multiples of 3 in [0, 3000)
    false_pos = kept - true_hits
    # theoretical ε at n=500, m=2^14, k=5 is ~0.1%; allow a wide margin
    assert false_pos <= 0.05 * 3000, false_pos


def test_prefilter_probe_side_not_shuffled(spark):
    """The prefilter must be k BroadcastHashJoins — no Exchange on the
    probe side (broadcast exchanges of the filter table are expected)."""
    build = spark.range(0, 100).select(F.col("id").alias("key"))
    probe = spark.range(0, 1000).select(
        F.col("id").alias("key"), (F.col("id") % 7).alias("payload")
    )
    filt = bloom_build(build, "key", N_BITS, K)
    pruned = bloom_prefilter(probe, "key", filt, N_BITS, K)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == K, plan
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            # the only allowed shuffle is inside bloom_build's tiny
            # word-level aggregation (word_idx hash-agg)
            assert "word_idx" in line or "bit_or" in line, plan


def test_schema_preserved(spark):
    probe = spark.range(0, 10).select(
        F.col("id").alias("key"), F.lit("x").alias("payload")
    )
    filt = bloom_build(probe, "key", N_BITS, K)
    out = bloom_prefilter(probe, "key", filt, N_BITS, K)
    assert out.columns == ["key", "payload"]
    assert out.count() == 10


def test_prefilter_survives_adversarial_column_names(spark):
    # caller columns named like the old hardcoded temporaries must not be
    # shadowed by the operator's internals
    build = spark.createDataFrame([(1,), (2,)], "k long")
    probe = spark.createDataFrame(
        [(1, 10, 11), (3, 30, 31)], "k long, _p0 long, _bb0 long"
    )
    bl = bloom_build(build, "k")
    out = bloom_prefilter(probe, "k", bl).collect()
    assert [(r["k"], r["_p0"], r["_bb0"]) for r in out] == [(1, 10, 11)]
