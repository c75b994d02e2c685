"""SemDeDup (semdedup_q): planted near-duplicate embeddings with a
pure-Python replica of the greedy triangular-mask rule, plus
registry-query invariants on the real corpus."""

import math

from pyspark.sql import functions as F

from composable_logs_spark.queries.semdedup_q import (
    _TAU,
    _VARIANT_OFFSET,
    dedup_semantic,
    semdedup_frame,
)


def _mk_vectors():
    """8 base directions (one per init centroid), each with a
    near-identical copy (cos ~ 1 > tau) and a moderately-rotated
    sibling (cos ~ 0.71 < tau). 64-dim, deterministic."""
    vecs = {}
    for g in range(8):
        base = [0.0] * 64
        base[2 * g] = 1.0
        base[2 * g + 1] = 0.1 * (g + 1)
        vecs[g] = base  # vec_id < 8: k-means seeds
        near = [x * 1.001 for x in base]
        near[63] = 0.0001 * (g + 1)
        vecs[100 + g] = near
        sib = [0.0] * 64
        sib[2 * g] = 1.0
        sib[32 + g] = 1.0  # ~45 degrees away: below tau
        vecs[200 + g] = sib
    return vecs


def _cos(u, v):
    d = sum(a * b for a, b in zip(u, v))
    return d / math.sqrt(sum(a * a for a in u)) / math.sqrt(
        sum(b * b for b in v)
    )


def test_planted_semdedup_matches_replica(spark):
    vecs = _mk_vectors()
    df = spark.createDataFrame(
        [(i, v) for i, v in sorted(vecs.items())],
        "vec_id long, vec array<double>",
    )
    rows = semdedup_frame(df).collect()
    got = {r["vec_id"]: r for r in rows}
    assert set(got) == set(vecs)

    # replica of the greedy rule FROM the query's own cell/csim output
    # (so it checks the dedup step, not the k-means it shares with the
    # already-verified IVF queries)
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    expect_dropped = set()
    for members in by_cell.values():
        members.sort(key=lambda r: (r["csim"], r["vec_id"]))
        for i, r in enumerate(members):
            for e in members[:i]:
                c = round(_cos(vecs[r["vec_id"]], vecs[e["vec_id"]]), 4)
                if c >= _TAU:
                    expect_dropped.add(r["vec_id"])
                    break
    assert {v for v, r in got.items() if r["dropped"]} == expect_dropped

    # planted structure: each (g, 100+g) pair is a semantic duplicate —
    # exactly one of the two survives; every rotated sibling survives
    for g in range(8):
        assert got[g]["dropped"] != got[100 + g]["dropped"]
        assert not got[200 + g]["dropped"]


def test_registry_query_invariants(spark, sf_dir):
    out = dedup_semantic(spark, sf_dir).collect()
    assert len(out) == 8  # one row per cell
    for r in out:
        assert r["n_kept"] + r["n_dropped"] == r["n_vecs"]
        assert r["n_kept"] >= 1  # first-in-order is never dropped
        # every planted variant pair should collapse: at least the
        # variant half of each cell is prunable
        assert r["n_dropped"] >= r["n_vecs"] // 4


def test_variant_pairs_collapse_exactly(spark, sf_dir):
    """On the real corpus the ONLY >= tau pairs are the constructed
    base/variant ones (raw max pairwise cosine ~0.5), so drops must
    equal vector count / 2 exactly, and each kept set must contain
    exactly one of every pair."""
    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.similarity_q import _as_double

    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    n = base.count()
    from composable_logs_spark.queries.semdedup_q import _augmented

    flags = semdedup_frame(_augmented(base)).collect()
    dropped = {r["vec_id"] for r in flags if r["dropped"]}
    assert len(dropped) == n
    for r in flags:
        vid = r["vec_id"]
        if vid < _VARIANT_OFFSET:
            assert (vid in dropped) != (vid + _VARIANT_OFFSET in dropped)


def test_cell_bound_shrinks_with_k(spark, sf_dir):
    """The K scale lever: the pair stage's candidate count is bounded
    by sum(c_i choose 2) over cell sizes; doubling K must shrink that
    bound (and both operating points are registry-gated)."""
    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.semdedup_q import _augmented
    from composable_logs_spark.queries.similarity_q import _as_double

    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("vec")
    )
    corpus = _augmented(base)
    n = corpus.count()

    def pair_bound(k):
        sizes = [
            r["c"]
            for r in semdedup_frame(corpus, k=k)
            .groupBy("cell")
            .agg(F.count("*").alias("c"))
            .collect()
        ]
        assert sum(sizes) == n  # every vector assigned exactly once
        return sum(c * (c - 1) // 2 for c in sizes)

    b8, b16 = pair_bound(8), pair_bound(16)
    assert b16 < b8 < n * (n - 1) // 2  # lever works; never all-pairs
