"""Asymmetric n-gram containment (queries/containment_q): a planted
quote-inside-a-larger-page pair is found in the contained→container
direction only, and the symmetric direction is correctly rejected by
the containment threshold."""

from composable_logs_spark.queries.containment_q import (
    _MIN_CONTAINMENT,
    dedup_containment,
)

_WORDS = [f"w{i:02d}" for i in range(20)]


def _sf(spark, tmp_path):
    a_text = " ".join(_WORDS)  # 20 tokens -> 18 shingles
    b_text = a_text + " extra1 extra2 extra3 extra4"  # proper container
    c_text = " ".join(f"z{i:02d}" for i in range(20))  # unrelated
    spark.createDataFrame(
        [
            (0, a_text, "en", "web", len(a_text)),
            (1, b_text, "en", "web", len(b_text)),
            (2, c_text, "en", "web", len(c_text)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_planted_containment_found_directed(spark, tmp_path):
    rows = {
        (r["doc_a"], r["doc_b"]): r
    for r in dedup_containment(spark, _sf(spark, tmp_path)).collect()}

    # A (doc 0) is fully contained in B (doc 1): found, containment 1.0
    assert (0, 1) in rows
    r = rows[(0, 1)]
    assert r["containment_r"] == 1.0
    assert r["n_shared"] == r["n_a"] and r["n_b"] > r["n_a"]

    # the symmetric direction is NOT a containment (B has 4 extra
    # tokens, so only ~18/22 of its shingles appear in A)
    assert (1, 0) not in rows

    # every reported row satisfies the operator's contract
    for (a, b), row in rows.items():
        assert row["containment_r"] >= _MIN_CONTAINMENT
        assert row["n_b"] > row["n_a"]
        assert a != b

    # the unrelated doc never pairs with the planted ones
    assert not any({a, b} & {2} and {a, b} & {0, 1} for a, b in rows)
