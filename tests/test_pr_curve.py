"""Classifier PR curve: exact counts checked against a pandas
brute-force over the same scored examples (third implementation), plus
the structural sweep properties a threshold table must satisfy."""

from composable_logs_spark.queries.pr_curve_q import (
    _T_HI,
    _T_LO,
    classifier_pr_curve,
)
from composable_logs_spark.queries.text_classifier_q import scored_examples


def test_counts_match_bruteforce_at_every_threshold(spark, sf_dir):
    scored = scored_examples(spark, sf_dir).collect()
    means = [(r["logit_micro"] // abs(r["n_feats"]) if r["logit_micro"] >= 0
              else -((-r["logit_micro"]) // r["n_feats"]), r["is_prose"])
             for r in scored]
    # Spark/DuckDB integer division truncates toward zero — mirror it
    got = {r["t_nat"]: r for r in classifier_pr_curve(spark, sf_dir).collect()}
    assert sorted(got) == list(range(_T_LO, _T_HI + 1))
    n_pos = sum(1 for _, pos in means if pos)
    for t in range(_T_LO, _T_HI + 1):
        tp = sum(1 for s, pos in means if pos and s >= t * 1_000_000)
        fp = sum(1 for s, pos in means if not pos and s >= t * 1_000_000)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, n_pos - tp), t
        assert r["recall_milli"] == (1000 * tp) // n_pos
        if tp + fp == 0:
            assert r["precision_milli"] is None
        else:
            assert r["precision_milli"] == (1000 * tp) // (tp + fp)


def test_sweep_properties(spark, sf_dir):
    rows = sorted(
        classifier_pr_curve(spark, sf_dir).collect(), key=lambda r: r["t_nat"]
    )
    # recall is non-increasing in the threshold, and the loosest
    # threshold predicts everything positive (full recall)
    recalls = [r["recall_milli"] for r in rows]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    assert rows[0]["recall_milli"] == 1000
    # counts are internally consistent at every threshold
    for r in rows:
        assert r["tp"] + r["fn"] == rows[0]["tp"]
        assert r["tp"] >= 0 and r["fp"] >= 0
    # the planted classifier separates: somewhere in the sweep both
    # precision and recall beat the predict-all baseline
    base_precision = rows[0]["precision_milli"]
    assert any(
        r["precision_milli"] is not None
        and r["precision_milli"] > base_precision
        and r["recall_milli"] >= 900
        for r in rows
    )
