"""Learned quality classifier: planted boilerplate must score below
planted prose — per example pair and in aggregate — and the weight
table must respect the hashing-trick bound (<= B rows regardless of
corpus size), which is what licenses the broadcast at 100 TB."""

import pytest
from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.queries.text_classifier_q import (
    _B,
    _features,
    labeled_examples,
    nb_logodds_weights,
    text_quality_classifier,
)


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    return text_quality_classifier(spark, sf_dir).cache()


def test_boilerplate_scores_below_prose_pairwise(scored):
    rows = {r["ex_id"]: r for r in scored.collect()}
    doc_ids = {e // 2 for e in rows}
    assert len(doc_ids) >= 50
    for d in doc_ids:
        pos, neg = rows[2 * d], rows[2 * d + 1]
        assert pos["is_prose"] and not neg["is_prose"]
        # the property the filter exists for: chrome below content,
        # for EVERY planted pair, not just on average
        assert pos["score"] > neg["score"], f"doc {d}: {pos} !> {neg}"


def test_classes_fully_separated(scored):
    agg = scored.groupBy("is_prose").agg(
        F.min("score").alias("lo"),
        F.max("score").alias("hi"),
        F.sum(F.when(F.col("pred_prose") == F.col("is_prose"), 1).otherwise(0)).alias("correct"),
        F.count("*").alias("n"),
    ).collect()
    by = {r["is_prose"]: r for r in agg}
    # every example classified correctly (NB log-odds on its own
    # training set with disjoint vocabularies must separate)
    assert by[True]["correct"] == by[True]["n"]
    assert by[False]["correct"] == by[False]["n"]
    # and the score RANGES are disjoint
    assert by[True]["lo"] > by[False]["hi"]


def test_weight_table_bounded_by_buckets(spark, sf_dir):
    feats = _features(labeled_examples(load(spark, sf_dir, "documents")))
    assert nb_logodds_weights(feats).count() <= _B
