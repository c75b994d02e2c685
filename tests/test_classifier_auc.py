"""Exact AUC over the learned quality classifier: the hierarchical
prefix-sum must reproduce the quadratic-definition U statistic computed
directly in Python, and the classifier must actually separate the
planted classes."""

import numpy as np
import pytest

from composable_logs_spark.queries.text_auc_q import text_classifier_auc
from composable_logs_spark.queries.text_classifier_q import scored_examples


def _u2_quadratic(pos, neg):
    pos = np.asarray(pos)[:, None]
    neg = np.asarray(neg)[None, :]
    return int(2 * (pos > neg).sum() + (pos == neg).sum())


@pytest.fixture(scope="module")
def auc_row(spark, sf_dir):
    return text_classifier_auc(spark, sf_dir).collect()[0]


def test_u2_matches_quadratic_definition(spark, sf_dir, auc_row):
    s = scored_examples(spark, sf_dir).select("is_prose", "logit_micro").collect()
    pos = [r["logit_micro"] for r in s if r["is_prose"]]
    neg = [r["logit_micro"] for r in s if not r["is_prose"]]
    assert auc_row["n_pos"] == len(pos) and auc_row["n_neg"] == len(neg)
    assert auc_row["u2"] == _u2_quadratic(pos, neg)


def test_classifier_separates_planted_classes(auc_row):
    # boilerplate must rank clearly below prose; and AUC is a probability
    assert 0.0 <= auc_row["auc"] <= 1.0
    assert auc_row["auc"] > 0.9
    assert auc_row["u2"] <= 2 * auc_row["n_pos"] * auc_row["n_neg"]
