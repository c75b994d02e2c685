"""Per-language AUC: group decomposition must be consistent with the
global Mann-Whitney statistic and the planted separable labels."""

from composable_logs_spark.queries.group_auc_q import classifier_group_auc
from composable_logs_spark.queries.text_auc_q import text_classifier_auc


def test_group_auc_consistent_with_global(spark, sf_dir):
    groups = classifier_group_auc(spark, sf_dir).collect()
    glob = text_classifier_auc(spark, sf_dir).collect()[0]
    # pos/neg totals decompose exactly
    assert sum(r["n_pos"] for r in groups) == glob["n_pos"]
    assert sum(r["n_neg"] for r in groups) == glob["n_neg"]
    # on the planted fully-separated corpus every group is perfect,
    # so within-group U hits its maximum and the worst group ties
    for r in groups:
        assert r["u2"] == 2 * r["n_pos"] * r["n_neg"]
        assert r["auc"] == 1.0
    assert all(r["is_worst"] for r in groups)  # all tied at the min
    assert glob["auc"] == 1.0
