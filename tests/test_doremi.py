"""DoReMi reweighting invariants: the quota realisation must be the
LARGEST corpus with the target proportions — the binding cluster is
sampled in full, nothing oversamples, and the realised mixture tracks
alpha to within the integer-floor slack."""

import pytest

from composable_logs_spark.queries.doremi_q import domain_reweight_doremi


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    return domain_reweight_doremi(spark, sf_dir).collect()


def test_mixture_realisation(rows):
    assert len(rows) >= 2
    total = sum(r["n_sampled"] for r in rows)
    assert total > 0
    for r in rows:
        assert 0 < r["n_sampled"] <= r["n_docs"]
        # realised share within floor slack of the target alpha
        assert abs(r["n_sampled"] / total - r["alpha"]) < 2.0 / total + 1e-4
    # the binding cluster (max realised/available ratio = 1) is consumed
    # in full — otherwise the mixture was not maximal
    assert any(r["n_sampled"] == r["n_docs"] for r in rows)


def test_boost_shifts_the_mixture(rows):
    # alpha must differ from the baseline share for at least one cluster
    # with a distinct boost (the update must DO something)
    total_docs = sum(r["n_docs"] for r in rows)
    shifted = [r for r in rows if abs(r["alpha"] - r["n_docs"] / total_docs) > 1e-4]
    assert shifted, "reweighting left every cluster at its baseline share"
