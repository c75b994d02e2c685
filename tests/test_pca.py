"""embedding_pca_top1 (map-side moment partials + driver power method):
invariants + determinism. The gate hash-checks it against a DuckDB
replica of the same power iteration; this test adds the property-based
angle: unit norm, non-negative explained variance that matches the
quadratic form recomputed from raw data, bitwise determinism across
runs, and component-level parity with a single-machine numpy PCA over
the whole group (proving the distributed moment accumulation loses
nothing vs the collect-the-group formulation it replaced)."""

import math

import numpy as np

from composable_logs_spark.queries import load
from composable_logs_spark.queries.similarity_q import embedding_pca_top1


def test_pca_invariants_and_determinism(spark, sf_dir):
    out1 = embedding_pca_top1(spark, sf_dir).collect()
    out2 = embedding_pca_top1(spark, sf_dir).collect()
    key = lambda r: (r["label"], r["dim"])  # noqa: E731
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # deterministic

    by_label = {}
    for r in out1:
        by_label.setdefault(r["label"], {})[r["dim"]] = (
            r["component"], r["explained_var"]
        )
    raw = load(spark, sf_dir, "embeddings").collect()
    vecs_by_label = {}
    for r in raw:
        vecs_by_label.setdefault(r["label"], []).append(
            (r["vec_id"], list(r["embedding"]))
        )

    for label, comps in by_label.items():
        v = np.array([comps[d][0] for d in sorted(comps)])
        ev = comps[0][1]
        # components are rounded to 4dp for the cross-engine oracle, so
        # the norm can drift by up to ~sqrt(64)*5e-5
        assert math.isclose(float(np.linalg.norm(v)), 1.0, abs_tol=5e-4)
        assert ev > 0
        # explained variance equals the quadratic form on the raw data
        X = np.stack([e for _, e in sorted(vecs_by_label[label])]).astype(np.float64)
        X = X - X.mean(axis=0)
        cov = (X.T @ X) / len(X)
        assert math.isclose(float(v @ cov @ v), ev, rel_tol=1e-3)
        # dominant direction: quadratic form >= that of any coordinate axis
        for i in range(0, X.shape[1], 16):
            axis = np.zeros(X.shape[1]); axis[i] = 1.0
            assert float(v @ cov @ v) >= float(axis @ cov @ axis) - 1e-6
        # component parity with a whole-group single-machine PCA running
        # the identical recurrence on the exact covariance
        from composable_logs_spark.queries.similarity_q import _pca_power_iterate

        v_ref, ev_ref = _pca_power_iterate(cov)
        assert float(np.max(np.abs(v - v_ref))) < 5e-4
        assert math.isclose(ev_ref, ev, rel_tol=1e-3)
