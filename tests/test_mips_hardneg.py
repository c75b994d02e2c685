"""MIPS norm-prune and hard-negative mining, checked against an
INDEPENDENT numpy brute force over the same parquet (not the DuckDB
oracle — a third implementation)."""

import numpy as np
import pandas as pd

from composable_logs_spark.queries.hardneg_q import embedding_hard_negatives
from composable_logs_spark.queries.mips_q import ann_mips_norm_prune
from composable_logs_spark.queries.similarity_q import _N_QUERIES, _TOP_K


def _vectors(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return pdf["vec_id"].to_numpy(), pdf["label"].to_numpy(), mat


def test_mips_matches_numpy_brute_force(spark, sf_dir):
    ids, _, mat = _vectors(sf_dir)
    got = ann_mips_norm_prune(spark, sf_dir).collect()
    assert len(got) == _N_QUERIES * _TOP_K
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["dot"]))
    for q in range(_N_QUERIES):
        dots = np.round(mat @ mat[ids == q][0], 4)
        order = sorted(
            ((d, i) for d, i in zip(dots, ids) if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:_TOP_K]
        expect = [(rk + 1, int(i), float(d)) for rk, (d, i) in enumerate(order)]
        assert sorted(by_q[q]) == expect, f"query {q}"


def test_hard_negatives_exclude_anchor_class(spark, sf_dir):
    ids, labels, mat = _vectors(sf_dir)
    lab = dict(zip(ids.tolist(), labels.tolist()))
    got = embedding_hard_negatives(spark, sf_dir).collect()
    assert len(got) == _N_QUERIES * _TOP_K
    for r in got:
        assert lab[r["neighbor_id"]] != lab[r["query_id"]]
        assert r["neighbor_label"] == lab[r["neighbor_id"]]
    # ranks are dense 1.._TOP_K per anchor
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, _TOP_K + 1)) for v in per_q.values())
