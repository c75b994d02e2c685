"""Margin-based bitext mining, checked against an INDEPENDENT numpy
re-implementation of the whole pipeline (SRP banding -> candidates ->
integer margin -> mutual best) — a third implementation alongside the
Spark query and the DuckDB oracle."""

from collections import defaultdict

import numpy as np
import pandas as pd

from composable_logs_spark.queries.bitext_q import (
    _K,
    _MARGIN_MILLI,
    _N_BANDS,
    _BAND_BITS,
    mine_bitext_margin,
)
from composable_logs_spark.queries.srp_lsh_q import _PLANES_NP, _quantized_positive


def _numpy_mine(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    bits = _quantized_positive(mat @ _PLANES_NP.T)
    packed = bits.reshape(len(mat), _N_BANDS, _BAND_BITS) @ (
        1 << np.arange(_BAND_BITS, dtype=np.int64)
    )
    src = np.where(ids % 2 == 0)[0]
    tgt = np.where(ids % 2 == 1)[0]
    cand = set()
    for k in range(_N_BANDS):
        buckets = defaultdict(lambda: ([], []))
        for i in src:
            buckets[packed[i, k]][0].append(i)
        for j in tgt:
            buckets[packed[j, k]][1].append(j)
        for a_rows, b_rows in buckets.values():
            for i in a_rows:
                for j in b_rows:
                    cand.add((i, j))
    cos = {
        (i, j): int(np.floor((mat[i] @ mat[j]) / (nrm[i] * nrm[j]) * 1e6 + 0.5))
        for i, j in cand
    }
    by_src, by_tgt = defaultdict(list), defaultdict(list)
    for (i, j), cm in cos.items():
        by_src[i].append((cm, ids[j]))
        by_tgt[j].append((cm, ids[i]))

    def topk(lst):
        lst = sorted(lst, key=lambda t: (-t[0], t[1]))[:_K]
        return sum(t[0] for t in lst), len(lst)

    s_agg = {i: topk(v) for i, v in by_src.items()}
    t_agg = {j: topk(v) for j, v in by_tgt.items()}
    margin = {}
    for (i, j), cm in cos.items():
        (sa, ka), (sb, kb) = s_agg[i], t_agg[j]
        denom = sa * kb + sb * ka
        if denom > 0:
            margin[(i, j)] = (2000 * cm * ka * kb) // denom
    fwd, bwd = {}, {}
    for (i, j), m in margin.items():
        if i not in fwd or (-m, ids[j]) < fwd[i][0]:
            fwd[i] = ((-m, ids[j]), (i, j))
        if j not in bwd or (-m, ids[i]) < bwd[j][0]:
            bwd[j] = ((-m, ids[i]), (i, j))
    mined = {
        (int(ids[i]), int(ids[j])): (cos[(i, j)], margin[(i, j)])
        for _, (i, j) in fwd.values()
        if bwd[j][1] == (i, j) and margin[(i, j)] >= _MARGIN_MILLI
    }
    return mined


def test_bitext_matches_numpy(spark, sf_dir):
    expect = _numpy_mine(sf_dir)
    got = mine_bitext_margin(spark, sf_dir).collect()
    assert len(got) == len(expect) > 0
    for r in got:
        assert (r["src_id"], r["tgt_id"]) in expect
        cm, mm = expect[(r["src_id"], r["tgt_id"])]
        assert r["cos_micro"] == cm and r["margin_milli"] == mm


def test_bitext_is_mutual_best_across_parities(spark, sf_dir):
    got = mine_bitext_margin(spark, sf_dir).collect()
    srcs = [r["src_id"] for r in got]
    tgts = [r["tgt_id"] for r in got]
    # a 1:1 alignment: no src or tgt mined twice, parities disjoint
    assert len(srcs) == len(set(srcs)) and len(tgts) == len(set(tgts))
    assert all(s % 2 == 0 for s in srcs) and all(t % 2 == 1 for t in tgts)
    assert all(r["margin_milli"] >= _MARGIN_MILLI for r in got)
