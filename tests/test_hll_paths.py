"""hll_intersection_parts + session_path_topk: independent references."""

import pandas as pd

from composable_logs_spark.queries.hll_q import hll_intersection_parts
from composable_logs_spark.queries.session_q import _PATH_K, session_path_topk


def test_hll_intersection_estimates_sane(spark, sf_dir):
    r = hll_intersection_parts(spark, sf_dir).collect()[0]
    # inclusion-exclusion identities and sketch-error sanity at m=256
    # (relative standard error ~1.04/sqrt(256) = 6.5% per estimate)
    assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-6
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-6
    assert r["true_intersection"] > 0
    rel = abs(r["est_intersection"] - r["true_intersection"]) / r["true_intersection"]
    assert rel < 0.35, (r, rel)


def test_hll_intersection_exact_truth(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    (truth,) = con.execute(
        f"""
        SELECT count(*) FROM (
          SELECT DISTINCT l.l_partkey
          FROM '{sf_dir}/lineitem.parquet' l
          JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
          JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = 0
          INTERSECT
          SELECT DISTINCT l.l_partkey
          FROM '{sf_dir}/lineitem.parquet' l
          JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
          JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = 1
        )
        """
    ).fetchone()
    r = hll_intersection_parts(spark, sf_dir).collect()[0]
    assert r["true_intersection"] == truth


def test_session_paths_match_bruteforce(spark, sf_dir):
    from collections import Counter

    pdf = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts"]
    )
    paths = Counter()
    for _, g in pdf.groupby("user_id"):
        # unit-robust epoch microseconds (pandas may give ns or us here)
        us = g.ts.values.astype("datetime64[us]").astype("int64")
        types = g.event_type.tolist()
        sess, sid, prev = [], 0, None
        for t_us in us:
            if prev is None or t_us - prev >= 1800 * 1000000:
                sid += 1
            sess.append(sid)
            prev = t_us
        for i in range(len(types) - 2):
            if sess[i] == sess[i + 2]:
                paths[f"{types[i]}>{types[i+1]}>{types[i+2]}"] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_PATH_K]
    got = [
        (r["path"], r["n"]) for r in session_path_topk(spark, sf_dir).collect()
    ]
    assert got == expect


def test_fk_audit_matches_pandas(spark, sf_dir):
    from composable_logs_spark.queries.audit_q import _FK_EDGES, fk_integrity_audit

    got = {r["fk_edge"]: r for r in fk_integrity_audit(spark, sf_dir).collect()}
    assert len(got) == len(_FK_EDGES)
    for name, child, fk, parent, pk in _FK_EDGES:
        cdf = pd.read_parquet(f"{sf_dir}/{child}.parquet", columns=[fk])
        pdfp = pd.read_parquet(f"{sf_dir}/{parent}.parquet", columns=[pk])
        r = got[name]
        assert r["n_child_rows"] == len(cdf)
        assert r["n_nonnull_fk"] == cdf[fk].notna().sum()
        assert r["n_parent_keys"] == pdfp[pk].nunique()
        orphans = (~cdf[fk].dropna().isin(set(pdfp[pk]))).sum()
        assert r["n_orphans"] == orphans


def test_hll_cumulative_is_monotone_and_tracks_truth(spark, sf_dir):
    from composable_logs_spark.queries.audit_q import hll_cumulative_users

    rows = hll_cumulative_users(spark, sf_dir).collect()
    assert len(rows) >= 25
    ests = [r["hll_cum_estimate"] for r in rows]
    trues = [r["true_cum_users"] for r in rows]
    # register merge can only grow: both curves monotone non-decreasing
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
    assert all(a <= b for a, b in zip(trues, trues[1:]))
    # sketch error sane at m=256 on every day
    for e, t in zip(ests, trues):
        assert abs(e - t) / t < 0.25
