"""Poisson-bootstrap CI (queries/bootstrap_q) against an independent
pure-Python replica (hashlib md5, explicit Poisson CDF walk) on a hand
frame, plus the statistical sanity that only holds if the machinery is
right: the interval contains the point estimate and tightens ~1/sqrt(n)
as the sample grows."""

import hashlib
import math

from composable_logs_spark.queries.bootstrap_q import (
    _B,
    _THRESH,
    bootstrap_ci_mean,
)


def _weight(event_id, bi):
    hv = (
        int(hashlib.md5(f"{event_id}:{bi}".encode()).hexdigest()[:15], 16)
        % 1_000_000
    )
    for k, t in enumerate(_THRESH):
        if hv < t:
            return k
    return 9


def _python_ci(rows, b=_B):
    by_type = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((eid, math.floor(v * 100)))
    out = {}
    for et, items in by_type.items():
        means = []
        for bi in range(b):
            ws = wc = 0
            for eid, cents in items:
                w = _weight(eid, bi)
                ws += w
                wc += w * cents
            if ws > 0:
                means.append((wc / ws, bi))
        means.sort()
        lo = means[b // 40 - 1][0]
        hi = means[b - b // 40][0]
        n = len(items)
        tot = sum(c for _, c in items)
        out[et] = (
            n,
            round(tot / n / 100.0, 4),
            round(lo / 100.0, 4),
            round(hi / 100.0, 4),
            round((hi - lo) / 100.0, 4),
        )
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_matches_independent_replica(spark):
    rows = [(i, "a" if i % 2 else "b", 10.0 + (i * 7 % 13)) for i in range(40)]
    expect = _python_ci(rows)
    got = {
        r["event_type"]: (
            r["n"],
            r["mean_r"],
            r["ci_lo_r"],
            r["ci_hi_r"],
            r["ci_width_r"],
        )
        for r in bootstrap_ci_mean(_df(spark, rows)).collect()
    }
    assert got == expect


def test_ci_brackets_mean_and_tightens_with_n(spark):
    def mk(n):
        return [(i, "x", 50.0 + (i * 31 % 101) - 50) for i in range(n)]

    small = bootstrap_ci_mean(_df(spark, mk(60))).collect()[0]
    big = bootstrap_ci_mean(_df(spark, mk(960))).collect()[0]
    for r in (small, big):
        assert r["ci_lo_r"] <= r["mean_r"] <= r["ci_hi_r"]
    # 16x the data: width should drop by roughly 4x; assert a loose 2x
    assert big["ci_width_r"] < small["ci_width_r"] / 2
