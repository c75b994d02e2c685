"""Split-conformal audit (queries/conformal_q) against an independent
Python replica (hashlib split, explicit sort-and-index quantile), plus
the guarantee property on a clean synthetic group: empirical coverage
must land at-or-above the nominal level minus finite-sample slack."""

import hashlib
import math

from composable_logs_spark.queries.conformal_q import conformal_audit

SF = "/root/testdata/sf0.001"


def _is_cal(event_id):
    return (
        int(hashlib.md5(str(event_id).encode()).hexdigest()[:15], 16) % 2 == 0
    )


def _python_conformal(rows):
    by_type = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((eid, math.floor(v * 100)))
    out = {}
    for et, items in by_type.items():
        cal = [(e, c) for e, c in items if _is_cal(e)]
        ev = [(e, c) for e, c in items if not _is_cal(e)]
        if not cal or not ev:
            continue
        n = len(cal)
        mean_c = sum(c for _, c in cal) / n
        scores = sorted((abs(c - mean_c), e) for e, c in cal)
        k = min((9 * (n + 1) + 9) // 10, n)
        q = scores[k - 1][0]
        n_cov = sum(1 for e, c in ev if abs(c - mean_c) <= q)
        out[et] = (
            n,
            len(ev),
            round(mean_c / 100.0, 4),
            round(q / 100.0, 4),
            round(k / (n + 1), 4),
            round(n_cov / len(ev), 4),
        )
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_matches_independent_replica(spark):
    rows = [
        (i, "a" if i % 3 else "b", 20.0 + (i * 17 % 37) * 0.5)
        for i in range(120)
    ]
    expect = _python_conformal(rows)
    got = {
        r["event_type"]: (
            r["n_cal"],
            r["n_eval"],
            r["pred_r"],
            r["q_r"],
            r["nominal_r"],
            r["coverage_r"],
        )
        for r in conformal_audit(_df(spark, rows)).collect()
    }
    assert got == expect


def test_coverage_meets_guarantee_on_real_events(spark):
    from composable_logs_spark.queries import load
    from composable_logs_spark.queries.conformal_q import events_conformal_audit

    got = events_conformal_audit(spark, SF).collect()
    assert got
    for r in got:
        # finite-sample slack: coverage concentrates around nominal
        # within ~2/sqrt(n_eval); must never sit far below
        slack = 2.0 / math.sqrt(r["n_eval"])
        assert r["coverage_r"] >= r["nominal_r"] - slack
        assert r["nominal_r"] >= 0.9


def test_tiny_group_clamps_to_max_score(spark):
    # 3 calibration rows: k = ceil(0.9*4) = 4 clamps to n=3 -> q is the
    # MAX calibration score, never an out-of-range index
    rows = [(i, "t", float(i)) for i in range(8)]
    out = conformal_audit(_df(spark, rows)).collect()
    assert len(out) == 1
    cal = [(i, i * 100) for i in range(8) if _is_cal(i)]
    mean_c = sum(c for _, c in cal) / len(cal)
    assert out[0]["q_r"] == round(max(abs(c - mean_c) for _, c in cal) / 100, 4)
