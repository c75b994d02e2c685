"""SCD2 history build: hand-built event streams with known run
structure must produce exactly the expected versions, open intervals,
and closed-duration arithmetic."""

import datetime as dt

from pyspark.sql import functions as F

from composable_logs_spark.queries.scd_q import scd2_versions


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), uid, t)
            for eid, s, uid, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_runs_collapse_and_intervals(spark):
    # user 1: A A B A  -> versions A(0..20), B(20..30), A(30..open)
    # user 2: C        -> one open version
    ev = _ev(
        spark,
        [
            (1, 0, 1, "A"),
            (2, 10, 1, "A"),
            (3, 20, 1, "B"),
            (4, 30, 1, "A"),
            (5, 0, 2, "C"),
        ],
    )
    vers = {
        (r["user_id"], r["version"]): r
        for r in scd2_versions(ev).collect()
    }
    assert len(vers) == 4
    a1 = vers[(1, 1)]
    assert a1["event_type"] == "A" and a1["valid_to"].second == 20
    b = vers[(1, 2)]
    assert b["event_type"] == "B"
    assert b["valid_from"].second == 20 and b["valid_to"].second == 30
    a2 = vers[(1, 3)]
    assert a2["event_type"] == "A" and a2["valid_to"] is None  # current
    c = vers[(2, 1)]
    assert c["event_type"] == "C" and c["valid_to"] is None


def test_same_type_never_splits(spark):
    ev = _ev(spark, [(i, i * 5, 7, "X") for i in range(10)])
    out = scd2_versions(ev).collect()
    assert len(out) == 1
    assert out[0]["valid_from"].second == 0 and out[0]["valid_to"] is None


def test_tie_broken_by_event_id(spark):
    # two events at the SAME ts: event_id order decides the run split
    ev = _ev(spark, [(1, 0, 3, "A"), (2, 0, 3, "B"), (3, 10, 3, "B")])
    out = sorted(scd2_versions(ev).collect(), key=lambda r: r["version"])
    assert [r["event_type"] for r in out] == ["A", "B"]
    assert out[1]["valid_to"] is None
