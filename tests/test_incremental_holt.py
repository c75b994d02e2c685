"""Streaming Holt state == batch ts_holt_linear on the same events
(left-fold split property), replay idempotence, and the
late-day-raises contract."""

import pytest
from pyspark.sql import functions as F

from composable_logs_spark.queries import load
from composable_logs_spark.queries.holt_q import ts_holt_linear
from composable_logs_spark.streaming.incremental_holt import HoltStateSink

SF = "/root/testdata/sf0.001"


def _day_batches(spark, cuts):
    e = load(spark, SF, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    lo = [None] + cuts
    hi = cuts + [None]
    out = []
    for a, b in zip(lo, hi):
        df = e
        if a is not None:
            df = df.where(F.col("day") > F.lit(a))
        if b is not None:
            df = df.where(F.col("day") <= F.lit(b))
        out.append(df.drop("day"))
    return out


def _state_dict(df):
    return {
        r["event_type"]: (
            r["n_days"],
            r["last_day"],
            round(r["lvl"], 4),
            round(r["trd"], 4),
        )
        for r in df.collect()
    }


def test_stream_equals_batch_and_replay_is_idempotent(spark, tmp_path):
    sink = HoltStateSink(spark, str(tmp_path / "holt_state"))
    batches = _day_batches(spark, ["2024-01-10", "2024-01-20"])
    for i, b in enumerate(batches):
        sink.fold(b, i)
    got = _state_dict(sink.current_state())

    expected = {
        r["event_type"]: (
            r["n_days"],
            r["last_day"],
            r["level_r"],
            r["trend_r"],
        )
        for r in ts_holt_linear(spark, SF).collect()
    }
    assert got == expected

    # replay the LAST batch (restart before offset commit): state is
    # rewritten from the predecessor version, not double-applied
    sink.fold(batches[-1], len(batches) - 1)
    assert _state_dict(sink.current_state()) == expected


def test_day_at_or_before_folded_last_day_raises(spark, tmp_path):
    sink = HoltStateSink(spark, str(tmp_path / "holt_state"))
    batches = _day_batches(spark, ["2024-01-10"])
    sink.fold(batches[0], 0)
    with pytest.raises(RuntimeError, match="last_day"):
        sink.fold(batches[0], 1)  # same days again, NEW batch id
