"""Round-11 regression lock for the bench round-over-round outlier guard.

The r10 verdict found the guard had been a no-op for two rounds: the
driver commits BENCH_r*.json wrapped in an envelope
``{"n", "rc", "cpus", "sf", "tail", "parsed": {...}}``, and
``bench._prev_round_value`` read the TOP level, so "queries" /
"queries_extra" / "value" were never found and every drift branch was
dead code. These tests feed driver-shaped records and assert the guard
actually fires on synthetic drift — both the >2x per-query trigger and
the >10% total-drift note.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write_driver_record(tmp_path, round_no: int, parsed: dict) -> None:
    """Exactly the envelope shape the driver commits (see BENCH_r10.json)."""
    rec = {
        "n": round_no,
        "rc": 0,
        "cpus": 32,
        "sf": 0.1,
        "tail": "",
        "parsed": parsed,
    }
    (tmp_path / f"BENCH_r{round_no}.json").write_text(json.dumps(rec))


_PARSED = {
    "metric": "headline_total_runtime",
    "value": 8.711,
    "unit": "sec",
    "queries": {"q1_pricing_summary": 0.499, "dedup_minhash_lsh": 1.77},
    "queries_warm": {"q1_pricing_summary": 0.2},
    "queries_extra": {"spanlog_big_summarize": 15.979},
    "sf": 0.1,
}


def test_prev_round_value_unwraps_driver_envelope(tmp_path):
    _write_driver_record(tmp_path, 10, _PARSED)
    kw = dict(records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.1")
    assert bench._prev_round_value("q1_pricing_summary", "queries", **kw) == 0.499
    assert bench._prev_round_value("spanlog_big_summarize", "queries_extra", **kw) == 15.979
    assert bench._prev_round_value("value", "", **kw) == 8.711


def test_prev_round_value_accepts_flat_record(tmp_path):
    # bench.py's own stdout shape (no envelope) must keep working
    (tmp_path / "BENCH_r3.json").write_text(json.dumps(_PARSED))
    kw = dict(records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.1")
    assert bench._prev_round_value("q1_pricing_summary", "queries", **kw) == 0.499
    assert bench._prev_round_value("value", "", **kw) == 8.711


def test_prev_round_value_picks_newest_round(tmp_path):
    _write_driver_record(tmp_path, 9, dict(_PARSED, value=10.0))
    _write_driver_record(tmp_path, 10, dict(_PARSED, value=8.711))
    kw = dict(records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.1")
    assert bench._prev_round_value("value", "", **kw) == 8.711


def test_prev_round_value_skips_non_driver_sf(tmp_path):
    _write_driver_record(tmp_path, 10, _PARSED)
    assert (
        bench._prev_round_value(
            "value", "", records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.01"
        )
        is None
    )


def test_per_query_2x_drift_fires_against_driver_record(tmp_path):
    """End-to-end through the real lookup: a synthetic >2x drift vs the
    driver-shaped previous round must trip the re-measure branch."""
    _write_driver_record(tmp_path, 10, _PARSED)
    prev = bench._prev_round_value(
        "q1_pricing_summary",
        "queries",
        records_dir=str(tmp_path),
        sf_dir="/root/testdata/sf0.1",
    )
    assert prev == 0.499
    assert bench._drift_exceeds_2x([1.2, 1.3], prev)  # >2x slower: fires
    assert bench._drift_exceeds_2x([0.1, 0.11], prev)  # >2x faster: fires
    assert not bench._drift_exceeds_2x([0.45, 0.6], prev)  # within 2x
    assert not bench._drift_exceeds_2x([1.2, 1.3], None)  # no prior round


def test_zero_prev_value_is_a_prior_round_not_a_skip():
    """r11 advice regression lock: a legitimately recorded 0.0 must be
    treated as a prior round (any real measurement is >2x from 0), not
    falsy-conflated with "no prior round" — the second silent-skip class
    after the envelope bug."""
    assert bench._drift_exceeds_2x([0.5, 0.6], 0.0)  # fires, not skipped
    note = bench._total_drift_note(5.0, 0.0)
    assert note is not None and "prev was 0" in note
    # and None still means genuinely no prior round
    assert not bench._drift_exceeds_2x([0.5], None)
    assert bench._total_drift_note(5.0, None) is None


def test_round_record_written_and_read_back(tmp_path):
    """r12 verdict item 6: the driver envelope kept only the stdout tail
    (parsed=null), losing per-query timings. bench.py now writes the
    full JSON to bench_records/r{N}.json and the guard reads prev-round
    values from it — even when the driver envelope for the same round is
    truncated."""
    # driver rounds 9 and 10 exist; round 10's envelope is TRUNCATED
    _write_driver_record(tmp_path, 9, dict(_PARSED, value=99.0))
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"n": 10, "rc": 0, "sf": 0.1, "tail": "…", "parsed": None})
    )
    # bench ran during round 11 and persisted its full record
    path = bench._write_round_record(dict(_PARSED), records_dir=str(tmp_path))
    assert path is not None and path.endswith(os.path.join("bench_records", "r11.json"))
    kw = dict(records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.1")
    # the guard now sees round 11's full values, not round 9's stale ones
    assert bench._prev_round_value("value", "", **kw) == 8.711
    assert bench._prev_round_value("q1_pricing_summary", "queries", **kw) == 0.499
    # non-driver SF runs are not round records
    assert bench._write_round_record(dict(_PARSED, sf=0.01), records_dir=str(tmp_path)) is None


def test_round_record_is_immutable_once_written(tmp_path):
    """r13 verdict item 3: the driver's bench run overwrote the committed
    bench_records/r13.json. A round record, once present, must never be
    rewritten — the second run of the same round is a no-op."""
    _write_driver_record(tmp_path, 9, dict(_PARSED, value=99.0))
    first = bench._write_round_record(dict(_PARSED, value=7.5), records_dir=str(tmp_path))
    assert first is not None and first.endswith(os.path.join("bench_records", "r10.json"))
    before = open(first).read()
    # a second run of the same round (e.g. the driver's) must not touch it
    assert bench._write_round_record(dict(_PARSED, value=123.0), records_dir=str(tmp_path)) is None
    assert open(first).read() == before


def test_round_record_preferred_over_truncated_envelope_same_round(tmp_path):
    """Same round number on both sides: the full bench_records copy must
    win over a driver envelope whose parsed is null."""
    _write_driver_record(tmp_path, 7, dict(_PARSED, value=42.0))
    bench._write_round_record(dict(_PARSED, value=7.5), records_dir=str(tmp_path))
    # driver's own r8 envelope lands later, truncated
    (tmp_path / "BENCH_r8.json").write_text(
        json.dumps({"n": 8, "rc": 0, "sf": 0.1, "tail": "", "parsed": None})
    )
    kw = dict(records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.1")
    assert bench._prev_round_value("value", "", **kw) == 7.5


def test_total_10pct_drift_produces_note_against_driver_record(tmp_path):
    _write_driver_record(tmp_path, 10, _PARSED)
    prev_total = bench._prev_round_value(
        "value", "", records_dir=str(tmp_path), sf_dir="/root/testdata/sf0.1"
    )
    note = bench._total_drift_note(10.5, prev_total)  # +20.5% vs 8.711
    assert note is not None and "8.711" in note and "+21%" in note
    assert bench._total_drift_note(9.0, prev_total) is None  # +3.3%: quiet
    assert bench._total_drift_note(10.5, None) is None
