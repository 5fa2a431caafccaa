"""Pins the bench output contract that round 4 lost: the driver tail-
captures stdout, so the LAST line must stay far under the capture
window no matter how many headline queries exist, while the committed
bench_queries.json carries the full per-query map."""

from __future__ import annotations

import json

import bench


def _fake_times(n: int) -> dict[str, float]:
    # worst-case realistic widths: long ids, 3-decimal times, failures
    times = {f"operator_with_a_long_name_{i:04d}": round(i * 0.123, 3) for i in range(n)}
    times["stream_sessionize_state"] = 8.921
    times["a_failed_query"] = -1.0
    return times


def test_compact_line_stays_under_tail_budget():
    line = bench.compact_line(_fake_times(500), 0.1)
    assert len(line.encode()) < 2048, len(line)
    assert "\n" not in line


def test_compact_line_parses_and_reports_failures():
    d = json.loads(bench.compact_line(_fake_times(300), 0.1))
    assert d["metric"] == "headline_total"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.1
    assert d["n_queries"] == 302
    assert d["n_failed"] == 1
    assert d["failed"] == ["a_failed_query"]
    assert len(d["queries"]) == 12  # slowest only
    assert d["queries_file"] == "bench_queries.json"
    # failed queries (-1 sentinel) must not drag the total down
    assert d["value"] == round(sum(v for v in _fake_times(300).values() if v >= 0), 3)


def test_full_record_round_trips_every_query():
    times = _fake_times(242)
    rec = bench.full_record(times, 0.1)
    assert rec["queries"] == times
    assert rec["n_queries"] == len(times)
    assert rec["value"] == json.loads(bench.compact_line(times, 0.1))["value"]


def _fake_calib() -> dict[str, float]:
    return {q: round(a * 1.4, 3) for q, a in bench.CALIBRATION_ANCHORS.items()}


def test_compact_line_with_calibration_stays_under_tail_budget():
    line = bench.compact_line(_fake_times(500), 0.1, _fake_calib())
    assert len(line.encode()) < 2048, len(line)
    assert "\n" not in line


def test_calibration_fields_round_trip_and_drift_is_median_ratio():
    calib = _fake_calib()
    d = json.loads(bench.compact_line(_fake_times(300), 0.1, calib))
    assert d["calib"] == calib
    assert d["calib_anchors"] == bench.CALIBRATION_ANCHORS
    # every probe at exactly 1.4x its anchor -> drift 1.4 (rounding of
    # the probe values introduces <1% slack)
    assert abs(d["drift"] - 1.4) < 0.02
    rec = bench.full_record(_fake_times(300), 0.1, calib)
    assert rec["calib"] == calib and abs(rec["drift"] - 1.4) < 0.02


def test_drift_ignores_failed_probes_and_survives_total_failure():
    calib = _fake_calib()
    first = next(iter(calib))
    calib[first] = -1.0
    d = bench.drift_factor(calib)
    assert d is not None and abs(d - 1.4) < 0.02
    assert bench.drift_factor({q: -1.0 for q in calib}) is None
    assert bench.drift_factor(None) is None
    # legacy callers without calib keep the old line shape
    d0 = json.loads(bench.compact_line(_fake_times(10), 0.1))
    assert "calib" not in d0 and "drift" not in d0


def test_calibration_probes_are_registered_headline_queries():
    # a probe id that falls out of HEADLINE (or the registry) would
    # silently break the drift artifact
    for q in bench.CALIBRATION_ANCHORS:
        assert q in bench.HEADLINE
    from census_postgres_py_spark import registry

    qs = registry.all_queries()
    for q in bench.CALIBRATION_ANCHORS:
        assert q in qs
