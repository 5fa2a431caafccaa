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


def _fake_retimes(n: int = 8) -> dict[str, list[float]]:
    return {
        f"operator_with_a_long_name_{i:04d}": [round(9.1 + i, 3), 1.234]
        for i in range(n)
    }


def test_retimes_ride_the_line_without_breaking_the_budget():
    line = bench.compact_line(
        _fake_times(500), 0.1, _fake_calib(), retimes=_fake_retimes()
    )
    assert len(line.encode()) < 2048, len(line)
    d = json.loads(line)
    assert d["retimes"] == _fake_retimes()
    # additions-only: headline total and query map unchanged by retimes
    assert d["value"] == json.loads(bench.compact_line(_fake_times(500), 0.1))["value"]
    rec = bench.full_record(
        _fake_times(300), 0.1, _fake_calib(), retimes=_fake_retimes()
    )
    assert rec["retimes"] == _fake_retimes()
    # empty retimes keeps the legacy shape
    d0 = json.loads(bench.compact_line(_fake_times(10), 0.1, retimes={}))
    assert "retimes" not in d0


def test_collect_retimes_picks_only_stalled_queries_and_caps():
    times = {f"q{i}": 2.0 for i in range(20)}
    times["fine"] = 1.5          # 1.5x prev: not a stall
    times["stalled"] = 9.0       # 9x prev
    times["tiny_blip"] = 0.45    # 5x prev but under the absolute floor
    times["no_history"] = 8.0    # no committed value: skip
    prev = {q: 2.0 for q in times}
    prev["fine"] = 1.0
    prev["stalled"] = 1.0
    prev["tiny_blip"] = 0.09
    del prev["no_history"]
    calls = []

    def fake_run(q):
        calls.append(q)
        return 1.111

    out = bench.collect_retimes(fake_run, times, prev)
    assert out == {"stalled": [9.0, 1.111]} and calls == ["stalled"]
    # cap: 20 stalled queries -> only the slowest RETIME_MAX re-run
    times2 = {f"s{i:02d}": 10.0 + i for i in range(20)}
    out2 = bench.collect_retimes(fake_run, times2, {q: 1.0 for q in times2})
    assert len(out2) == bench.RETIME_MAX
    assert set(out2) == {f"s{i:02d}" for i in range(12, 20)}
    # no committed map (first run / off-sf): nothing re-runs
    assert bench.collect_retimes(fake_run, times, {}) == {}
