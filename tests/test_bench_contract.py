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
