"""Pin the bench.py stdout contract: the single JSON line must fit the
driver's 2,000-byte stdout-tail window at ANY registry size.

Rounds 2 and 4 both recorded ``parsed: null`` because the line's head
fell outside the window once the per-query map grew.  These tests
serialize the line at the LIVE registry size with worst-case timing
widths, so adding queries can never silently break the contract again.

No SparkSession is needed — only the registry's key set and the pure
serialization helper are exercised.
"""

import json

import bench
import __spark_entry__ as entry_mod

DRIVER_TAIL_WINDOW = 2000


def _line_for(names, timing):
    timings = {n: timing for n in names}
    return bench.build_stdout_line(9999.9999, 0.1, timings, 99)


def test_line_fits_window_at_live_registry_size():
    names = sorted(entry_mod.queries())
    # Worst-case width: every query takes hundreds of seconds (6 chars
    # per value after round(.., 2)).
    line = _line_for(names, 999.99)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    assert len(line) < DRIVER_TAIL_WINDOW
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_wall_time"
    assert parsed["value"] == 9999.9999
    assert parsed["n_queries"] == len(names)


def test_line_fits_window_even_at_10x_registry_size():
    # A registry 10x today's size must STILL emit a bounded, parseable
    # line — the truncation path kicks in and keeps the slowest queries.
    names = [f"q_future_operator_with_a_long_name_{i:04d}" for i in range(770)]
    line = _line_for(names, 123.45)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries_truncated"] is True
    assert parsed["n_queries"] == 770
    assert 0 < len(parsed["queries"]) < 770


def test_truncation_keeps_slowest_queries():
    timings = {f"q{i:03d}": float(i % 97) for i in range(500)}
    line = bench.build_stdout_line(42.0, 0.1, timings, 0)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert parsed["queries_truncated"] is True
    # Every kept value must be >= every dropped value.
    dropped_max = max(
        round(v, 2) for k, v in timings.items() if k not in kept
    )
    assert min(kept.values()) >= dropped_max


def test_small_registry_line_is_untruncated():
    timings = {"q01": 1.2345, "q02": 0.5}
    line = bench.build_stdout_line(1.73, 0.01, timings, 0)
    parsed = json.loads(line)
    assert "queries_truncated" not in parsed
    assert parsed["queries"] == {"q01": 1.23, "q02": 0.5}
