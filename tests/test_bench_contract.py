"""bench.py driver contract: stage guard + JSON-line shape helpers."""

import importlib
import os
import sys


def _load_bench():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    return importlib.reload(bench)


def test_stage_runs_then_skips(monkeypatch):
    bench = _load_bench()
    # fresh start: stage runs
    monkeypatch.setattr(bench, "_T0", bench.time.perf_counter())
    assert bench._stage("x", lambda: 41 + 1) == 42
    # past deadline: stage skipped, returns None (JSON line still printable)
    monkeypatch.setattr(bench, "_DEADLINE_S", -1.0)
    assert bench._stage("x", lambda: 1 / 0) is None


def test_round_helper_handles_none():
    bench = _load_bench()
    assert bench._round(None, 2) is None
    assert bench._round(1.234, 2) == 1.23


def test_compact_summary_is_small_and_self_describing(tmp_path, monkeypatch):
    """The FINAL stdout line must parse standalone (the driver keeps only
    the stdout tail; round 3's giant single JSON lost its head and the
    machine record read null)."""
    import json

    bench = _load_bench()
    result = {
        "metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 2.0,
        "extra": {
            "dispersion": {"row_a": {"median": 5.0, "min": 4.0, "max": 6.0}},
            "roofline": {"row_a (per epoch)": {
                "bound": "latency (serial/dispatch dominated: <2% of both "
                         "peaks)", "achieved_gflops": 1.0}},
            "huge_detail": list(range(1000)),
        },
    }
    # Redirect the full-record file into tmp_path.
    (tmp_path / "benchmarks").mkdir()
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    compact = bench._compact_summary(result)
    line = json.dumps(compact)
    assert len(line) < 20_000
    assert compact["value"] == 1.0 and compact["vs_baseline"] == 2.0
    assert compact["rows"]["row_a"] == {"median": 5.0, "min": 4.0, "max": 6.0}
    assert compact["roofline_bound"]["row_a (per epoch)"] == "latency"
    # full record landed on disk and holds the detail the line drops
    full = json.load(open(tmp_path / "benchmarks" / "bench_last_full.json"))
    assert full["extra"]["huge_detail"][-1] == 999


def test_device_watchdog_disarm():
    import time

    bench = _load_bench()
    disarm = bench._device_init_watchdog(0.2)
    disarm()                    # init "completed" — watchdog must not fire
    time.sleep(0.3)             # outlive the timeout to prove no os._exit
