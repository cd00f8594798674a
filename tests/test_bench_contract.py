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


def test_device_watchdog_disarm():
    import time

    bench = _load_bench()
    disarm = bench._device_init_watchdog(0.2)
    disarm()                    # init "completed" — watchdog must not fire
    time.sleep(0.3)             # outlive the timeout to prove no os._exit
