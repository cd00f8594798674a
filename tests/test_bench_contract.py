"""bench.py driver contract: stage guard + JSON-line shape helpers."""

import importlib
import os


def _load_bench():
    # repo root is on sys.path via pytest.ini pythonpath — no cwd tricks
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
    """The FINAL stdout line must survive the driver's ~2,000-char
    stdout-TAIL capture (rounds 3 AND 4 lost the machine record because
    the line was longer and its head was cut off mid-JSON)."""
    import json

    bench = _load_bench()
    # Realistic worst case: the full bench emits ~25 dispersion rows with
    # long snake_case keys plus ~12 roofline rows.
    dispersion = {
        f"some_long_model_family_row_name_{i}_samples_per_sec":
            {"median": 123456.789, "min": 120000.001, "max": 130000.999}
        for i in range(25)
    }
    roofline = {
        f"some_model_train_scan_row_{i} (per epoch)": {
            "bound": "latency (serial/dispatch dominated: <2% of both "
                     "peaks)", "achieved_gflops": 1.0}
        for i in range(12)
    }
    result = {
        "metric": "predprey KANFET-NODE training throughput (dopri5 "
                  "rtol1e-7, full epoch incl. grad+Adam; in-kernel "
                  "discrete-adjoint path)",
        "value": 683.586, "unit": "epochs/sec", "vs_baseline": 18024.77,
        "extra": {
            "dispersion": dispersion,
            "roofline": roofline,
            "huge_detail": list(range(1000)),
        },
    }
    # Redirect the full-record file into tmp_path.
    (tmp_path / "benchmarks").mkdir()
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    compact = bench._compact_summary(result)
    line = json.dumps(compact, sort_keys=True)
    assert len(line) <= bench._SUMMARY_BUDGET, len(line)
    assert bench._SUMMARY_BUDGET <= 1800
    assert compact["value"] == 683.586
    assert compact["vs_baseline"] == 18024.77
    # medians survive; [min,max] windows live only in the full record
    surviving = next(iter(compact["rows"].values()))
    assert surviving == 123456.789
    assert compact["bound_counts"] == {"latency": 12}
    # full record landed on disk and holds the detail the line drops
    full = json.load(open(tmp_path / "benchmarks" / "bench_last_full.json"))
    assert full["extra"]["huge_detail"][-1] == 999
    assert full["extra"]["dispersion"] == dispersion


def test_compact_summary_real_row_names_fit(tmp_path, monkeypatch):
    """The ACTUAL row-key set from a full bench pass fits WITHOUT
    truncation (if a new row pushes past the budget this fails loudly
    instead of silently dropping rows in the round record)."""
    import json

    bench = _load_bench()
    real_keys = [
        "predprey_pallas_epochs_per_sec",
        "predprey_scan_epochs_per_sec",
        "trajectories_per_sec_per_chip",
        "pallas_whole_solve_traj_per_sec",
        "ecg_ferro_epochs_per_sec",
        "ecg_ferro_pallas_epochs_per_sec",
        "ecg_ferro_bf16state_epochs_per_sec",
        "ecg_logistic_node_pallas_epochs_per_sec",
        "ecg_logistic_node_epochs_per_sec",
        "cond_diffusion_pallas_epochs_per_sec",
        "cond_diffusion_epochs_per_sec",
        "forecast_point_pallas_epochs_per_sec",
        "forecast_point_epochs_per_sec",
        "kuramoto_train_images_per_sec",
        "kuramoto_fwd_images_per_sec",
        "kuramoto_pallas_train_images_per_sec",
        "kuramoto_pallas_fwd_images_per_sec",
        "kuramoto_fused_fwd_images_per_sec",
        "ferro_op_ops_per_sec",
        "diffusion_samples_per_sec",
        "diffusion_scan_samples_per_sec",
        "diffusion_folded10_samples_per_sec",
        "diffusion_folded10_b1024_samples_per_sec",
        "traj_training_traj_epochs_per_sec",
        "traj_training_scan_traj_epochs_per_sec",
        "traj_train_b4096_traj_epochs_per_sec",
        "infer_b65536_traj_per_sec",
    ]
    result = {
        "metric": "predprey KANFET-NODE training throughput (dopri5 "
                  "rtol1e-7, full epoch incl. grad+Adam; in-kernel "
                  "discrete-adjoint path)",
        "value": 683.586, "unit": "epochs/sec", "vs_baseline": 18024.77,
        "extra": {
            "dispersion": {
                k: {"median": 374321.123, "min": 370000.0, "max": 389999.9}
                for k in real_keys},
            "roofline": {f"row_{i} (per epoch)": {"bound": b}
                         for i, b in enumerate(
                             ["latency (x)"] * 8 + ["bandwidth (y)"] * 4)},
        },
    }
    (tmp_path / "benchmarks").mkdir()
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    compact = bench._compact_summary(result)
    line = json.dumps(compact, sort_keys=True)
    assert len(line) <= bench._SUMMARY_BUDGET, len(line)
    assert "rows_truncated" not in compact
    assert set(compact["rows"]) == set(real_keys)
    assert compact["bound_counts"] == {"latency": 8, "bandwidth": 4}


def test_device_watchdog_disarm():
    import time

    bench = _load_bench()
    disarm = bench._device_init_watchdog(0.2)
    disarm()                    # init "completed" — watchdog must not fire
    time.sleep(0.3)             # outlive the timeout to prove no os._exit
