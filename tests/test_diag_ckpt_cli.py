"""Diagnostics (hysteresis sweep, plots, logging), checkpoint/resume, and
CLI smoke tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.diag.hysteresis import loop_openness, plot_loops, sweep_loop
from fetode_tpu.diag.logging import MetricLogger
from fetode_tpu.ops.ferro import FerroConfig, ferro_init
from fetode_tpu.train.checkpoint import BestTracker, CheckpointManager


def test_hysteresis_sweep_shapes(key):
    cfg = FerroConfig(2, 3, 4)
    params = ferro_init(key, cfg)
    fields, resp = sweep_loop(params, cfg, n_points=21)
    assert fields.shape == (42,)
    assert resp.shape == (42, 2, 3, 4)


def test_noisy_sweep_differs_from_clean(key):
    """noise_key draws fresh device noise per field point (the noisy-loop
    visualisers of compare_noise_ecg.py); default stays clean even on a
    noisy config."""
    import jax

    cfg = FerroConfig(1, 2, 3, noise_std=0.3)
    params = ferro_init(key, cfg)
    _, clean = sweep_loop(params, cfg, n_points=15)
    _, clean2 = sweep_loop(params, cfg, n_points=15)
    np.testing.assert_array_equal(clean, clean2)      # deterministic
    _, noisy = sweep_loop(params, cfg, n_points=15,
                          noise_key=jax.random.PRNGKey(7))
    assert np.abs(noisy - clean).max() > 0.01
    # successive field points see DIFFERENT noise draws
    d = noisy - clean
    assert not np.allclose(d[0], d[1])


def test_loop_openness_positive(key):
    cfg = FerroConfig(1, 1, 2)
    params = ferro_init(key, cfg)
    gaps = loop_openness(params, cfg, n_points=31)
    assert gaps.shape == (1, 1, 2)
    assert np.all(gaps > 0), "hysteresis must open a loop"


def test_plot_loops_writes_pngs(key, tmp_path):
    cfg = FerroConfig(1, 2, 2)
    params = ferro_init(key, cfg)
    paths = plot_loops(params, cfg, str(tmp_path), max_panels=3, n_points=11)
    assert len(paths) == 3
    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths)


def test_metric_logger_jsonl(tmp_path):
    log = MetricLogger(str(tmp_path / "m.jsonl"), echo=False)
    log.log(0, loss=1.5, acc=0.5)
    log.log(1, loss=jnp.asarray(0.7))
    recs = log.read()
    assert len(recs) == 2
    assert recs[1]["loss"] == pytest.approx(0.7)


def test_checkpoint_roundtrip(tmp_path, key):
    tree = {"w": jax.random.normal(key, (4, 3)), "step": jnp.asarray(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(1, tree)
    tree2 = jax.tree_util.tree_map(lambda x: x * 2, tree)
    assert mgr.save(2, tree2)
    assert mgr.latest_step() == 2

    restored = mgr.restore(template=tree)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(tree2["w"]), atol=1e-7)
    old = mgr.restore(step=1, template=tree)
    np.testing.assert_allclose(np.asarray(old["w"]), np.asarray(tree["w"]),
                               atol=1e-7)


def test_best_tracker():
    bt = BestTracker("min")
    p1 = {"w": jnp.ones(3)}
    assert bt.update(1.0, p1)
    assert not bt.update(2.0, {"w": jnp.zeros(3)})
    restored = bt.restore(like=p1)
    np.testing.assert_allclose(np.asarray(restored["w"]), 1.0)


def test_config_presets_and_overrides():
    from fetode_tpu.config import make_config

    cfg = make_config("predprey", {"epochs": "50", "lr": "1e-2"})
    assert cfg.epochs == 50 and cfg.lr == 0.01
    with pytest.raises(ValueError):
        make_config("predprey", {"bogus": 1})


def test_cli_predprey_smoke(tmp_path):
    from fetode_tpu.cli import main

    result = main(["predprey", "--out-dir", str(tmp_path),
                   "--epochs", "40", "--epochs-per-call", "20",
                   "--method", "rk4", "--layers", "2,6,2",
                   "--ferro-num-basis", "2"])
    assert "epochs_per_sec" in result
    assert os.path.exists(tmp_path / "result.json")


def test_cli_predprey_pallas_mode(tmp_path):
    """--solver-mode pallas routes training through the whole-solve
    adjoint kernel (interpret mode on CPU)."""
    from fetode_tpu.cli import main

    result = main(["predprey", "--out-dir", str(tmp_path),
                   "--epochs", "2", "--epochs-per-call", "1",
                   "--solver-mode", "pallas", "--max-steps", "48",
                   "--rtol", "1e-4", "--atol", "1e-6",
                   "--layers", "2,4,2", "--ferro-num-basis", "2"])
    assert "epochs_per_sec" in result


def test_cli_predprey_shooting(tmp_path):
    """--shooting-points segments the fit window (34 intervals -> 17
    2-interval segments at P=3) and must train through the CLI."""
    from fetode_tpu.cli import main

    result = main(["predprey", "--out-dir", str(tmp_path),
                   "--epochs", "20", "--epochs-per-call", "10",
                   "--method", "rk4", "--layers", "2,4,2",
                   "--ferro-num-basis", "2", "--shooting-points", "3"])
    assert "epochs_per_sec" in result


def test_cli_symbolic_smoke(tmp_path):
    from fetode_tpu.cli import main

    result = main(["symbolic", "--out-dir", str(tmp_path), "--epochs", "60",
                   "--n-points", "32", "--plots"])
    assert result["final_loss"] < result["initial_loss"]
    assert os.path.exists(tmp_path / "symbolic_trained.npz")
    assert os.path.exists(tmp_path / "hysteresis")


def test_cli_ecg_smoke(tmp_path, monkeypatch):
    from fetode_tpu.cli import main

    # force synthetic data (ignore any real files) for speed
    monkeypatch.setenv("FETODE_DATA_DIR", str(tmp_path))

    result = main(["ecg", "--out-dir", str(tmp_path), "--epochs", "2",
                   "--model", "digital_rnn", "--latent-dim", "8",
                   "--batch-size", "16"])
    assert "best_test_acc" in result


def test_cli_ecg_ferro_plots_emit_hysteresis_pngs(tmp_path, monkeypatch):
    """--plots on a ferro ECG workload must write P-E loop panels with the
    TRAINED device params (the train_ecg.py:673-877 visualiser capability)."""
    from fetode_tpu.cli import main

    monkeypatch.setenv("FETODE_DATA_DIR", str(tmp_path))
    result = main(["ecg", "--out-dir", str(tmp_path), "--epochs", "2",
                   "--model", "fepa_rnn", "--latent-dim", "6",
                   "--num-basis", "2", "--batch-size", "16",
                   "--noise-std", "0.2", "--plots"])
    assert "best_test_acc" in result
    pngs = os.listdir(tmp_path / "hysteresis")
    assert any(p.startswith("cell_input") for p in pngs)
    assert any(p.startswith("head") for p in pngs)
    # noisy run: the noisy-device panels are emitted alongside
    assert any("_noisy" in p for p in pngs)
