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


def test_roofline_xla_cost_and_classification():
    """Roofline accounting (VERDICT r2 item 2): XLA-counted FLOPs/bytes and
    the compute/bandwidth/latency classification against published chip
    peaks."""
    import types

    from fetode_tpu.diag.roofline import roofline_row, xla_cost

    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((64, 64), jnp.float32)
    c = xla_cost(f, x, x)
    assert c["flops"] >= 0.9 * 2 * 64 ** 3      # ~2*M*N*K
    assert c["bytes"] > 0

    v5e = types.SimpleNamespace(device_kind="TPU v5 lite")
    r = roofline_row(1e9, 1e3, 150_000, device=v5e)   # 150 TFLOP/s, hot MXU
    assert r["bound"] == "compute" and r["pct_peak_flops"] > 50
    r = roofline_row(1e3, 1e9, 500, device=v5e)       # 500 GB/s streaming
    assert r["bound"] == "bandwidth" and r["pct_peak_hbm"] > 50
    r = roofline_row(1e6, 1e6, 10, device=v5e)        # tiny serial solve
    assert r["bound"].startswith("latency")
    r = roofline_row(1e6, 1e6, 10)                    # CPU: no peak table
    assert "unknown" in r["bound"]


def test_predprey_ckpt_kill_restart(tmp_path):
    """Durable checkpoint/resume (VERDICT r2 item 4): a run killed mid-way
    and resumed from its latest orbax checkpoint continues the EXACT loss
    curve of an unbroken run — full-batch Adam is deterministic and
    state.step carries the cosine schedule.  (The reference's persistence
    is a dead `load_ckpt` call, predator_prey.py:123-124.)"""
    from fetode_tpu.models.predprey import PredPreyNODE, PredPreyTask
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    task = PredPreyTask(n_train=12, tf_learn=1.2, tf=2.4, n_t=24)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               method="rk4")
    kw = dict(task=task, spec=spec, epochs=40, epochs_per_call=10,
              eval_every_call=False)

    _, h_ref = train_predprey(PredPreyRun(**kw), log=None)

    ck = str(tmp_path / "ckpt")
    calls = {"n": 0}

    def killer(msg):
        calls["n"] += 1
        if calls["n"] >= 2:                  # after 20 epochs (ckpt saved)
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        train_predprey(PredPreyRun(**kw, ckpt_dir=ck, ckpt_every=10),
                       log=killer)

    logs = []
    _, h_res = train_predprey(
        PredPreyRun(**kw, ckpt_dir=ck, ckpt_every=10, resume=True),
        log=logs.append)
    assert any("[ckpt] resumed at epoch 20" in m for m in logs)
    assert h_res["epoch"] == [30, 40]
    np.testing.assert_allclose(h_res["train"], h_ref["train"][2:],
                               rtol=1e-7)


def test_cond_diffusion_ckpt_kill_restart(tmp_path, rng):
    """DurableLoop generalizes exact resume beyond the flagship: the
    conditional-diffusion trainer (stateful PRNG key chain rides the
    checkpoint) killed mid-run and resumed continues the EXACT loss
    curve of an unbroken run."""
    from fetode_tpu.models.cond_diffusion import make_denoiser_spec
    from fetode_tpu.train.cond_diffusion_driver import (
        CondDiffusionRun, train_conditional_diffusion)

    def windows(n):
        return (rng.normal(size=(n, 12, 3)).astype(np.float32),
                rng.normal(size=(n, 4, 3)).astype(np.float32))

    data = {"train": windows(32), "val": windows(16), "test": windows(16)}
    spec = make_denoiser_spec("mlp", d_in=3, pred_len=4, seq_len=12,
                              cond_dim=16, time_dim=16, hidden=32)
    kw = dict(seq_len=12, pred_len=4, diff_T=8, epochs=6, batch_size=16,
              log_every=1)

    _, h_ref = train_conditional_diffusion(spec, data,
                                           CondDiffusionRun(**kw), log=None)

    ck = str(tmp_path / "ck")
    calls = {"n": 0}

    def killer(msg):
        calls["n"] += 1
        if calls["n"] >= 4:                     # after epoch 3 (ckpt at 2)
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        train_conditional_diffusion(
            spec, data, CondDiffusionRun(**kw, ckpt_dir=ck, ckpt_every=2),
            log=killer)

    logs = []
    _, h_res = train_conditional_diffusion(
        spec, data, CondDiffusionRun(**kw, ckpt_dir=ck, ckpt_every=2,
                                     resume=True),
        log=logs.append)
    assert any("[ckpt] resumed at epoch" in m for m in logs)
    n_res = len(h_res["train"])
    np.testing.assert_allclose(h_res["train"], h_ref["train"][-n_res:],
                               rtol=1e-6)
    np.testing.assert_allclose(h_res["val"], h_ref["val"][-n_res:],
                               rtol=1e-6)


@pytest.mark.slow
def test_ecg_and_forecast_ckpt_resume(tmp_path, rng):
    """ECG (stateless per-epoch keys) and point-forecast trainers resume
    the exact curve via the same DurableLoop payload."""
    from fetode_tpu.models import ecg as M
    from fetode_tpu.models.forecasting import LatentODEForecasterSpec
    from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model
    from fetode_tpu.train.forecast_driver import (ForecastRun,
                                                  train_point_forecaster)

    x_tr = rng.normal(size=(16, 12)).astype(np.float32)
    y_tr = (rng.random(16) > 0.5).astype(np.int32)
    data = (x_tr, y_tr, x_tr[:8], y_tr[:8])
    spec = M.KanFetMLPNODESpec(T=12, latent_dim=8, ode_hidden=8,
                               num_basis=2, max_steps=8)
    init_fn = lambda k: M.kanfet_mlp_node_init(k, spec)
    apply_fn = lambda p, x, key: M.kanfet_mlp_node_apply(p, spec, x)
    kw = dict(epochs=4, batch_size=8, log_every=100)
    _, h_ref = train_ecg_model(init_fn, apply_fn, data, ECGRun(**kw),
                               log=None)
    ck = str(tmp_path / "ecg")
    _, _ = train_ecg_model(init_fn, apply_fn, data,
                           ECGRun(**dict(kw, epochs=2), ckpt_dir=ck,
                                  ckpt_every=2), log=None)
    _, h_res = train_ecg_model(init_fn, apply_fn, data,
                               ECGRun(**kw, ckpt_dir=ck, ckpt_every=2,
                                      resume=True), log=None)
    np.testing.assert_allclose(h_res["loss"], h_ref["loss"][2:], rtol=1e-6)

    X = rng.normal(size=(200, 3)).astype(np.float32)
    y = rng.normal(size=200).astype(np.float32)
    fspec = LatentODEForecasterSpec(num_features=3, context_len=12,
                                    pred_len=4, latent_dim=8)
    fkw = dict(context_len=12, pred_len=4, batch_size=16, epochs=4,
               log_every=100)
    _, f_ref = train_point_forecaster(fspec, X, y, ForecastRun(**fkw),
                                      log=None)
    fck = str(tmp_path / "fc")
    train_point_forecaster(fspec, X, y,
                           ForecastRun(**dict(fkw, epochs=2), ckpt_dir=fck,
                                       ckpt_every=2), log=None)
    _, f_res = train_point_forecaster(
        fspec, X, y, ForecastRun(**fkw, ckpt_dir=fck, ckpt_every=2,
                                 resume=True), log=None)
    np.testing.assert_allclose(f_res["train"], f_ref["train"][2:], rtol=1e-6)
    np.testing.assert_allclose(f_res["test_mse"], f_ref["test_mse"],
                               rtol=1e-5)


def test_cli_predprey_resume_flags(tmp_path):
    """--ckpt-dir/--ckpt-every/--resume ride the typed-override CLI."""
    from fetode_tpu.cli import main

    ck = str(tmp_path / "ckpt")
    args = ["predprey", "--out-dir", str(tmp_path),
            "--epochs-per-call", "10",
            "--method", "rk4", "--layers", "2,4,2",
            "--ferro-num-basis", "2",
            "--ckpt-dir", ck, "--ckpt-every", "10"]
    main(args + ["--epochs", "20"])
    assert os.path.exists(ck)
    result = main(args + ["--epochs", "40", "--resume"])
    assert "epochs_per_sec" in result


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


@pytest.mark.slow
def test_cli_ecg_all_models_comparison(tmp_path, monkeypatch):
    """`ecg --model all --plots` trains the reference comparison set (+ a
    noisy ferro variant) in one invocation and emits the multi-model chart
    and accuracy table (train_ecg.py:1418-1463, compare_noise_ecg.py:
    1250-1452) — VERDICT r2 item 5."""
    from fetode_tpu.cli import main

    monkeypatch.setenv("FETODE_DATA_DIR", str(tmp_path))
    result = main(["ecg", "--out-dir", str(tmp_path), "--plots",
                   "--epochs", "2", "--model", "all", "--latent-dim", "8",
                   "--num-basis", "2", "--batch-size", "16"])
    table = result["best_test_acc"]
    assert set(table) == {"digital_rnn", "fepa_rnn", "kanfet_node",
                          "kanfet_mlp_node", "kanfet_mlp_node_noisy"}
    assert os.path.exists(tmp_path / "model_comparison.png")
    assert os.path.exists(tmp_path / "accuracy_table.json")
    # clean + noisy hysteresis panels for the noisy ferro variant
    noisy_dir = tmp_path / "kanfet_mlp_node_noisy" / "hysteresis"
    pngs = os.listdir(noisy_dir)
    assert any("noisy" in p for p in pngs)
    assert any("noisy" not in p for p in pngs)


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
