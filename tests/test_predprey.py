"""End-to-end predator-prey: data oracle, prediction shapes, and a short
training run whose loss must drop (the reference's empirical verification,
made into an assert)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.predprey import (
    PredPreyNODE,
    PredPreyTask,
    euler_rollout_predict,
    generate_data,
    lotka_volterra_field,
    predict,
    predprey_init,
    trajectory_loss,
)
from fetode_tpu.train.loop import init_state, make_epoch_scanner
from fetode_tpu.train.optim import make_optimizer


def test_data_oracle_vs_scipy():
    from scipy.integrate import odeint as scipy_odeint

    task = PredPreyTask()
    ts, ts_learn, traj = generate_data(task, jnp.float64)
    assert traj.shape == (task.n_t, 2)
    assert ts_learn.shape == (task.n_train,)

    def deriv(s, t):
        x, y = s
        return [task.alpha * x - task.beta * x * y,
                task.delta * x * y - task.gamma * y]

    ref = scipy_odeint(deriv, [task.x0, task.y0], np.asarray(ts),
                       rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(traj), ref, atol=1e-5)


def test_predict_shapes(key):
    spec = PredPreyNODE.kanfet(max_steps=128)
    params = predprey_init(key, spec, jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 9, jnp.float64)
    x0 = jnp.asarray([1.0, 1.0], jnp.float64)
    traj = predict(params, spec, x0, ts)
    assert traj.shape == (9, 2)
    np.testing.assert_allclose(np.asarray(traj[0]), [1.0, 1.0], atol=1e-12)


def test_euler_rollout_shape(key):
    spec = PredPreyNODE.kanfet()
    params = predprey_init(key, spec, jnp.float64)
    x0 = jnp.asarray([[1.0, 1.0]], jnp.float64)
    traj = euler_rollout_predict(params, spec, x0, 34)
    assert traj.shape == (35, 1, 2)


def test_short_training_reduces_loss(key):
    task = PredPreyTask()
    ts, ts_learn, truth = generate_data(task, jnp.float64)
    target = truth[: task.n_train]
    x0 = jnp.asarray([task.x0, task.y0], jnp.float64)

    spec = PredPreyNODE.kanfet(method="rk4", ferro_num_basis=4)
    params = predprey_init(key, spec, jnp.float64)
    tx = make_optimizer(2e-3, kind="adam", params=params)
    state = init_state(params, tx)

    def loss_fn(p, x0_, ts_, tgt):
        return trajectory_loss(p, spec, x0_, ts_, tgt)

    scanner = make_epoch_scanner(loss_fn, tx, 40)
    state, losses = scanner(state, x0, ts_learn, target)
    assert float(losses[-1]) < float(losses[0]) * 0.7, np.asarray(losses)
    assert np.all(np.isfinite(np.asarray(losses)))


def test_vmapped_trajectory_batching(key):
    """The TPU-native upgrade: many initial conditions in one solve."""
    spec = PredPreyNODE.kanfet(method="rk4")
    params = predprey_init(key, spec, jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 11, jnp.float64)
    x0s = jax.random.uniform(key, (8, 2), jnp.float64, 0.5, 2.0)
    trajs = jax.vmap(lambda x0: predict(params, spec, x0, ts))(x0s)
    assert trajs.shape == (8, 11, 2)
    single = predict(params, spec, x0s[2], ts)
    np.testing.assert_allclose(np.asarray(trajs[2]), np.asarray(single),
                               atol=1e-10)


@pytest.mark.slow
def test_driver_reg_val_and_budget_schedule():
    """The upgraded driver knobs: KAN regularization in the loss, held-out
    val-window best selection, and the step-budget ladder (history records
    the active budget; escalation never exceeds spec.max_steps)."""
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    task = PredPreyTask(n_train=12, tf_learn=1.2, tf=2.4, n_t=24)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               max_steps=128)
    run = PredPreyRun(task=task, spec=spec, epochs=40, epochs_per_call=20,
                      reg_lambda=1e-4, val_points=3,
                      step_budget_schedule=True)
    params, hist = train_predprey(run, log=None)
    assert len(hist["val"]) == 2 and np.isfinite(hist["val"]).all()
    assert hist["budget"][0] == 32            # ladder starts at max_steps//4
    assert all(b <= 128 for b in hist["budget"])
    assert hist["train"][-1] < hist["train"][0]


def test_driver_live_grid_refit_converges():
    """Periodic update_grid inside the training loop (grid_update_every)
    must keep training convergent — the refit is function-preserving so
    the loss may not jump at refit boundaries."""
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    task = PredPreyTask(n_train=12, tf_learn=1.2, tf=2.4, n_t=24)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               method="rk4")
    run = PredPreyRun(task=task, spec=spec, epochs=60, epochs_per_call=20,
                      grid_update_every=1, eval_every_call=False)
    params, hist = train_predprey(run, log=None)
    assert np.isfinite(hist["train"]).all()
    assert hist["train"][-1] < hist["train"][0]


@pytest.mark.slow
def test_period_estimate_and_anchor_smoke():
    """_estimate_period must recover the LV period (~3.317) from the train
    window alone; the anchored driver must construct a sorted augmented
    fit grid without error."""
    from fetode_tpu.train.predprey_driver import (PredPreyRun,
                                                  _estimate_period,
                                                  train_predprey)

    t = _estimate_period(PredPreyTask(), jnp.float64)
    assert abs(t - 3.317) < 0.005, t
    # epochs=0: exercises setup (period estimate, grid augmentation,
    # budget scaling) without paying a training compile.
    run = PredPreyRun(epochs=0, phase_anchor_periods=2, cosine_decay=False)
    params, hist = train_predprey(run, log=None)
    assert hist["train"] == []


@pytest.mark.slow
def test_dense_anchor_grid_construction():
    """dense_anchor must spline-upsample the fit window (log-space for
    positive LV targets — reconstruction measured exact to ~6e-4 max) and
    anchor_cycles must add one shifted copy per listed cycle.  epochs=0
    exercises the full grid construction without a training compile."""
    from scipy.interpolate import CubicSpline

    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    run = PredPreyRun(epochs=0, dense_anchor=4, anchor_cycles=(1, 2, 3),
                      cosine_decay=False)
    params, hist = train_predprey(run, log=None)
    assert hist["train"] == []

    # Spline densification reproduces dense ground truth when built on the
    # CONSISTENT time base (the times the targets were actually sampled
    # at, ts[:n_train]).  On the reference-faithful base (ts_learn, a
    # 2.2%-slower clock) the same spline is off by ~0.58 max — the
    # measured root cause of the 0.037 extrapolation floor
    # (benchmarks/run_time_base_probe.py).
    from fetode_tpu.models.predprey import (PredPreyTask, generate_data,
                                            lotka_volterra_field)
    from fetode_tpu.solvers import odeint_dopri5

    task = PredPreyTask()
    ts, ts_learn, truth = generate_data(task, jnp.float64)
    win = np.asarray(truth[: task.n_train], np.float64)
    t_np = np.asarray(ts[: task.n_train], np.float64)
    t_dense = np.linspace(t_np[0], t_np[-1], (task.n_train - 1) * 4 + 1)
    rec = np.exp(CubicSpline(t_np, np.log(win), axis=0)(t_dense))
    dense_truth = odeint_dopri5(lotka_volterra_field(task),
                                jnp.asarray([task.x0, task.y0], jnp.float64),
                                jnp.asarray(t_dense), rtol=1e-12, atol=1e-14,
                                max_steps=4096, mode="while")
    assert float(jnp.max(jnp.abs(rec - dense_truth))) < 2e-3

    # And the skewed reference base really is skewed (regression guard for
    # the probe's finding).
    t_skew = np.asarray(ts_learn, np.float64)
    t_dense_s = np.linspace(t_skew[0], t_skew[-1], (task.n_train - 1) * 4 + 1)
    rec_s = np.exp(CubicSpline(t_skew, np.log(win), axis=0)(t_dense_s))
    truth_s = odeint_dopri5(lotka_volterra_field(task),
                            jnp.asarray([task.x0, task.y0], jnp.float64),
                            jnp.asarray(t_dense_s), rtol=1e-12, atol=1e-14,
                            max_steps=4096, mode="while")
    assert float(jnp.max(jnp.abs(rec_s - truth_s))) > 0.3


@pytest.mark.slow
def test_multiple_shooting_converges():
    """Multiple-shooting training (segments solved in parallel from observed
    values) must reduce loss; eval (full solve from x0) must stay finite."""
    from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

    task = PredPreyTask(n_train=13, tf_learn=1.2, tf=2.4, n_t=26)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 4, 2), ferro_num_basis=2,
                               max_steps=64)
    run = PredPreyRun(task=task, spec=spec, epochs=40, epochs_per_call=20,
                      shooting_points=4)   # 12 intervals -> 4 segments
    params, hist = train_predprey(run, log=None)
    assert hist["train"][-1] < hist["train"][0]
    assert np.isfinite(hist["test"]).all()
