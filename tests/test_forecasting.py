"""Forecasting family tests: windows/scalers, diffusion math, point and
diffusion forecasters end-to-end on a synthetic series."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.data.timeseries import (
    load_ett_csv,
    make_windows,
    split_time_series,
    standardize_fit,
    synthetic_series,
    window_batches,
)
from fetode_tpu.models.forecasting import (
    DiffusionForecasterSpec,
    LatentODEForecasterSpec,
    diffusion_forecaster_init,
    diffusion_forecaster_loss,
    diffusion_forecaster_sample,
    latent_ode_forecast,
    latent_ode_forecaster_init,
    logistic_linear_apply,
    logistic_linear_init,
)
from fetode_tpu.nn.diffusion import (
    make_schedule,
    p_sample_loop,
    q_sample,
    sinusoidal_emb,
)
from fetode_tpu.train.forecast_driver import (
    ForecastRun,
    train_diffusion_forecaster,
    train_point_forecaster,
)


# ------------------------------------------------------------------ data


def test_windows_shapes_and_alignment():
    X, y = synthetic_series(n=100, n_features=2)
    xc, yf = make_windows(X, y, context_len=10, pred_len=4)
    assert xc.shape == (87, 10, 3) and yf.shape == (87, 4)
    np.testing.assert_allclose(yf[0], y[10:14])
    np.testing.assert_allclose(xc[5], X[5:15])


def test_standardizer_roundtrip():
    X, _ = synthetic_series(n=50)
    s = standardize_fit(X)
    Z = s.apply(X)
    np.testing.assert_allclose(Z.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(s.invert(Z), X, atol=1e-4)


def test_split_chronological():
    tr, va, te = split_time_series(100, 0.7, 0.1)
    assert tr == slice(0, 70) and va == slice(70, 80) and te == slice(80, 100)


@pytest.mark.skipif(not os.path.exists("/root/reference/data/ETT/ETTh1.csv"),
                    reason="ETTh1.csv not available")
def test_real_ett_loads():
    X, y, df = load_ett_csv()
    assert X.shape[1] == 7  # HUFL..OT
    assert len(X) == len(y) > 10000


# ------------------------------------------------------------- diffusion


def test_sinusoidal_emb_shape():
    e = sinusoidal_emb(jnp.arange(6), 16)
    assert e.shape == (6, 16)
    assert np.all(np.isfinite(np.asarray(e)))


def test_q_sample_matches_closed_form(key):
    sched = make_schedule(T=100)
    y0 = jnp.ones((4, 8))
    t_idx = jnp.asarray([0, 10, 50, 99], jnp.int32)
    y_t, eps = q_sample(sched, y0, t_idx, key)
    expect = (sched.sqrt_alphas_bar[t_idx][:, None] * y0
              + sched.sqrt_one_minus_alphas_bar[t_idx][:, None] * eps)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(expect), atol=1e-6)
    # signal coefficient decays monotonically with t
    sab = np.asarray(sched.sqrt_alphas_bar)
    assert np.all(np.diff(sab) < 0)


def test_p_sample_loop_recovers_simple_target(key):
    """With a perfect eps-model oracle for a zero target, sampling must
    contract toward zero."""
    sched = make_schedule(T=50)

    def eps_model(y_t, t_idx, cond):
        # for y0 = 0: y_t = sqrt(1-a_bar)*eps -> eps = y_t / sqrt(1-a_bar)
        c = sched.sqrt_one_minus_alphas_bar[t_idx][:, None]
        return y_t / jnp.maximum(c, 1e-3)

    y = p_sample_loop(sched, eps_model, (8, 6), None, key)
    assert float(jnp.abs(y).mean()) < 0.3


# ---------------------------------------------------------- forecasters


def _tiny_point_spec(F):
    return LatentODEForecasterSpec(num_features=F, context_len=12, pred_len=4,
                                   latent_dim=8, enc_hidden=16, dec_hidden=16,
                                   dyn_hidden=16, solver="rk4", n_substeps=1)


def test_latent_ode_forecaster_shapes(key):
    spec = _tiny_point_spec(3)
    p = latent_ode_forecaster_init(key, spec, jnp.float64)
    x = jax.random.normal(key, (5, 12, 3), jnp.float64)
    y = latent_ode_forecast(p, spec, x)
    assert y.shape == (5, 4)


@pytest.mark.parametrize("encoder", ["mlp", "kan", "kanrnn"])
@pytest.mark.slow
def test_diffusion_forecaster_variants(key, encoder):
    spec = DiffusionForecasterSpec(num_features=3, context_len=12, pred_len=4,
                                   latent_dim=8, enc_hidden=16, dyn_hidden=16,
                                   diff_T=10, diff_hidden=32, encoder=encoder,
                                   rnn_hidden=8, num_basis=3,
                                   solver="rk4", n_substeps=1)
    p = diffusion_forecaster_init(key, spec, jnp.float64)
    sched = make_schedule(10, dtype=jnp.float64)
    x = jax.random.normal(key, (4, 12, 3), jnp.float64)
    y = jax.random.normal(key, (4, 4), jnp.float64)

    loss = diffusion_forecaster_loss(p, spec, sched, x, y, key)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda p: diffusion_forecaster_loss(p, spec, sched, x, y,
                                                     key))(p)
    flat = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in flat)

    samples = diffusion_forecaster_sample(p, spec, sched, x, key, n_samples=2)
    assert samples.shape == (2, 4, 4)


def test_point_training_reduces_val_mse():
    X, y = synthetic_series(n=220, n_features=2)
    spec = _tiny_point_spec(X.shape[1])
    run = ForecastRun(context_len=12, pred_len=4, batch_size=16, epochs=8,
                      log_every=100)
    params, hist = train_point_forecaster(spec, X, y, run, log=None)
    assert hist["val"][-1] < hist["val"][0]
    assert np.isfinite(hist["test_mse"])
    assert hist["final_forecast"].shape == (4,)


def test_diffusion_training_runs():
    X, y = synthetic_series(n=200, n_features=2)
    spec = DiffusionForecasterSpec(num_features=X.shape[1], context_len=12,
                                   pred_len=4, latent_dim=8, enc_hidden=16,
                                   dyn_hidden=16, diff_T=10, diff_hidden=32,
                                   encoder="mlp", solver="rk4", n_substeps=1)
    run = ForecastRun(context_len=12, pred_len=4, batch_size=16, epochs=3,
                      eval_samples=2, log_every=100)
    params, hist = train_diffusion_forecaster(spec, X, y, run, log=None)
    assert np.isfinite(hist["test_mse"])
    assert len(hist["train"]) == 3


def test_logistic_linear(key):
    p = logistic_linear_init(key, 4, 3, 5, jnp.float64)
    y = logistic_linear_apply(p, jax.random.normal(key, (7, 4), jnp.float64))
    assert y.shape == (7, 3)


def test_p_sample_loop_unroll_parity():
    """Scan unroll is a scheduling knob: same keys -> same samples."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sched = make_schedule(20)

    def eps_model(y_t, t_idx, cond):
        return 0.1 * y_t

    key = jax.random.PRNGKey(7)
    ref = p_sample_loop(sched, eps_model, (4, 6), None, key, unroll=1)
    for unroll in (3, 4):
        out = p_sample_loop(sched, eps_model, (4, 6), None, key,
                            unroll=unroll)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)


def test_point_training_pallas_mode_with_eval_downgrade():
    """Driver-level pallas routing: training uses the whole-solve kernel
    (ops/pallas_ode_dyn.py) while eval/final-forecast run while-mode
    dopri5 (the driver downgrade — eval chunks don't fit the kernel's
    VMEM adjoint records).  Interpret mode on CPU."""
    X, y = synthetic_series(n=160, n_features=2)
    spec = LatentODEForecasterSpec(
        num_features=X.shape[1], context_len=12, pred_len=4, latent_dim=8,
        enc_hidden=16, dec_hidden=16, dyn_hidden=16, rtol=1e-3, atol=1e-4,
        max_steps=16, solver_mode="pallas")
    run = ForecastRun(context_len=12, pred_len=4, batch_size=16, epochs=3,
                      log_every=100)
    params, hist = train_point_forecaster(spec, X, y, run, log=None)
    assert np.isfinite(hist["test_mse"])
    assert hist["final_forecast"].shape == (4,)
    assert len(hist["train"]) == 3
