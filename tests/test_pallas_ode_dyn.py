"""Whole-solve trajectory kernel for the forecasting latent field
(ops/pallas_ode_dyn.py) must match the XLA dopri5 path of
``ode_dynamics_apply`` — dense-output trajectory, parameter gradients and
the z0 cotangent — in interpret mode, and plug into the forecaster
models via ``solver_mode='pallas'``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.forecasting import (
    LatentODEForecasterSpec,
    ODEDynamicsConfig,
    latent_ode_forecast,
    latent_ode_forecaster_init,
    ode_dynamics_apply,
    ode_dynamics_init,
)
from fetode_tpu.ops.pallas_ode_dyn import pallas_ode_dyn_solve
from fetode_tpu.solvers.dopri5 import odeint_dopri5

RTOL, ATOL, MAX_STEPS = 1e-3, 1e-4, 32


@pytest.fixture(scope="module")
def setup():
    cfg = ODEDynamicsConfig(latent_dim=8, hidden=16)
    params = ode_dynamics_init(jax.random.PRNGKey(0), cfg)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (5, cfg.latent_dim),
                           dtype=jnp.float32)
    ts = jnp.arange(6, dtype=jnp.float32)
    return cfg, params, z0, ts


def _xla_solve(params, cfg, z0, ts, mode="while"):
    return odeint_dopri5(lambda t, z: ode_dynamics_apply(params, cfg, t, z),
                         z0, ts, rtol=RTOL, atol=ATOL, max_steps=MAX_STEPS,
                         mode=mode)


def test_trajectory_matches_xla(setup):
    cfg, params, z0, ts = setup
    ref = _xla_solve(params, cfg, z0, ts)
    out = pallas_ode_dyn_solve(params, cfg, z0, ts, rtol=RTOL, atol=ATOL,
                               max_steps=MAX_STEPS)
    assert out.shape == (ts.shape[0], z0.shape[0], cfg.latent_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # index 0 is exactly z0 (the head output at t=ts[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(z0),
                               rtol=0, atol=0)


def test_grads_match_scan_autodiff(setup):
    cfg, params, z0, ts = setup
    tgt = jax.random.normal(jax.random.PRNGKey(2),
                            (ts.shape[0], z0.shape[0], cfg.latent_dim),
                            dtype=jnp.float32)

    def loss_kernel(p, z):
        out = pallas_ode_dyn_solve(p, cfg, z, ts, rtol=RTOL, atol=ATOL,
                                   max_steps=MAX_STEPS)
        return jnp.mean((out - tgt) ** 2)

    def loss_scan(p, z):
        return jnp.mean((_xla_solve(p, cfg, z, ts, mode="scan") - tgt) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(params, z0)
    gs = jax.grad(loss_scan, argnums=(0, 1))(params, z0)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gs)):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
        # discrete adjoint on the frozen mesh vs full autodiff (which also
        # differentiates the step controller): estimator closeness
        assert cos > 0.999, cos
        np.testing.assert_allclose(a, b, rtol=0.02, atol=5e-5)


def test_unreached_tail_holds_last_state(setup):
    cfg, params, z0, ts = setup
    out = pallas_ode_dyn_solve(params, cfg, z0, ts, rtol=RTOL, atol=ATOL,
                               max_steps=2)
    # budget exhausted early: late outputs identical (frontier state)
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(out[-2]))
    g = jax.grad(lambda p: jnp.sum(pallas_ode_dyn_solve(
        p, cfg, z0, ts, rtol=RTOL, atol=ATOL, max_steps=2) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_forecaster_routing_matches_scan():
    spec = LatentODEForecasterSpec(num_features=3, context_len=12,
                                   pred_len=4, latent_dim=8, enc_hidden=16,
                                   dec_hidden=16, dyn_hidden=16,
                                   rtol=RTOL, atol=ATOL, max_steps=MAX_STEPS)
    params = latent_ode_forecaster_init(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 12, 3))
    y_scan = latent_ode_forecast(params, spec, x)
    y_pallas = latent_ode_forecast(
        params, spec._replace(solver_mode="pallas"), x)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_scan),
                               rtol=1e-5, atol=1e-5)
