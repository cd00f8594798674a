"""Continuous-adjoint gradients vs analytic and vs backprop-through-scan."""

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.solvers.adjoint import odeint_adjoint
from fetode_tpu.solvers import odeint_dopri5


def test_adjoint_forward_matches_direct():
    ts = jnp.linspace(0.0, 2.0, 9, jnp.float64)
    y0 = jnp.asarray([1.0, 0.5], jnp.float64)

    def f(t, y, rate):
        return rate * y

    rate = jnp.asarray(-0.4, jnp.float64)
    ys_adj = odeint_adjoint(f, y0, ts, rate, rtol=1e-9, atol=1e-11)
    ys_dir = odeint_dopri5(lambda t, y: f(t, y, rate), y0, ts,
                           rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(ys_adj), np.asarray(ys_dir),
                               atol=1e-9)


def test_adjoint_param_gradient_analytic():
    """dL/drate of y(T) = y0 e^{rate T} is T y(T)."""
    T = 1.2

    def loss(rate):
        def f(t, y, r):
            return r * y
        ts = jnp.asarray([0.0, T], jnp.float64)
        ys = odeint_adjoint(f, jnp.asarray([1.0], jnp.float64), ts, rate,
                            rtol=1e-10, atol=1e-12)
        return ys[-1, 0]

    g = jax.grad(loss)(jnp.asarray(-0.6, jnp.float64))
    np.testing.assert_allclose(float(g), T * np.exp(-0.6 * T), rtol=1e-6)


def test_adjoint_y0_gradient_matches_scan_backprop():
    def f(t, y):
        return jnp.stack([y[1], -jnp.sin(y[0])])  # pendulum

    ts = jnp.linspace(0.0, 1.5, 4, jnp.float64)
    y0 = jnp.asarray([0.8, 0.1], jnp.float64)

    def loss_adj(y0):
        ys = odeint_adjoint(f, y0, ts, rtol=1e-10, atol=1e-12)
        return jnp.sum(ys[-1] ** 2)

    def loss_scan(y0):
        ys = odeint_dopri5(f, y0, ts, rtol=1e-10, atol=1e-12)
        return jnp.sum(ys[-1] ** 2)

    g_adj = jax.grad(loss_adj)(y0)
    g_scan = jax.grad(loss_scan)(y0)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_scan),
                               rtol=1e-5)


def test_adjoint_trajectory_cotangents():
    """Gradients flowing from EVERY output point (not just the last)."""
    def f(t, y, k):
        return -k * y

    ts = jnp.linspace(0.0, 2.0, 6, jnp.float64)

    def loss(k):
        ys = odeint_adjoint(f, jnp.asarray([1.0], jnp.float64), ts, k,
                            rtol=1e-10, atol=1e-12)
        return jnp.sum(ys ** 2)

    k0 = jnp.asarray(0.9, jnp.float64)
    g = jax.grad(loss)(k0)
    # analytic: d/dk sum_i e^{-2 k t_i} = sum_i -2 t_i e^{-2 k t_i}
    t = np.asarray(ts)
    expect = np.sum(-2 * t * np.exp(-2 * 0.9 * t))
    np.testing.assert_allclose(float(g), expect, rtol=1e-5)
