"""Wide-layout whole-solve KANFET kernel ((B, lanes) state, (out, in*K)
ferro params, global step control): forward parity vs the while-mode
solver, gradient direction vs scan autodiff, and multi-layer stacks.

Mirrors tests/test_pallas_adjoint.py shapes so the scan-reference
compiles hit the persistent cache.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.models.predprey import (
    PredPreyNODE,
    PredPreyTask,
    generate_data,
    predprey_init,
    trajectory_loss,
)
from fetode_tpu.models.predprey import predict as pp_predict
from fetode_tpu.ops.pallas_kanfet_wide import make_wide_train_solver

RTOL, ATOL, MAX_STEPS = 1e-4, 1e-6, 64


@pytest.fixture(scope="module")
def setup():
    task = PredPreyTask()
    _, ts_learn, truth = generate_data(task)
    ts = ts_learn[:12].astype(jnp.float32)
    target = truth[:12].astype(jnp.float32)
    spec = PredPreyNODE.kanfet(max_steps=MAX_STEPS)
    params = predprey_init(jax.random.PRNGKey(0), spec)
    x0 = jnp.asarray([[task.x0, task.y0]], jnp.float32)
    solver = make_wide_train_solver(spec.kan, rtol=RTOL, atol=ATOL,
                                    max_steps=MAX_STEPS, interpret=True)
    return spec, params, x0, ts, target, solver


def test_forward_matches_odeint(setup):
    spec, params, x0, ts, _, solver = setup
    wspec = spec._replace(solver_mode="while", rtol=RTOL, atol=ATOL)
    ref = pp_predict(params, wspec, x0[0], ts)
    out = solver(tuple(params), x0, ts)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_gradient_close_to_scan_autodiff(setup):
    """Discrete adjoint on the frozen mesh vs full scan-mode autodiff:
    nearly parallel gradients (the controller chain is dropped)."""
    spec, params, x0, ts, target, solver = setup
    sspec = spec._replace(rtol=RTOL, atol=ATOL)

    def loss_pallas(p):
        pred = solver(p, x0, ts)[0]
        return jnp.mean((pred - target) ** 2)

    g_pal = jax.grad(loss_pallas)(tuple(params))
    g_scan = jax.grad(
        lambda p: trajectory_loss(p, sspec, x0[0], ts, target))(params)
    fp, _ = jax.flatten_util.ravel_pytree(list(g_pal))
    fs, _ = jax.flatten_util.ravel_pytree(g_scan)
    cos = float(jnp.dot(fp, fs) / (jnp.linalg.norm(fp)
                                   * jnp.linalg.norm(fs)))
    assert cos > 0.999, f"cosine vs scan autodiff too low: {cos}"


def test_batched_forward(setup):
    """Multiple initial conditions in one kernel call match per-sample
    while-mode solves."""
    spec, params, _, ts, _, solver = setup
    x0s = jax.random.uniform(jax.random.PRNGKey(5), (3, 2), jnp.float32,
                             0.5, 2.0)
    out = solver(tuple(params), x0s, ts)
    wspec = spec._replace(solver_mode="while", rtol=RTOL, atol=ATOL)
    for b in range(3):
        ref = pp_predict(params, wspec, x0s[b], ts)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)


def test_pallas_mode_dispatch(monkeypatch):
    """predict(solver_mode="pallas") routes narrow stacks to the sublane
    adjoint kernel and stacks with in*out*K >= WIDE_DISPATCH_FERRO_N to
    the wide-layout kernel (threshold measured by
    benchmarks/run_wide_kernel_sweep.py: the wide layout wins from
    N = 512 up and is the only layout that compiles past ~8k)."""
    import fetode_tpu.ops.pallas_adjoint as pa
    import fetode_tpu.ops.pallas_kanfet_wide as pw

    calls = []
    monkeypatch.setattr(
        pa, "pallas_kanfet_solve_train",
        lambda params, cfg, x0s, ts, **kw: calls.append("sublane")
        or jnp.zeros((1, ts.shape[0], x0s.shape[-1])))
    monkeypatch.setattr(
        pw, "pallas_kanfet_wide_solve_train",
        lambda params, cfg, x0s, ts, **kw: calls.append("wide")
        or jnp.zeros((1, ts.shape[0], x0s.shape[-1])))

    ts = jnp.linspace(0.0, 1.0, 4)
    x0 = jnp.asarray([1.0, 1.0], jnp.float32)
    narrow = PredPreyNODE.kanfet(solver_mode="pallas")
    pp_predict(predprey_init(jax.random.PRNGKey(0), narrow), narrow, x0, ts)
    # exactly AT the boundary (2*32*8 = 512 = WIDE_DISPATCH_FERRO_N)
    at = PredPreyNODE.kanfet(layers_hidden=(2, 32, 2), solver_mode="pallas")
    pp_predict(predprey_init(jax.random.PRNGKey(0), at), at, x0, ts)
    wide = PredPreyNODE.kanfet(layers_hidden=(2, 64, 64, 2),
                               solver_mode="pallas")
    pp_predict(predprey_init(jax.random.PRNGKey(0), wide), wide, x0, ts)
    assert calls == ["sublane", "wide", "wide"]


def test_multilayer_stack_trains():
    """A [2, 8, 8, 2] stack (the layout this kernel exists for) runs,
    produces finite grads, and a short Adam loop reduces the loss."""
    import optax

    task = PredPreyTask()
    _, ts_learn, truth = generate_data(task)
    ts = ts_learn[:8].astype(jnp.float32)
    target = truth[:8].astype(jnp.float32)
    spec = PredPreyNODE.kanfet(layers_hidden=(2, 8, 8, 2), max_steps=32)
    params = tuple(predprey_init(jax.random.PRNGKey(1), spec))
    x0 = jnp.asarray([[task.x0, task.y0]], jnp.float32)
    solver = make_wide_train_solver(spec.kan, rtol=1e-3, atol=1e-5,
                                    max_steps=32, interpret=True)

    def loss(p):
        pred = solver(p, x0, ts)[0]
        return jnp.mean((pred - target) ** 2)

    tx = optax.adam(2e-3)
    opt = tx.init(params)
    vg = jax.jit(jax.value_and_grad(loss))
    losses = []
    for _ in range(6):
        lo, g = vg(params)
        losses.append(float(lo))
        fg, _ = jax.flatten_util.ravel_pytree(list(g))
        assert bool(jnp.all(jnp.isfinite(fg)))
        up, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, up)
    assert losses[-1] < losses[0]
