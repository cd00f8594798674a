"""Solver tests: closed-form oracles, convergence order, adaptive accuracy,
gradient checks, vmap/pytree support."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.solvers import integrate_final, odeint, odeint_dopri5, odeint_fixed


def exp_field(t, y):
    return -0.5 * y


def harmonic(t, y):
    # y = (q, p), dq/dt = p, dp/dt = -q
    return jnp.stack([y[1], -y[0]])


def lotka_volterra(t, y, a=1.5, b=1.0, c=3.0, d=1.0):
    x, z = y[0], y[1]
    return jnp.stack([a * x - b * x * z, d * x * z - c * z])


# ---------------------------------------------------------------- fixed-step


@pytest.mark.parametrize("method,order", [
    ("euler", 1), ("midpoint", 2), ("heun", 2), ("rk4", 4),
])
def test_convergence_order(method, order):
    """Measured order on y' = -y/2 must match the method's classical order."""
    y0 = jnp.asarray([1.0], jnp.float64)
    t1 = 2.0
    errs = []
    steps = [16, 32, 64]
    for n in steps:
        ts = jnp.linspace(0.0, t1, n + 1, dtype=jnp.float64)
        traj = odeint_fixed(exp_field, y0, ts, method=method)
        errs.append(float(jnp.abs(traj[-1, 0] - np.exp(-0.5 * t1))))
    rates = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert all(r > order - 0.35 for r in rates), (method, rates, errs)


def test_rk4_harmonic_trajectory():
    ts = jnp.linspace(0.0, 2 * np.pi, 201, dtype=jnp.float64)
    y0 = jnp.asarray([1.0, 0.0], jnp.float64)
    traj = odeint_fixed(harmonic, y0, ts, method="rk4")
    np.testing.assert_allclose(np.asarray(traj[:, 0]), np.cos(np.asarray(ts)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj[-1]), [1.0, 0.0], atol=1e-6)


def test_integrate_final_matches_trajectory():
    y0 = jnp.asarray([1.0, 0.0], jnp.float64)
    ts = jnp.linspace(0.0, 1.0, 9, dtype=jnp.float64)
    traj = odeint_fixed(harmonic, y0, ts, method="rk4")
    yT = integrate_final(harmonic, y0, 0.0, 1.0, method="rk4", n_steps=8)
    np.testing.assert_allclose(np.asarray(yT), np.asarray(traj[-1]), atol=1e-12)


def test_fixed_substeps_improve_accuracy():
    ts = jnp.linspace(0.0, 3.0, 4, dtype=jnp.float64)
    y0 = jnp.asarray([1.0], jnp.float64)
    e1 = abs(float(odeint_fixed(exp_field, y0, ts, method="rk4")[-1, 0])
             - np.exp(-1.5))
    e4 = abs(float(odeint_fixed(exp_field, y0, ts, method="rk4", n_substeps=4)[-1, 0])
             - np.exp(-1.5))
    assert e4 < e1 / 10


def test_pytree_state():
    y0 = {"a": jnp.asarray([1.0], jnp.float64), "b": jnp.asarray([2.0], jnp.float64)}

    def f(t, y):
        return {"a": -y["a"], "b": -2.0 * y["b"]}

    ts = jnp.linspace(0.0, 1.0, 33, dtype=jnp.float64)
    traj = odeint_fixed(f, y0, ts, method="rk4")
    np.testing.assert_allclose(float(traj["a"][-1, 0]), np.exp(-1.0), atol=1e-6)
    np.testing.assert_allclose(float(traj["b"][-1, 0]), 2 * np.exp(-2.0), atol=1e-6)


def test_extra_args_passthrough():
    def f(t, y, rate):
        return rate * y

    ts = jnp.linspace(0.0, 1.0, 17, dtype=jnp.float64)
    traj = odeint_fixed(f, jnp.asarray([1.0], jnp.float64), ts,
                        jnp.asarray(-1.0, jnp.float64), method="rk4")
    np.testing.assert_allclose(float(traj[-1, 0]), np.exp(-1.0), atol=1e-7)


# ------------------------------------------------------------------- dopri5


@pytest.mark.parametrize("mode", ["scan", "while"])
def test_dopri5_exponential(mode):
    ts = jnp.linspace(0.0, 4.0, 11, dtype=jnp.float64)
    y0 = jnp.asarray([1.0], jnp.float64)
    ys, stats = odeint_dopri5(exp_field, y0, ts, rtol=1e-7, atol=1e-9,
                              mode=mode, full_output=True)
    assert bool(stats.success)
    np.testing.assert_allclose(np.asarray(ys[:, 0]),
                               np.exp(-0.5 * np.asarray(ts)), rtol=1e-6)


def test_dopri5_harmonic_dense_output():
    """Interpolated outputs (not only step endpoints) must be accurate."""
    ts = jnp.asarray(np.sort(np.random.default_rng(3).uniform(0, 2 * np.pi, 40)),
                     jnp.float64)
    ts = jnp.concatenate([jnp.zeros(1, jnp.float64), ts])
    y0 = jnp.asarray([1.0, 0.0], jnp.float64)
    ys = odeint_dopri5(harmonic, y0, ts, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ys[:, 0]), np.cos(np.asarray(ts)),
                               atol=1e-6)


def test_dopri5_vs_scipy_lotka_volterra():
    from scipy.integrate import solve_ivp

    ts = np.linspace(0.0, 14.0, 140)
    sol = solve_ivp(lambda t, y: np.asarray(lotka_volterra(t, jnp.asarray(y))),
                    (0, 14), [1.0, 1.0], t_eval=ts, rtol=1e-9, atol=1e-11,
                    method="RK45")
    ys = odeint_dopri5(lotka_volterra, jnp.asarray([1.0, 1.0], jnp.float64),
                       jnp.asarray(ts), rtol=1e-7, atol=1e-9, max_steps=2048)
    np.testing.assert_allclose(np.asarray(ys), sol.y.T, atol=2e-5)


def test_dopri5_adapts_step_count():
    """Tighter tolerance must take more accepted steps."""
    ts = jnp.linspace(0.0, 10.0, 5, dtype=jnp.float64)
    y0 = jnp.asarray([1.0, 1.0], jnp.float64)
    _, loose = odeint_dopri5(lotka_volterra, y0, ts, rtol=1e-3, atol=1e-5,
                             full_output=True)
    _, tight = odeint_dopri5(lotka_volterra, y0, ts, rtol=1e-9, atol=1e-11,
                             max_steps=4096, full_output=True)
    assert int(tight.n_accepted) > int(loose.n_accepted) > 0


def test_dopri5_gradient_matches_analytic():
    """d/d(rate) of y(T) = y0*exp(rate*T) is T*y(T)."""
    T = 1.5

    def loss(rate):
        f = lambda t, y: rate * y
        ts = jnp.asarray([0.0, T], jnp.float64)
        ys = odeint_dopri5(f, jnp.asarray([1.0], jnp.float64), ts,
                           rtol=1e-9, atol=1e-11)
        return ys[-1, 0]

    rate0 = jnp.asarray(-0.7, jnp.float64)
    g = jax.grad(loss)(rate0)
    expected = T * np.exp(-0.7 * T)
    np.testing.assert_allclose(float(g), expected, rtol=1e-6)


def test_fixed_gradient_check():
    def loss(rate):
        f = lambda t, y: rate * y
        ts = jnp.linspace(0.0, 1.0, 33, dtype=jnp.float64)
        return odeint_fixed(f, jnp.asarray([1.0], jnp.float64), ts,
                            method="rk4")[-1, 0]

    from jax.test_util import check_grads
    check_grads(loss, (jnp.asarray(-0.3, jnp.float64),), order=1,
                modes=["rev"], rtol=1e-4)


def test_vmap_over_initial_conditions():
    """Trajectory batching — the TPU-native upgrade over the reference's
    per-sample loops — must be a plain vmap."""
    y0s = jnp.asarray(np.random.default_rng(4).uniform(0.5, 2.0, (8, 2)))
    ts = jnp.linspace(0.0, 3.0, 31, dtype=jnp.float64)

    batched = jax.vmap(
        lambda y0: odeint_fixed(lotka_volterra, y0, ts, method="rk4")
    )(y0s)
    assert batched.shape == (8, 31, 2)

    single = odeint_fixed(lotka_volterra, y0s[3], ts, method="rk4")
    np.testing.assert_allclose(np.asarray(batched[3]), np.asarray(single),
                               atol=1e-10)


def test_unified_odeint_dispatch():
    ts = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float64)
    y0 = jnp.asarray([1.0], jnp.float64)
    a = odeint(exp_field, y0, ts, method="rk4", n_substeps=4)
    b = odeint(exp_field, y0, ts, method="dopri5", rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    with pytest.raises(ValueError):
        odeint(exp_field, y0, ts, method="nope")


def test_dopri5_jit_and_max_steps_reported():
    ts = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float64)
    y0 = jnp.asarray([1.0], jnp.float64)
    fn = jax.jit(lambda y: odeint_dopri5(exp_field, y, ts, max_steps=64,
                                         full_output=True))
    ys, stats = fn(y0)
    assert bool(stats.success)
    assert int(stats.n_accepted) <= 64


# ------------------------------------------------------- unroll / checkpoint


def test_dopri5_unroll_matches_unrolled_reference():
    """Scan-body unroll must not change the integration (same attempt
    sequence, only loop structure differs)."""
    y0 = jnp.asarray([1.0, 0.0])
    ts = jnp.linspace(0.0, 3.0, 9)
    ref = odeint_dopri5(harmonic, y0, ts, max_steps=64, unroll=1)
    for unroll in (2, 4):
        out = odeint_dopri5(harmonic, y0, ts, max_steps=64, unroll=unroll)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-7)
    with pytest.raises(ValueError):
        odeint_dopri5(harmonic, y0, ts, max_steps=64, unroll=3)


@pytest.mark.parametrize("unroll,checkpoint", [(4, True), (1, False)])
def test_dopri5_unroll_checkpoint_gradients(unroll, checkpoint):
    """Gradients through unrolled / non-rematerialised scans match the
    default per-step-checkpoint configuration."""
    y0 = jnp.asarray([1.0, 0.0])
    ts = jnp.linspace(0.0, 2.0, 5)

    def loss(scale, **kw):
        traj = odeint_dopri5(lambda t, y: scale * harmonic(t, y), y0, ts,
                             max_steps=64, **kw)
        return jnp.sum(traj ** 2)

    g_ref = jax.grad(loss)(1.0)
    g = jax.grad(lambda s: loss(s, unroll=unroll, checkpoint=checkpoint))(1.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- auto mode


def test_auto_mode_no_grad_is_while():
    """mode='auto' (the default) must lower a NO-GRAD solve to the
    early-exit while_loop — a no-grad checkpointed scan compiles
    pathologically slowly (measured 4 min vs 2 s on the flagship spec;
    the round-3 cli.py carried per-call-site workarounds for this)."""
    ts = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    y0 = jnp.ones(3, jnp.float32)

    jaxpr = jax.make_jaxpr(lambda y: odeint_dopri5(exp_field, y, ts))(y0)
    prims = {eq.primitive.name for eq in jaxpr.eqns}
    assert "while" in prims
    assert "scan" not in prims

    out_auto = odeint_dopri5(exp_field, y0, ts)
    out_scan = odeint_dopri5(exp_field, y0, ts, mode="scan")
    out_while = odeint_dopri5(exp_field, y0, ts, mode="while")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_while))
    np.testing.assert_allclose(np.asarray(out_auto), np.asarray(out_scan),
                               rtol=1e-6, atol=1e-7)


def test_auto_mode_under_grad_is_scan_and_matches_explicit():
    ts = jnp.linspace(0.0, 1.0, 5, dtype=jnp.float32)
    y0 = jnp.ones(3, jnp.float32)

    jaxpr = jax.make_jaxpr(
        jax.grad(lambda y: odeint_dopri5(exp_field, y, ts).sum()))(y0)
    assert "scan" in {eq.primitive.name for eq in jaxpr.eqns}

    g_auto = jax.grad(lambda y: odeint_dopri5(exp_field, y, ts).sum())(y0)
    g_scan = jax.grad(
        lambda y: odeint_dopri5(exp_field, y, ts, mode="scan").sum())(y0)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_scan),
                               rtol=1e-6, atol=1e-8)


def test_auto_mode_detects_closed_over_params_under_value_and_grad():
    """The repo's training pattern: jit(value_and_grad(loss)) where the
    field closes over the differentiated params."""
    ts = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
    y0 = jnp.ones(2, jnp.float32)

    def loss(p):
        return odeint_dopri5(lambda t, y: -p * y, y0, ts).sum()

    v_auto, g_auto = jax.jit(jax.value_and_grad(loss))(jnp.float32(0.7))
    v_scan, g_scan = jax.jit(jax.value_and_grad(
        lambda p: odeint_dopri5(lambda t, y: -p * y, y0, ts,
                                mode="scan").sum()))(jnp.float32(0.7))
    np.testing.assert_allclose(float(v_auto), float(v_scan), rtol=1e-6)
    np.testing.assert_allclose(float(g_auto), float(g_scan), rtol=1e-5)


def test_auto_mode_blind_spot_fails_loudly():
    """Differentiating across a jit boundary hides the AD tracers from the
    detector; auto then picks 'while', which must FAIL (reverse-mode
    through while_loop is unsupported) rather than silently degrade —
    the documented contract is to pass mode='scan' there."""
    ts = jnp.linspace(0.0, 1.0, 4, dtype=jnp.float32)
    y0 = jnp.ones(2, jnp.float32)

    @jax.jit
    def solve_sum(p):
        return odeint_dopri5(lambda t, y: -p * y, y0, ts).sum()

    with pytest.raises(Exception):
        jax.grad(solve_sum)(jnp.float32(0.7))


def test_bad_mode_rejected():
    ts = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)
    with pytest.raises(ValueError, match="mode"):
        odeint_dopri5(exp_field, jnp.ones(2), ts, mode="scna")
