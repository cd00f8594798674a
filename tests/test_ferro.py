"""Ferroelectric-basis tests: hysteresis loop opening, branch state machine,
statefulness-as-pytree (vmap legality), noise semantics, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.ops import (
    FerroConfig,
    ferro_apply,
    ferro_basis,
    ferro_init,
    ferro_state_init,
)


def _cfg(**kw):
    base = dict(in_dim=1, out_dim=1, num_basis=1)
    base.update(kw)
    return FerroConfig(**base)


def _sweep(params, cfg, fields):
    """Drive the basis through a field sequence, returning basis values."""
    state = ferro_state_init((1,), cfg, dtype=jnp.float64)
    out = []
    for e in fields:
        x = jnp.asarray([[e]], jnp.float64)
        b, state = ferro_basis(params, state, x, cfg)
        out.append(float(b[0, 0, 0, 0]))
    return np.asarray(out)


def _fixed_params(cfg, k=2.0, ec=1.0, ps=1.0, bias=0.0, coef=1.0):
    from fetode_tpu.ops.ferro import FerroParams

    shape = (cfg.in_dim, cfg.out_dim, cfg.num_basis)
    full = lambda v: jnp.full(shape, v, jnp.float64)
    return FerroParams(k=full(k), ec=full(ec), ps=full(ps), bias=full(bias),
                       coef=full(coef))


def test_hysteresis_loop_opens():
    """Up-sweep then down-sweep through +/-Ec must trace different branches:
    the defining property the reference verifies visually
    (smooth_test_KAN_ferro.py's loop plots)."""
    cfg = _cfg()
    params = _fixed_params(cfg)
    up = np.linspace(-3, 3, 61)
    down = up[::-1]

    p_up = _sweep(params, cfg, np.concatenate([up, down]))
    rise = p_up[:61]
    fall = p_up[61:]

    # at E = 0 the two branches must differ (open loop)
    i0 = np.argmin(np.abs(up))
    gap = abs(rise[i0] - fall[::-1][i0])
    assert gap > 0.1, f"loop did not open, gap={gap}"


def test_branch_switches_sign():
    cfg = _cfg(alpha=0.0)  # no momentum: pure target for directness
    params = _fixed_params(cfg)
    state = ferro_state_init((1,), cfg, dtype=jnp.float64)

    # drive far above +Ec moving up -> branch -> +1
    _, state = ferro_basis(params, state, jnp.asarray([[3.0]], jnp.float64), cfg)
    assert float(state.branch[0, 0, 0, 0]) > 0.9

    # drive far below -Ec moving down -> branch -> -1
    _, state = ferro_basis(params, state, jnp.asarray([[-3.0]], jnp.float64), cfg)
    assert float(state.branch[0, 0, 0, 0]) < -0.9


def test_state_reset_equals_fresh_state():
    cfg = _cfg()
    params = _fixed_params(cfg)
    s_fresh = ferro_state_init((4,), cfg)
    assert float(s_fresh.prev_x.sum()) == 0.0
    assert np.all(np.asarray(s_fresh.branch) == 1.0)


def test_vmap_matches_loop():
    """Batch axis via vmap must equal per-sample evaluation — the property
    that kills the reference's Python batch loops (ferro_class.py:155)."""
    cfg = _cfg(in_dim=3, out_dim=2, num_basis=4)
    params = ferro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    xs = jax.random.normal(jax.random.PRNGKey(1), (5, 3), jnp.float64)

    state_b = ferro_state_init((5,), cfg, dtype=jnp.float64)
    y_batched, _ = ferro_apply(params, state_b, xs, cfg)

    def single(x):
        s = ferro_state_init((), cfg, dtype=jnp.float64)
        y, _ = ferro_apply(params, s, x, cfg)
        return y

    y_vmap = jax.vmap(single)(xs)
    np.testing.assert_allclose(np.asarray(y_batched), np.asarray(y_vmap),
                               atol=1e-12)


def test_output_shape_and_contraction():
    cfg = _cfg(in_dim=4, out_dim=3, num_basis=5)
    params = ferro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    state = ferro_state_init((7,), cfg, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 4), jnp.float64)
    y, new_state, basis = ferro_apply(params, state, x, cfg,
                                      return_activations=True)
    assert y.shape == (7, 3)
    assert basis.shape == (7, 4, 3, 5)
    # contraction definition
    ref = np.einsum("biok,iok->bo", np.asarray(basis), np.asarray(params.coef))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)
    assert new_state.prev_x.shape == (7, 4)


def test_noise_requires_key_and_is_detached():
    cfg = _cfg(noise_std=0.2)
    params = _fixed_params(cfg)
    state = ferro_state_init((1,), cfg, dtype=jnp.float64)
    x = jnp.asarray([[0.5]], jnp.float64)

    with pytest.raises(ValueError):
        ferro_basis(params, state, x, cfg)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    b1, _ = ferro_basis(params, state, x, cfg, noise_key=k1)
    b2, _ = ferro_basis(params, state, x, cfg, noise_key=k2)
    assert not np.allclose(np.asarray(b1), np.asarray(b2))

    # gradient flows through the clean path only: grad wrt x of noisy eval
    # equals grad of clean eval (noise is stop_gradient'ed)
    def clean(xv):
        c = _cfg()
        y, _ = ferro_apply(params, state, xv, c)
        return y.sum()

    def noisy(xv):
        y, _ = ferro_apply(params, state, xv, cfg, noise_key=k1)
        return y.sum()

    np.testing.assert_allclose(np.asarray(jax.grad(noisy)(x)),
                               np.asarray(jax.grad(clean)(x)), atol=1e-12)


def test_gradients_flow_to_all_params():
    cfg = _cfg(in_dim=2, out_dim=2, num_basis=3)
    params = ferro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float64)
    state = ferro_state_init((4,), cfg, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2), jnp.float64)

    def loss(p):
        y, _ = ferro_apply(p, state, x, cfg)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    for name, leaf in g._asdict().items():
        assert np.all(np.isfinite(np.asarray(leaf))), name
        assert float(jnp.abs(leaf).sum()) > 0, f"zero grad for {name}"


def test_scan_carried_state():
    """State threads through lax.scan — the solver-carry usage pattern."""
    cfg = _cfg()
    params = _fixed_params(cfg)
    fields = jnp.asarray(np.sin(np.linspace(0, 4 * np.pi, 50)) * 3.0,
                         jnp.float64)[:, None, None]

    def step(state, e):
        y, s = ferro_apply(params, state, e, cfg)
        return s, y

    s0 = ferro_state_init((1,), cfg, dtype=jnp.float64)
    _, ys = jax.lax.scan(step, s0, fields)
    assert ys.shape == (50, 1, 1)
    assert np.all(np.isfinite(np.asarray(ys)))


def test_bf16_state_supported():
    """bfloat16 hysteresis state threads through scans (dtype-stable carry)
    and stays close to the f32 result."""
    cfg = _cfg(in_dim=2, out_dim=3, num_basis=4)
    params = ferro_init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    def run(state_dtype):
        state = ferro_state_init((4,), cfg, dtype=state_dtype)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 2), jnp.float32)

        def step(s, x):
            y, s1 = ferro_apply(params, s, x, cfg)
            return s1, y

        _, ys = jax.lax.scan(step, state, xs)
        return ys

    y32 = run(jnp.float32)
    y16 = run(jnp.bfloat16)
    assert y16.dtype == jnp.float32  # compute dtype follows x
    np.testing.assert_allclose(np.asarray(y32), np.asarray(y16),
                               atol=5e-2, rtol=5e-2)


def test_gate_impl_tanh_matches_sigmoid():
    """gate_impl='tanh' (the measured +12/+22% VPU form,
    benchmarks/ferro_ceiling_tpu.json) is the same mathematical function
    as the logistic gates to float tolerance."""
    from fetode_tpu.ops.ferro import (FerroConfig, ferro_apply, ferro_init,
                                      ferro_state_init)

    cfg_s = FerroConfig(4, 6, 5)
    cfg_t = cfg_s._replace(gate_impl="tanh")
    key = jax.random.PRNGKey(3)
    params = ferro_init(key, cfg_s)
    state = ferro_state_init((7,), cfg_s)
    x = jax.random.normal(key, (7, 4))
    _, state = ferro_apply(params, state, x, cfg_s)      # history
    x2 = jax.random.normal(jax.random.PRNGKey(4), (7, 4))
    y_s, s_s = ferro_apply(params, state, x2, cfg_s)
    y_t, s_t = ferro_apply(params, state, x2, cfg_t)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_t.branch), np.asarray(s_s.branch),
                               atol=1e-6)
    with pytest.raises(ValueError, match="gate_impl"):
        ferro_apply(params, state, x2, cfg_s._replace(gate_impl="gelu"))
