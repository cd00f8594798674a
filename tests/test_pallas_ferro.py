"""Pallas fused ferro kernel: parity vs the jnp reference (interpret mode
on CPU) for values, state, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    ferro_apply,
    ferro_init,
    ferro_state_init,
)
from fetode_tpu.ops.pallas_ferro import (
    ferro_apply_fused,
    ferro_apply_fused_interpret,
)


@pytest.mark.parametrize("dims", [(2, 10, 8), (3, 5, 12), (1, 1, 1)])
def test_fused_matches_reference_values(key, dims):
    in_d, out_d, K = dims
    cfg = FerroConfig(in_d, out_d, K)
    params = ferro_init(key, cfg)
    state = ferro_state_init((9,), cfg)
    # non-trivial state history
    x_prev = jax.random.normal(jax.random.PRNGKey(7), (9, in_d))
    _, state = ferro_apply(params, state, x_prev, cfg)
    x = jax.random.normal(jax.random.PRNGKey(8), (9, in_d))

    y_ref, s_ref = ferro_apply(params, state, x, cfg)
    y_fused, s_fused = ferro_apply_fused_interpret(params, state, x, cfg)

    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_fused.branch),
                               np.asarray(s_ref.branch), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_fused.prev_x),
                               np.asarray(s_ref.prev_x), atol=1e-6)


def test_fused_gradients_match_reference(key):
    """Differentiate through the PUBLIC fused entry (custom_vjp; forward
    forced to interpret mode) — both param and input gradients must match
    the jnp reference."""
    import fetode_tpu.ops.pallas_ferro as pf

    cfg = FerroConfig(2, 4, 8)
    params = ferro_init(key, cfg)
    state = ferro_state_init((5,), cfg)
    x = jax.random.normal(key, (5, 2))

    def loss_ref(p, xx):
        y, _ = ferro_apply(p, state, xx, cfg)
        return jnp.sum(y ** 2)

    orig = pf._fused_fwd_impl
    try:
        pf.__dict__["_fused_fwd_impl"] = \
            lambda p, s, xx, c, interpret=True: orig(p, s, xx, c,
                                                     interpret=True)

        def loss_fused(p, xx):
            y, _ = pf.ferro_apply_fused(p, state, xx, cfg)
            return jnp.sum(y ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
    finally:
        pf.__dict__["_fused_fwd_impl"] = orig


def test_fused_preserves_state_dtype(key):
    cfg = FerroConfig(2, 3, 4)
    params = ferro_init(key, cfg)
    state = ferro_state_init((4,), cfg, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (4, 2), jnp.float32)
    y, s1 = ferro_apply_fused_interpret(params, state, x, cfg)
    assert s1.branch.dtype == jnp.bfloat16
    assert s1.prev_x.dtype == jnp.bfloat16


def test_fused_custom_vjp_wiring(key):
    """The public fused entry must produce reference gradients (its bwd is
    the jnp vjp by construction) — run in interpret mode via monkeypatching
    the impl flag."""
    import fetode_tpu.ops.pallas_ferro as pf

    cfg = FerroConfig(2, 3, 4)
    params = ferro_init(key, cfg)
    state = ferro_state_init((4,), cfg)
    x = jax.random.normal(key, (4, 2))

    orig = pf._fused_fwd_impl
    try:
        pf.__dict__["_fused_fwd_impl"] = lambda p, s, xx, c, interpret=True: \
            orig(p, s, xx, c, interpret=True)

        def loss(p):
            y, _ = pf.ferro_apply_fused(p, state, x, cfg)
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(params)

        def loss_ref(p):
            y, _ = ferro_apply(p, state, x, cfg)
            return jnp.sum(y ** 2)

        g_ref = jax.grad(loss_ref)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
    finally:
        pf.__dict__["_fused_fwd_impl"] = orig
