"""KAN / KANFET layer tests: shapes, init statistics, branch arithmetic,
grid refit function preservation, regularisation, gradients, vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.nn.kan import (
    KANConfig,
    KANLinearConfig,
    kan_apply,
    kan_init,
    kan_linear_apply,
    kan_linear_init,
    kan_linear_regularization,
    kan_linear_update_grid,
    kan_state_init,
    kanfet_config,
)
from fetode_tpu.utils.trees import trainable_mask


def test_kan_linear_shapes(key):
    cfg = KANLinearConfig(3, 7)
    p = kan_linear_init(key, cfg, jnp.float64)
    x = jax.random.normal(key, (11, 3), jnp.float64)
    y, st = kan_linear_apply(p, cfg, x)
    assert y.shape == (11, 7)
    assert st is None


def test_kan_linear_leading_dims(key):
    cfg = KANLinearConfig(3, 4)
    p = kan_linear_init(key, cfg, jnp.float64)
    x = jax.random.normal(key, (5, 2, 3), jnp.float64)
    y, _ = kan_linear_apply(p, cfg, x)
    assert y.shape == (5, 2, 4)
    y2, _ = kan_linear_apply(p, cfg, x.reshape(10, 3))
    np.testing.assert_allclose(np.asarray(y.reshape(10, 4)), np.asarray(y2),
                               atol=1e-12)


def test_spline_plus_base_decomposition(key):
    """Output must equal base-branch + spline-branch computed by hand."""
    cfg = KANLinearConfig(2, 3, standalone_spline_scaler=True)
    p = kan_linear_init(key, cfg, jnp.float64)
    x = jax.random.uniform(key, (9, 2), jnp.float64, -0.9, 0.9)

    from fetode_tpu.ops.bsplines import bspline_basis

    base = jax.nn.silu(x) @ p["base_weight"].T
    bases = bspline_basis(x, p["_buffers"]["grid"], cfg.spline_order)
    sw = p["spline_weight"] * p["spline_scaler"][..., None]
    spline = bases.reshape(9, -1) @ sw.reshape(3, -1).T

    y, _ = kan_linear_apply(p, cfg, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(base + spline),
                               atol=1e-12)


def test_kanfet_layer_needs_state(key):
    cfg = KANLinearConfig(2, 3, ferro_num_basis=4)
    p = kan_linear_init(key, cfg, jnp.float64)
    x = jnp.zeros((5, 2), jnp.float64)
    with pytest.raises(ValueError):
        kan_linear_apply(p, cfg, x)


def test_kanfet_stack_forward_and_state(key):
    cfg = kanfet_config([2, 10, 2], grid_size=5, ferro_num_basis=4)
    params = kan_init(key, cfg, jnp.float64)
    state = kan_state_init((6,), cfg, jnp.float64)
    x = jax.random.normal(key, (6, 2), jnp.float64)
    y, new_state = kan_apply(params, cfg, x, state)
    assert y.shape == (6, 2)
    assert len(new_state) == 2
    # state advanced: prev_x now equals the layer inputs
    np.testing.assert_allclose(np.asarray(new_state[0].prev_x), np.asarray(x),
                               atol=1e-12)


def test_ferro_branch_changes_output(key):
    plain = KANConfig.make([2, 5, 2])
    fet = kanfet_config([2, 5, 2], ferro_num_basis=4)
    p_plain = kan_init(key, plain, jnp.float64)
    p_fet = kan_init(key, fet, jnp.float64)
    x = jax.random.normal(key, (4, 2), jnp.float64)
    y_plain, _ = kan_apply(p_plain, plain, x)
    y_fet, _ = kan_apply(p_fet, fet, x, kan_state_init((4,), fet, jnp.float64))
    assert not np.allclose(np.asarray(y_plain), np.asarray(y_fet))


def test_update_grid_preserves_function(key):
    """After refit, the layer must compute (nearly) the same function on the
    sample set — the defining property of curve2coeff refitting."""
    cfg = KANLinearConfig(2, 3)
    p = kan_linear_init(key, cfg, jnp.float64)
    x = jax.random.uniform(key, (256, 2), jnp.float64, -0.8, 0.8)
    y_before, _ = kan_linear_apply(p, cfg, x)
    p2 = kan_linear_update_grid(p, cfg, x)
    y_after, _ = kan_linear_apply(p2, cfg, x)
    np.testing.assert_allclose(np.asarray(y_after), np.asarray(y_before),
                               atol=1e-4)
    assert not np.allclose(np.asarray(p2["_buffers"]["grid"]),
                           np.asarray(p["_buffers"]["grid"]))


def test_regularization_positive(key):
    cfg = KANLinearConfig(2, 3, logistic_num_basis=4)
    p = kan_linear_init(key, cfg, jnp.float64)
    r = kan_linear_regularization(p, cfg, regularize_logistic_l1=0.1)
    assert float(r) > 0


def test_trainable_mask_freezes_grid(key):
    cfg = kanfet_config([2, 4, 2], ferro_num_basis=3)
    params = kan_init(key, cfg, jnp.float64)
    mask = trainable_mask(params)
    assert mask[0]["_buffers"]["grid"] is False
    assert mask[0]["base_weight"] is True
    assert mask[0]["ferro"]["coef"] is True


@pytest.mark.slow
def test_grads_flow_everywhere(key):
    cfg = kanfet_config([2, 6, 2], ferro_num_basis=3)
    params = kan_init(key, cfg, jnp.float64)
    state = kan_state_init((4,), cfg, jnp.float64)
    x = jax.random.normal(key, (4, 2), jnp.float64)

    def loss(p):
        y, _ = kan_apply(p, cfg, x, state)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(params)
    for i, layer in enumerate(g):
        for name in ("base_weight", "spline_weight"):
            assert float(jnp.abs(layer[name]).sum()) > 0, (i, name)
        for name, leaf in layer["ferro"].items():
            assert float(jnp.abs(leaf).sum()) > 0, (i, "ferro", name)


@pytest.mark.slow
def test_vmap_over_batch_of_states(key):
    cfg = kanfet_config([2, 4, 2], ferro_num_basis=3)
    params = kan_init(key, cfg, jnp.float64)
    xs = jax.random.normal(key, (5, 2), jnp.float64)

    def single(x):
        s = kan_state_init((), cfg, jnp.float64)
        y, _ = kan_apply(params, cfg, x, s)
        return y

    y_v = jax.vmap(single)(xs)
    y_b, _ = kan_apply(params, cfg, xs, kan_state_init((5,), cfg, jnp.float64))
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_b), atol=1e-12)
