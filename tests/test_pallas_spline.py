"""Fused B-spline kernel: parity vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.ops.bsplines import bspline_basis, make_grid
from fetode_tpu.ops.pallas_spline import (
    spline_matmul_fused,
    spline_matmul_fused_interpret,
)


def _ref(x, grid, weight, order):
    bases = bspline_basis(x, grid, order)
    return jnp.einsum("bic,oic->bo", bases, weight)


@pytest.mark.parametrize("dims", [(2, 10, 5, 3), (7, 16, 8, 3), (1, 1, 4, 2)])
def test_fused_spline_matches_reference(key, dims):
    n_in, n_out, G, order = dims
    grid = make_grid(n_in, G, order)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (13, n_in), jnp.float32, -0.95, 0.95)
    w = jax.random.normal(k2, (n_out, n_in, G + order), jnp.float32)

    y_ref = _ref(x, grid, w, order)
    y_fused = spline_matmul_fused_interpret(x, grid, w, order)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_spline_out_of_range_inputs(key):
    """Inputs outside the grid range must match the reference (zeros)."""
    grid = make_grid(3, 5, 3)
    w = jax.random.normal(key, (4, 3, 8), jnp.float32)
    x = jnp.asarray([[-5.0, 0.2, 5.0], [0.0, -2.0, 2.0]], jnp.float32)
    y_ref = _ref(x, grid, w, 3)
    y_fused = spline_matmul_fused_interpret(x, grid, w, 3)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)
    assert np.all(np.isfinite(np.asarray(y_fused)))


def test_fused_spline_gradients(key):
    """custom_vjp gradients (through the public entry, interpret-forced)
    match the reference."""
    import fetode_tpu.ops.pallas_spline as ps

    grid = make_grid(2, 5, 3)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (6, 2), jnp.float32, -0.9, 0.9)
    w = jax.random.normal(k2, (3, 2, 8), jnp.float32)

    orig = ps._fwd_impl
    try:
        ps.__dict__["_fwd_impl"] = \
            lambda x, g, w, o, interpret=True: orig(x, g, w, o, interpret=True)

        def loss_fused(x, w):
            return jnp.sum(ps.spline_matmul_fused(x, grid, w, 3) ** 2)

        def loss_ref(x, w):
            return jnp.sum(_ref(x, grid, w, 3) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
        gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
    finally:
        ps.__dict__["_fwd_impl"] = orig
