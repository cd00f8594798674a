"""B-spline primitive tests: partition of unity, locality, lstsq round-trip,
and agreement with an independent scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fetode_tpu.ops import bspline_basis, curve2coeff, make_grid, refine_grid


def test_grid_shape():
    g = make_grid(in_features=4, grid_size=5, spline_order=3)
    assert g.shape == (4, 5 + 2 * 3 + 1)
    # uniform spacing
    diffs = np.diff(np.asarray(g[0]))
    assert np.allclose(diffs, diffs[0])


@pytest.mark.parametrize("order", [1, 2, 3])
def test_partition_of_unity(order):
    g = make_grid(3, grid_size=6, spline_order=order, grid_range=(-2.0, 2.0),
                  dtype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1.9, 1.9, (64, 3)))
    b = bspline_basis(x, g, order)
    assert b.shape == (64, 3, 6 + order)
    np.testing.assert_allclose(np.asarray(b.sum(-1)), 1.0, atol=1e-12)
    assert np.all(np.asarray(b) >= -1e-12)


def test_against_scipy_oracle():
    from scipy.interpolate import BSpline

    order = 3
    grid_size = 5
    g = make_grid(1, grid_size, order, grid_range=(-1.0, 1.0), dtype=jnp.float64)
    knots = np.asarray(g[0])
    x = np.linspace(-0.95, 0.95, 41)
    ours = np.asarray(bspline_basis(jnp.asarray(x)[:, None], g, order))[:, 0, :]

    n_basis = grid_size + order
    for j in range(n_basis):
        c = np.zeros(n_basis)
        c[j] = 1.0
        ref = BSpline(knots, c, order, extrapolate=False)(x)
        np.testing.assert_allclose(ours[:, j], np.nan_to_num(ref), atol=1e-12)


def test_curve2coeff_roundtrip(key):
    """Fitting values produced by known coefficients must recover them
    (well-posed since batch >> n_coeffs and x spans the grid)."""
    in_f, out_f, gsz, order = 3, 2, 5, 3
    g = make_grid(in_f, gsz, order, dtype=jnp.float64)
    coeff_true = jax.random.normal(key, (out_f, in_f, gsz + order), jnp.float64)

    x = jnp.asarray(np.linspace(-0.98, 0.98, 200)[:, None] * np.ones((1, in_f)))
    b = bspline_basis(x, g, order)                        # (B, in, C)
    y = jnp.einsum("bic,oic->bio", b, coeff_true)          # (B, in, out)

    coeff_fit = curve2coeff(x, y, g, order)
    np.testing.assert_allclose(np.asarray(coeff_fit), np.asarray(coeff_true),
                               atol=1e-7)


def test_refine_grid_monotone_and_shape():
    x = jnp.asarray(np.random.default_rng(2).normal(0, 2.0, (512, 4)))
    g = refine_grid(x, grid_size=5, spline_order=3)
    assert g.shape == (4, 5 + 2 * 3 + 1)
    gnp = np.asarray(g)
    assert np.all(np.diff(gnp, axis=1) > 0), "knots must be strictly increasing"
    # data support is covered by the interior knots
    assert np.all(gnp[:, 3] <= x.min(0)) and np.all(gnp[:, -4] >= x.max(0))


def test_bspline_grad_finite(key):
    g = make_grid(2, 5, 3, dtype=jnp.float64)

    def f(x):
        return jnp.sum(bspline_basis(x, g, 3) ** 2)

    x = jax.random.uniform(key, (8, 2), jnp.float64, -0.9, 0.9)
    grads = jax.grad(f)(x)
    assert np.all(np.isfinite(np.asarray(grads)))
