"""B-spline basis evaluation and least-squares coefficient fitting.

These are the spline primitives underneath every KAN layer: evaluate the
Cox-de Boor recursion on a fixed per-feature knot grid, and fit spline
coefficients to samples by batched least squares.

Capability parity: the reference exposes the same two operations as
``KANLinear.b_splines`` / ``KANLinear.curve2coeff``
(``/root/reference/efficient_kan/efficientkan.py:117-143``) and the grid
construction / adaptive refit in ``update_grid`` (same file, lines 184-221).
The math here is re-derived from the standard Cox-de Boor recursion; the
implementation is new (functional, vmap-safe, static-shape, XLA-fusable).

Shapes
------
grid  : (in_features, grid_size + 2*spline_order + 1)   knot vector per input
x     : (..., in_features)
bases : (..., in_features, grid_size + spline_order)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_grid(
    in_features: int,
    grid_size: int,
    spline_order: int,
    grid_range=(-1.0, 1.0),
    dtype=jnp.float32,
) -> jax.Array:
    """Uniform extended knot grid, one row per input feature.

    Knots run from ``grid_range[0] - spline_order*h`` to
    ``grid_range[1] + spline_order*h`` with ``h = span / grid_size`` so a
    degree-``spline_order`` spline is well defined on the whole range.
    """
    lo, hi = grid_range
    h = (hi - lo) / grid_size
    knots = jnp.arange(-spline_order, grid_size + spline_order + 1, dtype=dtype) * h + lo
    return jnp.broadcast_to(knots, (in_features, knots.shape[0]))


def bspline_basis(x: jax.Array, grid: jax.Array, spline_order: int) -> jax.Array:
    """Evaluate all degree-``spline_order`` B-spline basis functions.

    Cox-de Boor recursion, vectorised over batch and feature dims.  The
    recursion depth equals ``spline_order`` (static, usually 3) so it is
    fully unrolled at trace time — XLA sees a handful of fused elementwise
    ops over a ``(..., in, G+k)`` block, ideal for the VPU.

    Args:
      x:    (..., in_features) evaluation points.
      grid: (in_features, grid_size + 2*spline_order + 1) knot rows.

    Returns:
      (..., in_features, grid_size + spline_order) basis values.
    """
    dtype = x.dtype
    grid = grid.astype(dtype)
    xe = x[..., None]  # (..., in, 1)

    # Degree 0: indicator of the half-open knot interval.
    bases = jnp.logical_and(xe >= grid[..., :-1], xe < grid[..., 1:]).astype(dtype)

    for k in range(1, spline_order + 1):
        left_num = xe - grid[..., : -(k + 1)]
        left_den = grid[..., k:-1] - grid[..., : -(k + 1)]
        right_num = grid[..., k + 1 :] - xe
        right_den = grid[..., k + 1 :] - grid[..., 1:-k]
        bases = (left_num / left_den) * bases[..., :-1] + (right_num / right_den) * bases[..., 1:]

    return bases


def curve2coeff(
    x: jax.Array,
    y: jax.Array,
    grid: jax.Array,
    spline_order: int,
    rcond: float | None = None,
) -> jax.Array:
    """Fit spline coefficients so that ``spline(x) ~= y`` per (in, out) pair.

    Solves an independent least-squares problem for every input feature:
    ``A[in] @ C[in] = Y[in]`` with ``A[in] = bases(x)[:, in, :]``.

    Args:
      x: (batch, in_features) sample locations.
      y: (batch, in_features, out_features) target values.

    Returns:
      (out_features, in_features, grid_size + spline_order) coefficients.
    """
    a = bspline_basis(x, grid, spline_order)          # (B, in, C)
    a = jnp.transpose(a, (1, 0, 2))                   # (in, B, C)
    b = jnp.transpose(y, (1, 0, 2))                   # (in, B, out)

    def solve(ai, bi):
        sol, _, _, _ = jnp.linalg.lstsq(ai, bi, rcond=rcond)
        return sol                                     # (C, out)

    sol = jax.vmap(solve)(a, b)                        # (in, C, out)
    return jnp.transpose(sol, (2, 0, 1))               # (out, in, C)


def refine_grid(
    x: jax.Array,
    grid_size: int,
    spline_order: int,
    grid_eps: float = 0.02,
    margin: float = 0.01,
) -> jax.Array:
    """Data-adaptive knot grid blended with a uniform grid.

    Mirrors the capability of the reference's ``update_grid``
    (``efficientkan.py:184-221``): interior knots are a ``grid_eps`` blend of
    uniform spacing and empirical quantiles of ``x``, extended by
    ``spline_order`` extra knots on each side.

    Args:
      x: (batch, in_features) samples observed by the layer.

    Returns:
      (in_features, grid_size + 2*spline_order + 1) new knot grid.
    """
    batch = x.shape[0]
    xs = jnp.sort(x, axis=0)                           # (B, in)
    idx = jnp.linspace(0, batch - 1, grid_size + 1).astype(jnp.int32)
    grid_adaptive = xs[idx]                            # (G+1, in)

    span = xs[-1] - xs[0] + 2 * margin                 # (in,)
    step = span / grid_size
    ar = jnp.arange(grid_size + 1, dtype=x.dtype)[:, None]
    grid_uniform = ar * step[None, :] + xs[0][None, :] - margin

    interior = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive  # (G+1, in)

    below = interior[:1] - step[None, :] * jnp.arange(spline_order, 0, -1, dtype=x.dtype)[:, None]
    above = interior[-1:] + step[None, :] * jnp.arange(1, spline_order + 1, dtype=x.dtype)[:, None]
    full = jnp.concatenate([below, interior, above], axis=0)  # (G+2k+1, in)
    return full.T
