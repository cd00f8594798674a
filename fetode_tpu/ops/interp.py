"""Interpolation primitives for non-autonomous ODE right-hand sides.

When the vector field depends on an external signal ``x(t)`` sampled on a
grid, the solver needs ``x`` at arbitrary query times.  On TPU this is a
gather + lerp — static shapes, no data-dependent control flow.

Capability parity with the reference's ``LinearInterp1D``
(``/root/reference/train_ecg.py:450-462``) and the batched
``_interp_1d_batch`` (``/root/reference/kan_diffusion_ett.py:151-173``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_interp(ts: jax.Array, xs: jax.Array, t: jax.Array) -> jax.Array:
    """Piecewise-linear interpolation of a sampled signal, clamped at the ends.

    Args:
      ts: (T,) strictly increasing sample times.
      xs: (..., T, D) sampled values (any leading batch dims).
      t:  scalar query time.

    Returns:
      (..., D) interpolated value.
    """
    t = jnp.clip(t, ts[0], ts[-1])
    hi = jnp.clip(jnp.searchsorted(ts, t, side="right"), 1, ts.shape[0] - 1)
    lo = hi - 1
    t0, t1 = ts[lo], ts[hi]
    w = (t - t0) / jnp.where(t1 == t0, 1.0, t1 - t0)
    x0 = jax.lax.dynamic_index_in_dim(xs, lo, axis=-2, keepdims=False)
    x1 = jax.lax.dynamic_index_in_dim(xs, hi, axis=-2, keepdims=False)
    return x0 + w * (x1 - x0)


def cubic_hermite(t0, y0, f0, t1, y1, f1, t):
    """Cubic Hermite interpolant on [t0, t1] from endpoint values + slopes."""
    h = t1 - t0
    s = (t - t0) / h
    s2, s3 = s * s, s * s * s
    h00 = 2 * s3 - 3 * s2 + 1
    h10 = s3 - 2 * s2 + s
    h01 = -2 * s3 + 3 * s2
    h11 = s3 - s2
    return jax.tree_util.tree_map(
        lambda a, b, c, d: h00 * a + h10 * h * b + h01 * c + h11 * h * d,
        y0, f0, y1, f1,
    )
