"""Shared pytree helpers and the generic explicit-RK stage loop."""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from fetode_tpu.solvers.tableaux import ButcherTableau

PyTree = Any


def _cast(a, leaf):
    """Cast a scalar to the leaf's dtype (prevents silent f32->f64 promotion
    of the carried state when time arrays are wider than the state)."""
    if isinstance(a, (int, float)):
        return a
    return a.astype(leaf.dtype)


def tree_scale(a, x: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda v: _cast(a, v) * v, x)


def tree_axpy(a, x: PyTree, y: PyTree) -> PyTree:
    """y + a * x (a is a scalar)."""
    return jax.tree_util.tree_map(lambda xv, yv: yv + _cast(a, yv) * xv, x, y)


def tree_where(pred, x: PyTree, y: PyTree) -> PyTree:
    return jax.tree_util.tree_map(lambda a, b: jnp.where(pred, a, b), x, y)


def tree_combination(coeffs: Sequence[float], trees: Sequence[PyTree]) -> PyTree:
    """sum_i coeffs[i] * trees[i], skipping exact-zero coefficients."""
    acc = None
    for c, t in zip(coeffs, trees):
        if isinstance(c, float) and c == 0.0:
            continue
        acc = tree_scale(c, t) if acc is None else tree_axpy(c, t, acc)
    if acc is None:
        acc = tree_scale(0.0, trees[0])
    return acc


def rk_stage_loop(
    func: Callable,
    t,
    y: PyTree,
    dt,
    tableau: ButcherTableau,
    args,
    f0: PyTree | None = None,
):
    """Run the explicit stage recursion of ``tableau`` once.

    The stage count is static so this unrolls at trace time into one fused
    XLA block (no per-stage dispatch).  If ``f0`` is given it is used as the
    first stage (FSAL reuse).

    Returns ``(y1, y_err, ks)`` — the step solution, the embedded error
    estimate (or None), and all stage derivatives.
    """
    ks = []
    for i in range(len(tableau.b)):
        if i == 0 and f0 is not None:
            ks.append(f0)
            continue
        if i == 0:
            yi = y
        else:
            incr = tree_combination(tableau.a[i][:i], ks)
            yi = tree_axpy(dt, incr, y)
        ks.append(func(t + tableau.c[i] * dt, yi, *args))

    y1 = tree_axpy(dt, tree_combination(tableau.b, ks), y)

    y_err = None
    if tableau.b_err is not None:
        y_err = tree_scale(dt, tree_combination(tableau.b_err, ks))
    return y1, y_err, ks


def error_norm(y_err: PyTree, y0: PyTree, y1: PyTree, rtol, atol):
    """Scaled RMS error norm over all state elements (pytree-wide)."""
    def leaf_sq(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = e / scale
        return jnp.sum(r * r)

    sq = jax.tree_util.tree_map(leaf_sq, y_err, y0, y1)
    total = jax.tree_util.tree_reduce(jnp.add, sq)
    n = sum(l.size for l in jax.tree_util.tree_leaves(y_err))
    return jnp.sqrt(total / n)
