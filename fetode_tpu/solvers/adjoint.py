"""Continuous-adjoint differentiation for the adaptive solver.

The reference relies on torchdiffeq's backprop-through-solver (its
``adjoint_params`` experiment is commented out —
``/root/reference/predator_prey.py:141``); the capability surface still
names the adjoint path (BASELINE.json: "adjoint-sensitivity backprop").

``odeint_adjoint`` provides optimise-then-discretise gradients:

* forward: early-exit ``while``-mode dopri5 (fast, O(1) memory);
* backward: the augmented system ``d/dt [y, a, g] =
  [f, -a^T df/dy, -a^T df/dargs]`` integrated in reverse time between
  output points, adding each output cotangent to ``a`` as it is crossed.

Memory is O(state), independent of step count — the complement of the
checkpointed discretise-then-optimise scan path (the default).

Note: cotangents w.r.t. ``ts`` are the standard boundary terms
``dL/dt_i = g_i . f(t_i, y_i)`` (with the conservation term at t0).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from fetode_tpu.solvers.dopri5 import odeint_dopri5
from fetode_tpu.solvers.rk_common import error_norm

PyTree = Any


def _seminorm(y_err, y0, y1, rtol, atol):
    """Step control on (state, adjoint) only — the parameter-gradient
    accumulator channels are integrals of already-controlled quantities and
    need no error control of their own ("'Hey, that's not an ODE': Faster
    ODE Adjoints via Seminorms", arXiv:2009.09457; see PAPERS.md).  Cuts
    backward-pass step counts substantially on parameter-heavy fields."""
    return error_norm(y_err[:2], y0[:2], y1[:2], rtol, atol)


def odeint_adjoint(func: Callable, y0: PyTree, ts: jax.Array, *args,
                   rtol: float = 1e-7, atol: float = 1e-9,
                   max_steps: int = 512, adjoint_rtol: float | None = None,
                   adjoint_atol: float | None = None):
    """Like ``odeint_dopri5`` but with continuous-adjoint gradients."""
    adjoint_rtol = rtol if adjoint_rtol is None else adjoint_rtol
    adjoint_atol = atol if adjoint_atol is None else adjoint_atol

    @partial(jax.custom_vjp, nondiff_argnums=())
    def solve(y0, ts, args):
        return odeint_dopri5(lambda t, y: func(t, y, *args), y0, ts,
                             rtol=rtol, atol=atol, max_steps=max_steps,
                             mode="while")

    def solve_fwd(y0, ts, args):
        ys = solve(y0, ts, args)
        return ys, (ys, ts, args)

    def solve_bwd(res, g):
        ys, ts, args = res
        T = ts.shape[0]

        def f_only(t, y, args):
            return func(t, y, *args)

        def aug_dynamics(t, aug, args):
            """Reverse-time augmented field at time -t."""
            y, a, _ = aug
            tt = -t
            f_eval, vjp_fn = jax.vjp(lambda yy, aa: f_only(tt, yy, aa), y, args)
            a_y, a_args = vjp_fn(a)
            neg = lambda tr: jax.tree_util.tree_map(jnp.negative, tr)
            # d/d(-t): y' = -f, a' = +a^T df/dy, g' = +a^T df/dargs
            return (neg(f_eval), a_y, a_args)

        g_list = lambda i: jax.tree_util.tree_map(lambda l: l[i], g)
        y_at = lambda i: jax.tree_util.tree_map(lambda l: l[i], ys)

        zeros_args = jax.tree_util.tree_map(jnp.zeros_like, args)

        def interval(carry, i):
            """Integrate adjoint from ts[i+1] down to ts[i]."""
            a, g_args, t_bar = carry
            i1 = T - 1 - i          # upper index: T-1, T-2, ..., 1
            i0 = i1 - 1
            t1, t0 = ts[i1], ts[i0]

            # add the output cotangent at the interval's upper end
            a = jax.tree_util.tree_map(jnp.add, a, g_list(i1))
            # time gradient at t1: g_i . f(t_i, y_i)
            f1 = f_only(t1, y_at(i1), args)
            dLdt1 = sum(jnp.vdot(gl, fl) for gl, fl in zip(
                jax.tree_util.tree_leaves(g_list(i1)),
                jax.tree_util.tree_leaves(f1)))
            t_bar = t_bar.at[i1].add(dLdt1)

            aug0 = (y_at(i1), a, g_args)
            span = jnp.asarray([-t1, -t0], ts.dtype)
            aug_traj = odeint_dopri5(aug_dynamics, aug0, span, args,
                                     rtol=adjoint_rtol, atol=adjoint_atol,
                                     max_steps=max_steps, mode="while",
                                     norm_fn=_seminorm)
            aug1 = jax.tree_util.tree_map(lambda l: l[-1], aug_traj)
            _, a, g_args = aug1
            return (a, g_args, t_bar), None

        a0 = jax.tree_util.tree_map(jnp.zeros_like, y0)
        t_bar0 = jnp.zeros_like(ts)
        (a, g_args, t_bar), _ = jax.lax.scan(
            interval, (a0, zeros_args, t_bar0), jnp.arange(T - 1))

        # cotangent at t0: remaining adjoint + boundary time term
        a = jax.tree_util.tree_map(jnp.add, a, g_list(0))
        f0 = f_only(ts[0], y_at(0), args)
        dLdt0 = sum(jnp.vdot(gl, fl) for gl, fl in zip(
            jax.tree_util.tree_leaves(a),
            jax.tree_util.tree_leaves(f0)))
        t_bar = t_bar.at[0].add(-dLdt0)

        return a, t_bar, g_args

    solve.defvjp(solve_fwd, solve_bwd)
    return solve(y0, ts, tuple(args))
