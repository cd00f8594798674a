"""Fixed-step integration with an auxiliary side-state channel.

Hysteretic vector fields carry discrete device state (branch signs, last
field) that is *not* part of the continuous ODE state: it has no
derivative, must not enter error control, and advances by jumps.  The
reference smuggles this through module buffers mutated inside every RHS
call — solver-order-dependent and batch-unsafe (SURVEY.md §7.4-2).

Here the semantics are explicit and principled: within a step all stages
see the state frozen at the step start; the state advances once per step
from the evaluation at the accepted point.  ``func`` has signature

    func(t, y, s, *args) -> (dy, s_next)

and the integrators return both the trajectory and the final state.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from fetode_tpu.solvers.rk_common import rk_stage_loop
from fetode_tpu.solvers.tableaux import FIXED_TABLEAUX

PyTree = Any


def odeint_fixed_stateful(
    func: Callable,
    y0: PyTree,
    s0: PyTree,
    ts: jax.Array,
    *args,
    method: str = "rk4",
    n_substeps: int = 1,
    checkpoint: bool = True,
    advance_state: bool = True,
):
    """Fixed-grid trajectory with per-interval state advance.

    Returns ``(traj, s_final)``; traj has leading axis len(ts).
    With ``advance_state=False`` the state stays frozen at ``s0`` for the
    whole solve (the conv-style "stateless" evaluation mode).
    """
    tableau = FIXED_TABLEAUX[method]

    def step(carry, t_pair):
        y, s = carry
        t0, t1 = t_pair
        dt = (t1 - t0) / n_substeps

        # advance side state once per interval, from the interval start
        dy0, s1 = func(t0, y, s, *args)
        if not advance_state:
            s1 = s

        def frozen(t, yy):
            dyy, _ = func(t, yy, s, *args)
            return dyy

        def substep(i, yy):
            t = t0 + i * dt
            y_next, _, _ = rk_stage_loop(frozen, t, yy, dt, tableau, ())
            return y_next

        y1 = jax.lax.fori_loop(0, n_substeps, substep, y) if n_substeps > 1 \
            else substep(0, y)
        return (y1, s1), y1

    if checkpoint:
        step = jax.checkpoint(step)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    (yT, sT), traj = jax.lax.scan(step, (y0, s0), t_pairs)
    traj = jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), y0, traj
    )
    return traj, sT


def integrate_final_stateful(
    func: Callable,
    y0: PyTree,
    s0: PyTree,
    t0,
    t1,
    *args,
    method: str = "rk4",
    n_steps: int = 8,
    checkpoint: bool = True,
    advance_state: bool = True,
):
    """Final state only; memory O(state) regardless of step count."""
    tableau = FIXED_TABLEAUX[method]
    tdtype = jax.tree_util.tree_leaves(y0)[0].dtype
    t0 = jnp.asarray(t0, tdtype)
    dt = (jnp.asarray(t1, tdtype) - t0) / n_steps

    def step(carry, i):
        y, s = carry
        t = t0 + i * dt
        _, s1 = func(t, y, s, *args)
        if not advance_state:
            s1 = s

        def frozen(tt, yy):
            dyy, _ = func(tt, yy, s, *args)
            return dyy

        y1, _, _ = rk_stage_loop(frozen, t, y, dt, tableau, ())
        return (y1, s1), None

    if checkpoint:
        step = jax.checkpoint(step)

    (yT, sT), _ = jax.lax.scan(step, (y0, s0), jnp.arange(n_steps))
    return yT, sT
