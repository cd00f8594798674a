"""Fixed-step ODE integration as a single `lax.scan`.

Replaces (capability-wise) the reference's hand-rolled fixed-step loops:
Euler trajectory rollouts (``/root/reference/train_kanfet_predprey.py:
181-189``), final-state Euler/RK2/RK4 integrators
(``/root/reference/train_ecg_kan_fet_nn_ode.py:670-705``), the substepped
RK4 (``/root/reference/train_kan_fet_ett.py:51-83``) and torchdiffeq's
fixed-grid methods.  One generic tableau-driven scan body covers all of
them; `jax.checkpoint` per step gives O(T) compute / O(sqrt-free constant)
memory reverse passes instead of PyTorch's O(T)-graph backprop.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from fetode_tpu.solvers.rk_common import rk_stage_loop
from fetode_tpu.solvers.tableaux import FIXED_TABLEAUX

PyTree = Any


def _interval_step(func, tableau, n_substeps, y, t0, t1, args):
    """Advance y from t0 to t1 with ``n_substeps`` equal tableau steps."""
    dt = (t1 - t0) / n_substeps

    def substep(i, y):
        t = t0 + i * dt
        y1, _, _ = rk_stage_loop(func, t, y, dt, tableau, args)
        return y1

    if n_substeps == 1:
        return substep(0, y)
    return jax.lax.fori_loop(0, n_substeps, substep, y)


def odeint_fixed(
    func: Callable,
    y0: PyTree,
    ts: jax.Array,
    *args,
    method: str = "rk4",
    n_substeps: int = 1,
    checkpoint: bool = True,
) -> PyTree:
    """Integrate ``dy/dt = func(t, y, *args)`` on the fixed grid ``ts``.

    Args:
      func: vector field ``f(t, y, *args) -> dy`` (y any pytree).
      y0: initial state at ``ts[0]``.
      ts: (T,) output times; each interval is integrated with ``n_substeps``
        equal steps of the chosen method.
      method: one of euler | midpoint | rk2 | heun | rk4 | dopri5_fixed.
      checkpoint: rematerialise each interval in the backward pass
        (memory O(T_states) -> O(1) activations per step).

    Returns:
      Trajectory pytree with a new leading time axis of length T
      (``out[0] == y0``).
    """
    tableau = FIXED_TABLEAUX[method]

    def step(y, t_pair):
        t0, t1 = t_pair
        y1 = _interval_step(func, tableau, n_substeps, y, t0, t1, args)
        return y1, y1

    if checkpoint:
        step = jax.checkpoint(step)

    t_pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, traj = jax.lax.scan(step, y0, t_pairs)
    return jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), y0, traj
    )


def integrate_final(
    func: Callable,
    y0: PyTree,
    t0,
    t1,
    *args,
    method: str = "rk4",
    n_steps: int = 8,
    checkpoint: bool = True,
) -> PyTree:
    """Integrate from t0 to t1 and return only the final state.

    The scan carries no trajectory, so memory stays O(state) regardless of
    step count (capability of ``integrate_euler/rk2/rk4`` in the reference).
    """
    tableau = FIXED_TABLEAUX[method]
    tdtype = jax.tree_util.tree_leaves(y0)[0].dtype
    t0 = jnp.asarray(t0, tdtype)
    dt = (jnp.asarray(t1, tdtype) - t0) / n_steps

    def step(y, i):
        t = t0 + i * dt
        y1, _, _ = rk_stage_loop(func, t, y, dt, tableau, args)
        return y1, None

    if checkpoint:
        step = jax.checkpoint(step)

    yT, _ = jax.lax.scan(step, y0, jnp.arange(n_steps))
    return yT


def rollout_discrete(
    step_fn: Callable,
    x0: PyTree,
    n_steps: int,
    *args,
    residual_dt: float | None = None,
    checkpoint: bool = True,
) -> PyTree:
    """Autoregressive rollout ``x <- step_fn(x)`` (or ``x + dt*step_fn(x)``).

    Covers the reference's discrete next-state rollout
    (``train_kanfet_mlp_predprey.py:146-152``) and its Euler-residual
    variant; returns the trajectory including ``x0`` (length n_steps+1).
    """
    def step(x, _):
        dx = step_fn(x, *args)
        x1 = jax.tree_util.tree_map(
            (lambda a, b: a + residual_dt * b) if residual_dt is not None else (lambda a, b: b),
            x, dx,
        )
        return x1, x1

    if checkpoint:
        step = jax.checkpoint(step)

    _, traj = jax.lax.scan(step, x0, None, length=n_steps)
    return jax.tree_util.tree_map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0), x0, traj
    )
