"""ODE solver runtime (the L2 core): scan/while_loop XLA integrators.

Unified entry point ``odeint`` mirrors the torchdiffeq call surface the
reference uses (``odeint(func, y0, t, method=..., rtol=..., atol=...)``)
while staying jit/vmap/pjit-native.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from fetode_tpu.solvers.adjoint import odeint_adjoint  # noqa: F401
from fetode_tpu.solvers.dopri5 import Dopri5Stats, odeint_dopri5  # noqa: F401
from fetode_tpu.solvers.fixed import (  # noqa: F401
    integrate_final,
    odeint_fixed,
    rollout_discrete,
)
from fetode_tpu.solvers.stateful import (  # noqa: F401
    integrate_final_stateful,
    odeint_fixed_stateful,
)
from fetode_tpu.solvers.tableaux import FIXED_TABLEAUX  # noqa: F401

PyTree = Any

ADAPTIVE_METHODS = ("dopri5",)
FIXED_METHODS = tuple(FIXED_TABLEAUX)


def odeint(
    func: Callable,
    y0: PyTree,
    ts,
    *args,
    method: str = "dopri5",
    rtol: float = 1e-7,
    atol: float = 1e-9,
    **options,
) -> PyTree:
    """Integrate ``dy/dt = func(t, y, *args)``, reporting states at ``ts``.

    method: 'dopri5' (adaptive) or any fixed method in ``FIXED_METHODS``.
    Fixed methods take ``n_substeps``; dopri5 takes ``max_steps``, ``mode``
    ('scan'|'while'), ``norm_fn``, ``full_output``.
    """
    if method in ADAPTIVE_METHODS:
        return odeint_dopri5(func, y0, ts, *args, rtol=rtol, atol=atol, **options)
    if method in FIXED_TABLEAUX:
        return odeint_fixed(func, y0, ts, *args, method=method, **options)
    raise ValueError(f"unknown method {method!r}; "
                     f"choose from {ADAPTIVE_METHODS + FIXED_METHODS}")
