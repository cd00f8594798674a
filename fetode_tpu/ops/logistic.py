"""Logistic basis functions (plain and hysteretic two-branch variants).

Capability parity with the reference's ``LogisticBasis``
(``/root/reference/efficient_kan/efficientkan.py:7-24`` and the hysteretic
local variant at ``/root/reference/train_ecg_kan_fet_nn_ode.py:54-134``),
re-expressed as pure functions over explicit parameter / state pytrees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LogisticParams(NamedTuple):
    """Per-feature logistic basis parameters, each ``(in_features, num_basis)``."""

    a: jax.Array  # slope
    b: jax.Array  # centre


def logistic_init(key, in_features: int, num_basis: int, scale: float = 1.0,
                  dtype=jnp.float32) -> LogisticParams:
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (in_features, num_basis), dtype) * scale
    b = jax.random.normal(kb, (in_features, num_basis), dtype) * scale
    return LogisticParams(a=a, b=b)


def logistic_basis(params: LogisticParams, x: jax.Array) -> jax.Array:
    """``2 * sigmoid(a * (x - b))`` per feature and basis function.

    Args:
      x: (..., in_features)
    Returns:
      (..., in_features, num_basis)
    """
    xe = x[..., None]
    return 2.0 * jax.nn.sigmoid(params.a * (xe - params.b))


class HystereticLogisticState(NamedTuple):
    """Carried state of the two-branch hysteretic logistic basis.

    prev_x : (..., in_features)              last seen input
    branch : (..., in_features, num_basis)   1.0 = up branch, 0.0 = down branch
    """

    prev_x: jax.Array
    branch: jax.Array


class HystereticLogisticParams(NamedTuple):
    a: jax.Array    # (in, K) slope
    b: jax.Array    # (in, K) centre
    ec: jax.Array   # (in, K) half branch-separation (coercive shift)


def hysteretic_logistic_init(key, in_features: int, num_basis: int,
                             dtype=jnp.float32) -> HystereticLogisticParams:
    ka, kb, ke = jax.random.split(key, 3)
    return HystereticLogisticParams(
        a=jax.random.uniform(ka, (in_features, num_basis), dtype, 0.5, 2.5),
        b=jax.random.normal(kb, (in_features, num_basis), dtype) * 0.5,
        ec=jax.random.uniform(ke, (in_features, num_basis), dtype, 0.1, 1.0),
    )


def hysteretic_logistic_state(batch_shape, in_features: int, num_basis: int,
                              dtype=jnp.float32) -> HystereticLogisticState:
    return HystereticLogisticState(
        prev_x=jnp.zeros((*batch_shape, in_features), dtype),
        branch=jnp.ones((*batch_shape, in_features, num_basis), dtype),
    )


def hysteretic_logistic_basis(
    params: HystereticLogisticParams,
    state: HystereticLogisticState,
    x: jax.Array,
    *,
    gate_slope: float = 10.0,
    hard_gate: bool = False,
):
    """Two-branch logistic basis with direction-dependent branch selection.

    The up branch is the logistic shifted left by ``ec`` and the down branch
    shifted right; a gate driven by the sign of ``dx = x - prev_x`` selects
    the branch, yielding an open hysteresis loop under cyclic drive.  When
    the drive is stationary (dx ~ 0) the PREVIOUS branch persists — the
    carried ``state.branch`` is genuine memory, not just the last gate.
    A smooth gate is the default — the hard gate of the reference
    (``train_ecg_kan_fet_nn_ode.py:122-125``) kills gradients and is kept
    only behind ``hard_gate=True``.

    Returns ``(phi, new_state)`` with ``phi: (..., in, K)``.
    """
    xe = x[..., None]                                        # (..., in, 1)
    dx = x - jax.lax.stop_gradient(state.prev_x)             # (..., in)
    raw = jax.nn.sigmoid(gate_slope * dx)[..., None]         # (..., in, 1)
    # persistence weight: 1 at dx = 0 (keep previous branch), -> 0 for a
    # decisive sweep in either direction
    persist = 4.0 * raw * (1.0 - raw)
    branch_prev = jax.lax.stop_gradient(state.branch)        # (..., in, K)
    gate = (1.0 - persist) * raw + persist * branch_prev
    if hard_gate:
        gate = jax.lax.stop_gradient((gate > 0.5).astype(x.dtype))

    up = 2.0 * jax.nn.sigmoid(params.a * (xe - params.b + params.ec))
    down = 2.0 * jax.nn.sigmoid(params.a * (xe - params.b - params.ec))
    phi = gate * up + (1.0 - gate) * down

    new_state = HystereticLogisticState(
        prev_x=jax.lax.stop_gradient(x).astype(state.prev_x.dtype),
        branch=jax.lax.stop_gradient(
            jnp.broadcast_to(gate, phi.shape)).astype(state.branch.dtype),
    )
    return phi, new_state
