"""Ferroelectric-hysteresis basis: the core analog-device primitive.

The polarisation response of a ferroelectric capacitor is modelled as a
saturating branch curve with a stateful branch selector:

    P = Ps * tanh(k * (E + Ec * s)) + bias,   s in [-1, +1]

where ``s`` follows an up/down branch state machine: sweeping the field up
past the coercive field ``+Ec`` pulls ``s`` toward +1 (upper branch),
sweeping down past ``-Ec`` pulls it toward -1 (lower branch), and in
between the previous branch persists — producing an open hysteresis loop
under cyclic drive.  All switching logic is smooth (sigmoid gates with a
configurable slope, exponential-moving-average branch update) so the basis
is differentiable everywhere.

Capability parity: this is the math of the reference's
``FerroelectricBasis`` family (``/root/reference/ferro_class.py:329-523``,
with the batched/noisy variants at lines 9-326).  The structural redesign
for TPU:

* **state is an explicit pytree** (``FerroState``) returned from every call
  instead of mutated module buffers — the whole basis is a pure function,
  legal under ``vmap``/``scan``/``pjit``.  The per-sample Python loops of the
  reference (``ferro_class.py:58,155``) disappear: batch is just a leading
  axis.
* ``prev_x`` is stored per input feature, ``(..., in)``, not broadcast to
  ``(..., in, out, K)`` as the reference's buffer is — the values are
  identical along the broadcast axes, so this saves ``out*K``× memory.
* device noise takes an explicit PRNG key (no hidden global RNG) and is
  applied through ``stop_gradient`` like the reference's ``noise.detach()``
  (``ferro_class.py:410-412``).
* the branch state is persisted on every call (the reference is
  inconsistent: its "clean" class never writes ``branch_sign`` while the
  noisy one does — ``ferro_class.py:409`` vs ``:512-514``; we keep one
  coherent semantic and expose ``update_branch`` to reproduce either).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FerroParams(NamedTuple):
    """Learnable device parameters, each ``(in_dim, out_dim, num_basis)``."""

    k: jax.Array      # switching slope
    ec: jax.Array     # coercive field
    ps: jax.Array     # saturation polarisation
    bias: jax.Array   # vertical offset
    coef: jax.Array   # mixing coefficients (basis -> output contraction)


class FerroState(NamedTuple):
    """Hysteresis state carried between evaluations.

    prev_x : (..., in_dim)                   last field seen per input
    branch : (..., in_dim, out_dim, K)       branch sign in [-1, +1]
    """

    prev_x: jax.Array
    branch: jax.Array


class FerroConfig(NamedTuple):
    """Static hyper-parameters of the basis (hashable, safe to close over)."""

    in_dim: int
    out_dim: int
    num_basis: int
    gate_slope: float = 10.0
    alpha: float = 0.8
    noise_std: float = 0.0
    update_branch: bool = True
    # Branch-gate sigmoid implementation: "sigmoid" (XLA logistic — the
    # bit-reference) or "tanh" (sigma(z) = (1+tanh(z/2))/2, exact to ~1
    # ulp).  On v5e the VPU evaluates tanh at 3.4 T elem/s vs 0.38 T for
    # the logistic lowering (measured, benchmarks/ferro_ceiling_tpu.json);
    # "tanh" makes the op +12% (f32 state) / +22% (bf16 state) at the
    # claim shape.  Default stays "sigmoid" for bit-parity with the
    # in-repo oracles; perf-critical configs opt in.
    gate_impl: str = "sigmoid"


def ferro_init(key, cfg: FerroConfig, dtype=jnp.float32,
               coef_scale: float = 1.0) -> FerroParams:
    """Initialise device parameters in the physical ranges the reference
    uses (``ferro_class.py:358-362``): k, Ec ~ U[0.5, 2.5], Ps ~ U[0.5, 2.0],
    bias ~ 0.1*N(0,1), coef ~ coef_scale*N(0,1).

    ``coef_scale < 1`` keeps the branch's initial output contribution small
    — important when the basis is an additive branch inside a KAN layer
    that feeds an ODE vector field (a large random field blows up the
    trajectory before learning starts).
    """
    kk, ke, kp, kb, kc = jax.random.split(key, 5)
    shape = (cfg.in_dim, cfg.out_dim, cfg.num_basis)
    return FerroParams(
        k=jax.random.uniform(kk, shape, dtype, 0.5, 2.5),
        ec=jax.random.uniform(ke, shape, dtype, 0.5, 2.5),
        ps=jax.random.uniform(kp, shape, dtype, 0.5, 2.0),
        bias=jax.random.normal(kb, shape, dtype) * 0.1,
        coef=jax.random.normal(kc, shape, dtype) * coef_scale,
    )


def ferro_state_init(batch_shape, cfg: FerroConfig, dtype=jnp.float32) -> FerroState:
    """Fresh state: zero field history, everything on the upper branch.

    This is exactly the reference's ``reset_state``
    (``ferro_class.py:422-424``) — resetting is just constructing a new state.
    """
    return FerroState(
        prev_x=jnp.zeros((*batch_shape, cfg.in_dim), dtype),
        branch=jnp.ones((*batch_shape, cfg.in_dim, cfg.out_dim, cfg.num_basis), dtype),
    )


def ferro_basis(
    params: FerroParams,
    state: FerroState,
    x: jax.Array,
    cfg: FerroConfig,
    *,
    noise_key: jax.Array | None = None,
    noise_std: jax.Array | None = None,
):
    """Evaluate the hysteresis basis tensor and advance the state.

    Args:
      x: (..., in_dim) applied field.
      noise_key: PRNG key for device noise; required iff ``cfg.noise_std > 0``.
      noise_std: optional TRACED override of ``cfg.noise_std`` — lets a
        population (``vmap``-ed config) run carry a different device-noise
        level per member without recompiling.  When given, the noise branch
        always executes (a member with std 0.0 adds an exact zero, so its
        outputs and gradients match the ungated path bit-for-bit) and
        ``noise_key`` is required.

    Returns:
      ``(basis, new_state)`` with ``basis: (..., in, out, K)``.
    """
    xe = x[..., :, None, None]                                     # (..., in, 1, 1)
    prev = jax.lax.stop_gradient(state.prev_x)[..., :, None, None]
    branch_prev = jax.lax.stop_gradient(state.branch)              # (..., in, out, K)

    if cfg.gate_impl == "tanh":
        sig = lambda z: 0.5 + 0.5 * jnp.tanh(0.5 * z)   # noqa: E731
    elif cfg.gate_impl == "sigmoid":
        sig = jax.nn.sigmoid
    else:
        raise ValueError(f"FerroConfig.gate_impl={cfg.gate_impl!r}: "
                         "expected 'sigmoid' or 'tanh'")
    g = cfg.gate_slope
    moving_up = sig(g * (xe - prev))                               # (..., in, 1, 1)
    crossed_pos = sig(g * (xe - params.ec))                        # (..., in, out, K)
    crossed_neg = sig(g * (-xe - params.ec))

    switch_up = moving_up * crossed_pos
    switch_down = (1.0 - moving_up) * crossed_neg
    target = switch_up - switch_down + (1.0 - switch_up - switch_down) * branch_prev

    # EMA toward the target branch keeps switching smooth (and the gradient
    # path through Ec / gate alive).
    branch = cfg.alpha * branch_prev + (1.0 - cfg.alpha) * target

    basis = params.ps * jnp.tanh(params.k * (xe + params.ec * branch)) + params.bias

    if noise_std is not None or cfg.noise_std > 0.0:
        if noise_key is None:
            raise ValueError("noise_std > 0 requires a noise_key")
        std = cfg.noise_std if noise_std is None else noise_std
        noise = jax.random.normal(noise_key, basis.shape, basis.dtype) * std
        basis = basis + jax.lax.stop_gradient(noise)

    # Preserve the caller's state dtype: hysteresis state is stop-gradient
    # bounded-in-[-1,1] memory, so bfloat16 state halves the dominant HBM
    # traffic of this op at no accuracy cost (compute stays in x.dtype).
    new_branch = (jax.lax.stop_gradient(target).astype(state.branch.dtype)
                  if cfg.update_branch else state.branch)
    new_state = FerroState(
        prev_x=jax.lax.stop_gradient(x).astype(state.prev_x.dtype),
        branch=new_branch)
    return basis, new_state


def ferro_apply(
    params: FerroParams,
    state: FerroState,
    x: jax.Array,
    cfg: FerroConfig,
    *,
    noise_key: jax.Array | None = None,
    noise_std: jax.Array | None = None,
    return_activations: bool = False,
):
    """Full basis layer: weighted sum of basis responses over (in, K).

    ``y[..., o] = sum_{i,k} basis[..., i, o, k] * coef[i, o, k]``
    (the contraction at ``ferro_class.py:413-414``).

    Returns ``(y, new_state)`` or ``(y, new_state, basis)`` when
    ``return_activations`` (the hysteresis-visualiser hook).
    """
    basis, new_state = ferro_basis(params, state, x, cfg, noise_key=noise_key,
                                   noise_std=noise_std)
    y = jnp.einsum("...iok,iok->...o", basis, params.coef)
    if return_activations:
        return y, new_state, basis
    return y, new_state
