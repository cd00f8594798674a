"""Ferroelectric basis layers: linear, per-feature (2D), and convolutional.

One pure implementation covers the reference's whole class family
(``/root/reference/ferro_class.py``):

| reference class                       | here                               |
|---------------------------------------|------------------------------------|
| OriginalBatchedFerroelectricBasis :9   | ferro_linear (update_branch=True)  |
| BatchedFerroelectricBasis :107         | ferro_linear (same math; the       |
|                                        |   per-sample Python loop is gone — |
|                                        |   batch is a vmapped axis)         |
| NoisyBatchedFerroelectricBasis :220    | ferro_linear (noise_std=0.2)       |
| FerroelectricBasis :329                | ferro_linear (update_branch=False  |
|                                        |   reproduces its never-written     |
|                                        |   branch buffer; default True)     |
| NoisyFerroelectricBasis :427           | ferro_linear (noise_std>0,         |
|                                        |   update_branch=True)              |
| TwoDimensionFerroelectricBasis :526    | ferro_feature_basis (params        |
|                                        |   (in, K); returns weighted basis) |
| FerroelectricBasisConv2d :601          | ferro_conv2d (patches via          |
|                                        |   lax.conv_general_dilated_patches)|
| MemEfficient_...Conv2d :783            | ferro_conv2d(out_chunk=...)        |

All state is explicit (``FerroState``), making every layer vmap/scan/
pjit-legal; `reset` = construct a fresh state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    FerroState,
    ferro_apply,
    ferro_basis,
    ferro_init,
    ferro_state_init,
)

# ---------------------------------------------------------------- linear

ferro_linear_init = ferro_init
ferro_linear_state = ferro_state_init
ferro_linear_apply = ferro_apply


# ------------------------------------------------- per-feature (2D) basis


class Ferro2DParams(NamedTuple):
    """Per-(in_dim, num_basis) device parameters — no output dimension."""

    k: jax.Array
    ec: jax.Array
    ps: jax.Array
    bias: jax.Array
    coef: jax.Array


def ferro_feature_init(key, in_dim: int, num_basis: int,
                       dtype=jnp.float32) -> Ferro2DParams:
    kk, ke, kp, kb, kc = jax.random.split(key, 5)
    shape = (in_dim, num_basis)
    return Ferro2DParams(
        k=jax.random.uniform(kk, shape, dtype, 0.5, 2.5),
        ec=jax.random.uniform(ke, shape, dtype, 0.5, 2.5),
        ps=jax.random.uniform(kp, shape, dtype, 0.5, 2.0),
        bias=jax.random.normal(kb, shape, dtype) * 0.1,
        coef=jax.random.normal(kc, shape, dtype),
    )


class Ferro2DState(NamedTuple):
    prev_x: jax.Array   # (..., in)
    branch: jax.Array   # (..., in, K)


def ferro_feature_state(batch_shape, in_dim: int, num_basis: int,
                        dtype=jnp.float32) -> Ferro2DState:
    return Ferro2DState(
        prev_x=jnp.zeros((*batch_shape, in_dim), dtype),
        branch=jnp.ones((*batch_shape, in_dim, num_basis), dtype),
    )


def ferro_feature_basis(
    params: Ferro2DParams,
    state: Ferro2DState,
    x: jax.Array,
    *,
    gate_slope: float = 10.0,
    alpha: float = 0.8,
    noise_std: float = 0.0,
    noise_key=None,
):
    """Weighted hysteresis basis tensor ``(..., in, K)`` (building block —
    the reference's TwoDimensionFerroelectricBasis returns the weighted
    basis rather than a summed output, ``ferro_class.py:583-592``)."""
    xe = x[..., None]
    prev = jax.lax.stop_gradient(state.prev_x)[..., None]
    br = jax.lax.stop_gradient(state.branch)

    up = jax.nn.sigmoid(gate_slope * (xe - prev))
    cp = jax.nn.sigmoid(gate_slope * (xe - params.ec))
    cn = jax.nn.sigmoid(gate_slope * (-xe - params.ec))
    sw_up, sw_dn = up * cp, (1 - up) * cn
    target = sw_up - sw_dn + (1 - sw_up - sw_dn) * br
    mom = alpha * br + (1 - alpha) * target

    basis = params.ps * jnp.tanh(params.k * (xe + params.ec * mom)) + params.bias
    if noise_std > 0:
        noise = jax.random.normal(noise_key, basis.shape, basis.dtype) * noise_std
        basis = basis + jax.lax.stop_gradient(noise)
    weighted = basis * params.coef
    new_state = Ferro2DState(prev_x=jax.lax.stop_gradient(x),
                             branch=jax.lax.stop_gradient(target))
    return weighted, new_state


# ------------------------------------------------------------------ conv2d


class FerroConv2DConfig(NamedTuple):
    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    num_basis: int = 3
    stride: int = 1
    padding: int = 0
    gate_slope: float = 10.0
    alpha: float = 0.8
    noise_std: float = 0.0
    stateful: bool = False     # default stateless (dx=0, branch=+1)
    out_chunk: int = 0         # >0: chunk over out-channel blocks


class FerroConv2DParams(NamedTuple):
    """Each (Cout, Cin, K, kH, kW) + output bias (Cout,)."""

    k: jax.Array
    ec: jax.Array
    ps: jax.Array
    bias: jax.Array
    coef: jax.Array
    out_bias: jax.Array


def ferro_conv2d_init(key, cfg: FerroConv2DConfig,
                      dtype=jnp.float32) -> FerroConv2DParams:
    kH, kW = cfg.kernel_size
    shape = (cfg.out_channels, cfg.in_channels, cfg.num_basis, kH, kW)
    kk, ke, kp, kb, kc = jax.random.split(key, 5)
    return FerroConv2DParams(
        k=jax.random.uniform(kk, shape, dtype, 0.5, 2.5),
        ec=jax.random.uniform(ke, shape, dtype, 0.5, 2.5),
        ps=jax.random.uniform(kp, shape, dtype, 0.5, 2.0),
        bias=jax.random.normal(kb, shape, dtype) * 0.1,
        coef=jax.random.normal(kc, shape, dtype),
        out_bias=jnp.zeros((cfg.out_channels,), dtype),
    )


class FerroConv2DState(NamedTuple):
    """Hysteresis state over the patch field, shared across Cout (the
    memory layout of the mem-efficient reference variant,
    ``ferro_class.py:833-838``): prev_x (..., L, P), branch (..., L, P, K)
    with P = Cin*kH*kW patch elements and L output positions."""

    prev_x: jax.Array
    branch: jax.Array


def _patches(x: jax.Array, cfg: FerroConv2DConfig) -> jax.Array:
    """(B, Cin, H, W) -> (B, L, P) patch matrix, P = Cin*kH*kW."""
    kH, kW = cfg.kernel_size
    p = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kH, kW),
        window_strides=(cfg.stride, cfg.stride),
        padding=[(cfg.padding, cfg.padding)] * 2,
    )  # (B, Cin*kH*kW, Hout, Wout)
    b, pdim = p.shape[0], p.shape[1]
    return p.reshape(b, pdim, -1).transpose(0, 2, 1), p.shape[2:]


def ferro_conv2d_state(batch_shape, cfg: FerroConv2DConfig, out_hw, dtype=jnp.float32):
    kH, kW = cfg.kernel_size
    P = cfg.in_channels * kH * kW
    L = out_hw[0] * out_hw[1]
    return FerroConv2DState(
        prev_x=jnp.zeros((*batch_shape, L, P), dtype),
        branch=jnp.ones((*batch_shape, L, P, cfg.num_basis), dtype),
    )


def ferro_conv2d_apply(
    params: FerroConv2DParams,
    cfg: FerroConv2DConfig,
    x: jax.Array,
    state: Optional[FerroConv2DState] = None,
    *,
    noise_key=None,
):
    """Convolutional hysteresis response.

    out[b, o, l] = sum_{p, k} coef[o,p,k] * (Ps*tanh(k*(x_patch[b,l,p]
                   + Ec*branch)) + bias) + out_bias[o]

    The branch state lives on the patch field (independent of Cout, unlike
    the reference's 7-D buffer) so memory is O(B*L*P*K) instead of
    O(B*Cout*L*P*K).  ``out_chunk`` bounds the transient basis tensor by
    processing output-channel blocks sequentially (`lax.map`), mirroring
    the capability of the mem-efficient variant.

    Returns ``(y, new_state)`` with y (B, Cout, Hout, Wout).
    """
    patches, out_hw = _patches(x, cfg)                  # (B, L, P)
    B, L, P = patches.shape
    K = cfg.num_basis
    kH, kW = cfg.kernel_size

    # Flatten per-patch-element parameter axes: (Cout, P, K)
    def flat(a):
        return a.transpose(0, 1, 3, 4, 2).reshape(cfg.out_channels, P, K)

    pk, pec, pps, pbias, pcoef = map(flat, (params.k, params.ec, params.ps,
                                            params.bias, params.coef))

    if cfg.stateful and state is not None:
        prev = jax.lax.stop_gradient(state.prev_x)      # (B, L, P)
        br = jax.lax.stop_gradient(state.branch)        # (B, L, P, K)
    else:
        prev = patches                                   # dx = 0
        br = None                                        # +1 branch

    xe = patches[..., None]                              # (B, L, P, 1)
    up = jax.nn.sigmoid(cfg.gate_slope * (xe - prev[..., None]))

    def block(params_blk):
        bk, bec, bps, bbias, bcoef = params_blk          # each (Co_blk, P, K)
        # broadcast: (B, L, 1, P, K)
        x5 = patches[:, :, None, :, None]
        cp = jax.nn.sigmoid(cfg.gate_slope * (x5 - bec))
        cn = jax.nn.sigmoid(cfg.gate_slope * (-x5 - bec))
        up5 = up[:, :, None, :, :]
        sw_up, sw_dn = up5 * cp, (1 - up5) * cn
        br5 = 1.0 if br is None else br[:, :, None, :, :]
        target = sw_up - sw_dn + (1 - sw_up - sw_dn) * br5
        mom = cfg.alpha * br5 + (1 - cfg.alpha) * target
        basis = bps * jnp.tanh(bk * (x5 + bec * mom)) + bbias
        return jnp.einsum("blopk,opk->bol", basis, bcoef)

    if cfg.out_chunk and cfg.out_chunk < cfg.out_channels:
        n_blocks = -(-cfg.out_channels // cfg.out_chunk)
        pad = n_blocks * cfg.out_chunk - cfg.out_channels

        def pad0(a):
            return jnp.pad(a, ((0, pad), (0, 0), (0, 0))).reshape(
                n_blocks, cfg.out_chunk, P, K)

        stacked = tuple(map(pad0, (pk, pec, pps, pbias, pcoef)))
        y = jax.lax.map(block, stacked)                  # (n_blocks, B, Co_blk, L)
        y = jnp.concatenate(list(y), axis=1)[:, :cfg.out_channels]
    else:
        y = block((pk, pec, pps, pbias, pcoef))          # (B, Cout, L)

    if cfg.noise_std > 0:
        noise = jax.random.normal(noise_key, y.shape, y.dtype) * cfg.noise_std
        y = y + jax.lax.stop_gradient(noise)

    y = y + params.out_bias[None, :, None]
    y = y.reshape(B, cfg.out_channels, *out_hw)

    new_state = None
    if cfg.stateful:
        # Advance state from a Cout-independent pass (mean branch target
        # across Cout is not needed: Ec varies per Cout, so we track the
        # patch-level direction only and a shared branch via params mean).
        ec_shared = pec.mean(0)                          # (P, K)
        cp = jax.nn.sigmoid(cfg.gate_slope * (xe - ec_shared))
        cn = jax.nn.sigmoid(cfg.gate_slope * (-xe - ec_shared))
        sw_up, sw_dn = up * cp, (1 - up) * cn
        br0 = br if br is not None else jnp.ones_like(sw_up)
        target = sw_up - sw_dn + (1 - sw_up - sw_dn) * br0
        new_state = FerroConv2DState(
            prev_x=jax.lax.stop_gradient(patches),
            branch=jax.lax.stop_gradient(target),
        )
    return y, new_state
