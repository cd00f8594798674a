"""Fused Pallas TPU kernel: B-spline basis evaluation + spline matmul.

The KAN layer's spline branch is ``y = flatten(bsplines(x)) @ W.T`` —
basis evaluation (Cox-de Boor, ~4k elementwise passes over a
``(B, in, G+k)`` block) followed by an MXU matmul.  This kernel keeps the
basis tensor entirely in VMEM: the only HBM traffic is x in, y out, and
the weights (resident across the batch sweep).

Lane layout trick: the recursion couples NEIGHBOURING basis functions of
the same input feature (``B_k[c]`` needs ``B_{k-1}[c]`` and
``B_{k-1}[c+1]``).  We flatten (in, C0) onto the 128-wide lane axis with
per-feature blocks of C0 = G+2k degree-0 functions and realise the
``c+1`` neighbour as ``pltpu.roll(b, -1)`` — block-edge pollution only
touches lanes that the recursion has already invalidated, so valid lanes
(c < G+k after k levels) are exact.  Per-lane knot windows are gathered
once outside the kernel.

Capability parity: this is the Pallas form of
``KANLinear.b_splines`` + the spline matmul
(``/root/reference/efficient_kan/efficientkan.py:117-131,167-170``),
named as a kernel target by BASELINE.json.  Backward pass = jnp reference
vjp under recompute (same pattern as the ferro kernel).

Measured on TPU v5e (B=256, in=640, out=128, G=5, k=3, 50-iteration
amortised): 745.5 us/op vs XLA's fused jnp path at 743.0 us/op — exact
value parity, throughput parity: XLA already fuses the basis recursion
into the matmul's producer.  Kept as the parity-tested kernel form;
the jnp path stays the default.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from fetode_tpu.ops.bsplines import bspline_basis


def _kernel(x_ref, gs_ref, mask_ref, w_ref, y_ref, *, order, C0, M):
    """x (TB, M) per-lane inputs, gs (order+2, M) knot windows,
    mask (1, M) lane validity, w (M, out_pad), y (TB, out_pad)."""
    x = x_ref[:]                                   # (TB, M)
    g = [gs_ref[r, :] for r in range(order + 2)]   # each (M,)

    b = jnp.logical_and(x >= g[0], x < g[1]).astype(x.dtype)
    from jax.experimental.pallas import tpu as pltpu

    for k in range(1, order + 1):
        left = (x - g[0]) / (g[k] - g[0])
        right = (g[k + 1] - x) / (g[k + 1] - g[1])
        # neighbour c+1 = left-rotate by one = right-rotate by M-1
        # (pltpu.roll requires a non-negative shift)
        b = left * b + right * pltpu.roll(b, M - 1, 1)

    # scrub invalid lanes (clamped knot windows there can yield NaN, and
    # 0 * NaN = NaN would poison the reduction)
    b = jnp.where(mask_ref[0, :] > 0, b, 0.0)
    y_ref[:] = jnp.dot(b, w_ref[:], preferred_element_type=x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spline_matmul_fused(x, grid, weight, spline_order: int):
    """y[b, o] = sum_{i, c} bsplines(x)[b, i, c] * weight[o, i, c].

    x (B, in); grid (in, G+2k+1); weight (out, in, G+k) — the *scaled*
    spline weight.  Returns (B, out).
    """
    return _fwd_impl(x, grid, weight, spline_order)


def _fwd_impl(x, grid, weight, order, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n_in = x.shape
    n_knots = grid.shape[1]
    G = n_knots - 2 * order - 1
    C0 = G + 2 * order            # degree-0 functions per feature
    C = G + order                 # valid basis functions per feature
    O = weight.shape[0]

    M = -(-n_in * C0 // 128) * 128
    out_pad = -(-O // 128) * 128
    TB = min(128, -(-B // 8) * 8)
    Bp = -(-B // TB) * TB

    # per-lane input: lane (i, c) sees x[:, i]
    lane_feat = (jnp.arange(n_in * C0) // C0)
    x_lane = x[:, lane_feat]                                  # (B, n_in*C0)
    x_lane = jnp.pad(x_lane, ((0, Bp - B), (0, M - n_in * C0)))

    # per-lane knot windows g[i, c + r], r = 0..order+1 (clamped gathers on
    # lanes the recursion invalidates anyway; their values are masked out)
    lane_c = jnp.arange(n_in * C0) % C0
    gs = jnp.stack([grid[lane_feat, jnp.minimum(lane_c + r, n_knots - 1)]
                    for r in range(order + 2)])
    # pad with strictly increasing dummy knots (avoid 0/0 in padded lanes)
    pad_cols = M - n_in * C0
    if pad_cols:
        dummy = (jnp.arange(order + 2, dtype=grid.dtype)[:, None]
                 * jnp.ones((1, pad_cols), grid.dtype))
        gs = jnp.concatenate([gs, dummy], axis=1)             # (k+2, M)

    # weights on valid lanes only (zeros elsewhere)
    w_flat = jnp.zeros((M, out_pad), weight.dtype)
    lane_valid = lane_c < C
    src = jnp.transpose(weight, (1, 2, 0)).reshape(n_in * C, O)  # (in*C, out)
    valid_lanes = jnp.nonzero(lane_valid, size=n_in * C)[0]
    w_flat = w_flat.at[valid_lanes, :O].set(src)

    mask = jnp.pad(lane_valid.astype(x.dtype), (0, M - n_in * C0))[None]

    kern = functools.partial(_kernel, order=order, C0=C0, M=M)
    y = pl.pallas_call(
        kern,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((order + 2, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, out_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, out_pad), x.dtype),
        interpret=interpret,
    )(x_lane, gs, mask, w_flat)
    return y[:B, :O]


def _ref(x, grid, weight, order):
    bases = bspline_basis(x, grid, order)
    return jnp.einsum("bic,oic->bo", bases, weight)


def _fwd(x, grid, weight, order):
    return _fwd_impl(x, grid, weight, order), (x, grid, weight)


def _bwd(order, res, dy):
    x, grid, weight = res
    _, vjp = jax.vjp(lambda x, w: _ref(x, grid, w, order), x, weight)
    dx, dw = vjp(dy)
    return dx, jnp.zeros_like(grid), dw


spline_matmul_fused.defvjp(_fwd, _bwd)


def spline_matmul_fused_interpret(x, grid, weight, spline_order: int):
    """Interpreter-mode execution (CPU tests)."""
    return _fwd_impl(x, grid, weight, spline_order, interpret=True)
