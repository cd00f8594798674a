"""Fused Pallas TPU kernel for the ferroelectric-hysteresis basis layer.

The hot op (SURVEY.md §3.5): evaluate

    target = switch(x, prev_x, branch; Ec, gate)          # branch logic
    basis  = Ps * tanh(k * (x + Ec * (a*branch + (1-a)*target))) + bias
    y[b,o] = sum_{i,k} basis[b,i,o,k] * coef[i,o,k]

Without fusion the broadcast intermediate ``(B, in, out, K)`` makes a
round trip through HBM (~10 elementwise tensors of that size).  The kernel
keeps everything in VMEM: one batch-tile of ``x`` and ``branch`` streams
in, the reduced ``y`` tile and the updated branch tile stream out — HBM
traffic drops to the state tensors + outputs only.

Layout: the (out, K) axes are flattened to M = out*K (padded to the
128-lane boundary) so every elementwise op runs on full VPU lanes, and the
(in → out) reduction is a VMEM-local sum.

The backward pass reuses the pure-jnp reference (`ops.ferro.ferro_apply`)
via `jax.vjp` under recompute — bitwise-identical gradients to the
reference path by construction.

Measured on TPU v5e (B=256, in=64, out=128, K=12, f32, 50-iteration
amortised): XLA-fused jnp path 857 us/op, this kernel 1237 us/op — the
jnp path remains the default and this kernel is kept as a parity-tested
alternative.  Quantified (round 3, ``bench.py: bench_ferro_op`` →
``extra.roofline``): the jnp path achieves **167 GB/s = 20.4% of v5e HBM
peak** at arithmetic intensity 3.3 (≪ ridge 240 → bandwidth-bound, per
XLA's own cost model of the compiled program).  So "near the roofline"
was an overstatement: the op is bandwidth-CLASSIFIED but has ~5×
bandwidth headroom eaten by elementwise-chain latency on the
(B, in, out, K) branch state; this kernel did not recover it either.
The real lever is shrinking the state traffic itself (bf16 branch state
— see ``FerroState`` docs, measured +49% on the ECG scan path).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fetode_tpu.ops.ferro import FerroConfig, FerroParams, FerroState, ferro_apply


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(x_ref, prev_ref, branch_ref,
            k_ref, ec_ref, ps_ref, bias_ref, coef_ref,
            red_ref, nb_ref, *, gate_slope, alpha):
    """One (batch, M) tile.  Shapes (P = in_dim, TM = M-tile of out*K):
    x (TB, P), prev (TB, P), branch (TB, P, TM), params (P, TM),
    red (TB, TM) = sum over P of weighted basis, nb (TB, P, TM)."""
    x = x_ref[:]                                   # (TB, P)
    prev = prev_ref[:]
    br = branch_ref[:]                             # (TB, P, M)
    ec = ec_ref[:]                                 # (P, M)

    xe = x[:, :, None]                             # (TB, P, 1)
    up = jax.nn.sigmoid(gate_slope * (xe - prev[:, :, None]))
    cp = jax.nn.sigmoid(gate_slope * (xe - ec))
    cn = jax.nn.sigmoid(gate_slope * (-xe - ec))
    sw_up = up * cp
    sw_dn = (1.0 - up) * cn
    target = sw_up - sw_dn + (1.0 - sw_up - sw_dn) * br
    mom = alpha * br + (1.0 - alpha) * target

    basis = ps_ref[:] * jnp.tanh(k_ref[:] * (xe + ec * mom)) + bias_ref[:]
    weighted = basis * coef_ref[:]                 # (TB, P, M)

    # reduce over in (P); the K-group fold happens outside the kernel
    # (Mosaic cannot split the lane dim, and the (B, M) intermediate is
    # P-times smaller than the state traffic already streaming through)
    red_ref[:] = jnp.sum(weighted, axis=1)         # (TB, TM)
    nb_ref[:] = target


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ferro_apply_fused(params: FerroParams, state: FerroState, x, cfg: FerroConfig):
    """Drop-in fused version of ``ops.ferro.ferro_apply`` (no-noise path).

    Returns ``(y, new_state)``; gradients identical to the jnp reference.
    """
    return _fused_fwd_impl(params, state, x, cfg)


def _fused_fwd_impl(params, state, x, cfg, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import math

    B = x.shape[0]
    P, O, K = cfg.in_dim, cfg.out_dim, cfg.num_basis
    M = O * K
    # Tile M in chunks of TM = lcm(K, 128): multiple of K (padded lanes form
    # whole out slots, and a tile never splits an out slot) and of 128
    # (lane alignment).  A 2-D grid (batch-tiles x M-tiles) bounds VMEM.
    L = (K * 128) // math.gcd(K, 128)
    TM = min(L * max(1, 512 // L), -(-M // L) * L)
    Mp = -(-M // TM) * TM
    out_pad = Mp // K
    TB = 8
    Bp = -(-B // TB) * TB

    def pad_param(a):  # (P, O, K) -> (P, Mp)
        a2 = a.reshape(P, M)
        return _pad_to(a2, Mp, 1)

    kp, ecp, psp, biasp = map(pad_param, (params.k, params.ec, params.ps,
                                          params.bias))
    coefp = pad_param(params.coef)
    xb = _pad_to(x, Bp, 0)
    prevb = _pad_to(state.prev_x, Bp, 0)
    branchb = _pad_to(state.branch.reshape(B, P, M), Bp, 0)
    branchb = _pad_to(branchb, Mp, 2)

    kern = functools.partial(_kernel, gate_slope=cfg.gate_slope,
                             alpha=cfg.alpha)
    # Grid order: M-tiles on the OUTER axis, batch tiles inner — the last
    # grid dim iterates fastest, so the parameter blocks (indexed by j only)
    # stay resident in VMEM across the whole batch sweep instead of being
    # refetched per batch tile.
    grid = (Mp // TM, Bp // TB)
    red, nb = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, P), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P, TM), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((P, TM), lambda j, i: (0, j),
                          memory_space=pltpu.VMEM)] * 5,
        out_specs=[
            pl.BlockSpec((TB, TM), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, P, TM), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Mp), x.dtype),
            jax.ShapeDtypeStruct((Bp, P, Mp), x.dtype),
        ],
        interpret=interpret,
    )(xb, prevb, branchb, kp, ecp, psp, biasp, coefp)

    y = red[:B].reshape(B, out_pad, K).sum(-1)[:, :O]
    new_branch = nb[:B, :, :M].reshape(B, P, O, K)
    # Preserve the caller's state dtype (drop-in parity with ferro_apply,
    # including bf16 state carries).
    new_state = FerroState(
        prev_x=jax.lax.stop_gradient(x).astype(state.prev_x.dtype),
        branch=jax.lax.stop_gradient(new_branch).astype(state.branch.dtype))
    return y, new_state


def _fused_fwd(params, state, x, cfg):
    out = _fused_fwd_impl(params, state, x, cfg)
    return out, (params, state, x)


def _fused_bwd(cfg, res, cots):
    params, state, x = res
    dy, _ = cots  # state cotangent is stop_gradient'ed downstream

    def ref(params, x):
        y, _ = ferro_apply(params, state, x, cfg)
        return y

    _, vjp = jax.vjp(ref, params, x)
    dparams, dx = vjp(dy)
    dstate = jax.tree_util.tree_map(jnp.zeros_like, state)
    return dparams, dstate, dx


ferro_apply_fused.defvjp(_fused_fwd, _fused_bwd)


def ferro_apply_fused_interpret(params, state, x, cfg):
    """Interpreter-mode kernel execution (CPU tests)."""
    return _fused_fwd_impl(params, state, x, cfg, interpret=True)
