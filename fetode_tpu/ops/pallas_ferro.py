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

Measured ceiling story (round 4, ``benchmarks/run_ferro_ceiling.py`` +
``run_ferro_kernel_ab.py``, B=256 in=64 out=128 K=12 on v5e):

* v5e VPU rates (chain-slope microbench): tanh **3.4 T elem/s**, logistic
  sigmoid **0.38 T**, exp 1.4 T, mul-add 9.1 T.
* The XLA jnp path measures ~790-920 ops/s (1.1-1.3 ms/op) across
  sessions.  Its floors: transcendental **141 us/op (13%)**, cost-model
  HBM **251 us/op (23%)** — NEITHER binds.  Round-3's "bandwidth-bound
  with ~5x headroom" is hereby RETIRED: bf16 branch state alone changes
  nothing (777 vs 790 ops/s), so HBM is not the limiter; the op is bound
  by XLA's fused-elementwise/reduce VPU code generation.
* Measured levers on the XLA path: tanh-form gates
  (``FerroConfig.gate_impl="tanh"``) **+12%** (882 ops/s); tanh gates +
  bf16 state **+22%** (966 ops/s, disjoint windows).
* This kernel (v2: tanh gates, bf16-capable state streams, tunable batch
  tile) reaches 593-732 ops/s — still BELOW the XLA fusion, which already
  avoids materialising the basis (its reduce-fusion computes it on the
  fly; the cost model's 206 MB/op ≈ exactly the state traffic + params).
  Kept as a parity-tested alternative; the jnp path remains the default.
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


def _sig(z):
    """sigmoid via tanh: on v5e the VPU evaluates tanh at 3.4 T elem/s but
    the logistic lowering at only 0.38 T (measured,
    ``benchmarks/ferro_ceiling_tpu.json``) — a 9x transcendental-cost cut
    for the three gates, exact to ~1 ulp (sigma(z) = (1+tanh(z/2))/2)."""
    return 0.5 + 0.5 * jnp.tanh(0.5 * z)


def _kernel(x_ref, prev_ref, branch_ref,
            k_ref, ec_ref, ps_ref, bias_ref, coef_ref,
            red_ref, nb_ref, *, gate_slope, alpha):
    """One (batch, M) tile.  Shapes (P = in_dim, TM = M-tile of out*K):
    x (TB, P), prev (TB, P), branch (TB, P, TM), params (P, TM),
    red (TB, TM) = sum over P of weighted basis, nb (TB, P, TM).

    The branch state blocks may be bfloat16 (halves the dominant HBM
    stream); arithmetic runs in the x dtype and the updated state is cast
    back on the way out."""
    x = x_ref[:]                                   # (TB, P)
    prev = prev_ref[:]
    br = branch_ref[:].astype(x.dtype)             # (TB, P, M)
    ec = ec_ref[:]                                 # (P, M)

    xe = x[:, :, None]                             # (TB, P, 1)
    up = _sig(gate_slope * (xe - prev[:, :, None]))
    cp = _sig(gate_slope * (xe - ec))
    cn = _sig(gate_slope * (-xe - ec))
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
    nb_ref[:] = target.astype(nb_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ferro_apply_fused(params: FerroParams, state: FerroState, x, cfg: FerroConfig):
    """Drop-in fused version of ``ops.ferro.ferro_apply`` (no-noise path).

    Returns ``(y, new_state)``; gradients identical to the jnp reference.
    """
    return _fused_fwd_impl(params, state, x, cfg)


def _fused_fwd_impl(params, state, x, cfg, interpret=False, block_b=16):
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
    # Batch tile: ~8 live (TB, P, TM) f32 temporaries in the elementwise
    # chain; TB=16 at the claim shape is ~12.5 MiB — the pallas_call
    # raises the scoped limit to 64 MiB to keep headroom.
    TB = block_b
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
            # state stream keeps the caller's (possibly bf16) dtype: the
            # branch tensors are the dominant HBM traffic of this op
            jax.ShapeDtypeStruct((Bp, P, Mp), state.branch.dtype),
        ],
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20)}),
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
