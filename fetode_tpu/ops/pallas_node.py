"""Whole-solve Pallas kernel: a full adaptive dopri5 integration of a
KANFET neural-ODE field in ONE TPU kernel, per-lane step control.

Why this exists: the flagship predprey NODE (KANFET [2,10,2], reference
config ``train_kanfet_node_predprey.py:146,252``) is a *tiny* field — the
XLA scan path is bound by per-iteration loop overhead (~10 us/step), not
by compute.  Fusing the entire solver loop into one Pallas kernel keeps
every parameter and the whole solver state resident in VMEM and replaces
the HLO loop machinery with an in-kernel ``fori_loop``, so the marginal
cost of a solver step is just its VPU arithmetic.

Design (see ``/opt/skills/guides/pallas_guide.md``):

* **Batch on the lane axis.**  Every per-trajectory quantity is laid out
  ``(feature…, B)`` with B on the 128-lane axis — 512 trajectories step
  *independently*: each lane carries its own ``(t, dt, err_prev)`` and its
  own accept/reject decisions (per-lane adaptivity, which the vmapped XLA
  path gets only by masking whole iterations).
* **Field math mirrored exactly** from the jnp ops so the kernel is
  parity-testable against ``models.predprey.predict``: Cox-de Boor
  recursion (``ops/bsplines.py:46-75``), SiLU base + spline matmuls
  (``nn/kan.py:144-196``), ferro hysteresis basis with fresh frozen state
  (``ops/ferro.py:113-163`` — ``prev_x=0``, ``branch=+1``, the inference
  semantic of ``models/predprey.py: predict``).
* **Dense output** (Hairer CONTD5) evaluated at all requested times after
  every accepted step and merged with a mask — identical placement logic
  to ``solvers/dopri5.py:186-196``.

Forward-only (inference / evaluation path).  Training keeps the
checkpointed-scan dopri5: its backward is the measured-fastest option
(BASELINE.md ablations).

Precision note: all in-kernel dots run at ``Precision.HIGHEST``.  With
the default bf16-pass MXU matmuls the embedded 4th/5th-order error
estimate bottoms out at the matmul noise floor, so the controller rejects
forever at dt~1e-2 and burns the whole step budget (measured: 256
attempts to reach t=2.1 where the f32 path crosses the full window in 18
accepted steps) — adaptive solvers are precision-critical in a way plain
inference is not.

Measured (TPU v5e-1, flagship predprey field, rtol 1e-7/atol 1e-9,
140 output times; parity vs while-mode odeint 1.9e-5 in interpret mode;
numbers in BASELINE.md are kept current after the precision fix).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.solvers.tableaux import DOPRI5, DOPRI5_DENSE_D

# PI controller constants (identical to solvers/dopri5.py:43-46).
_ORDER = 5
_BETA = 0.04
_ALPHA = 1.0 / _ORDER - 0.75 * _BETA
_SAFETY = 0.9
_IFACTOR = 10.0
_DFACTOR = 0.2


def _field_factory(layer_dims, spline_order, gate_slope, alpha, n_knots):
    """Build the in-kernel KANFET field eval over ``(D, B)`` states.

    ``layer_refs`` per layer: (base_w, sw2, grid, fk, fec, fps, fbias,
    fcoef) with sw2 pre-scaled/reshaped ``(out, in*C)`` and ferro params
    flattened ``(in*out*K, 1)`` in (i, o, k) row-major order.
    """

    def field(x, layer_refs):
        for (in_d, out_d, K), refs in zip(layer_dims, layer_refs):
            base_w, sw2, grid, fk, fec, fps, fbias, fcoef = refs
            # ---- base branch: silu(x) @ W^T  → (out, B).  HIGHEST MXU
            # precision: bf16-pass matmuls floor the embedded error
            # estimate and stall the step controller (see pallas_adjoint).
            y = jax.lax.dot_general(
                base_w[:], jax.nn.silu(x), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

            # ---- spline branch: Cox-de Boor over (in, seg, B)
            g3 = grid[:][:, :, None]                       # (in, NK, 1)
            xe = x[:, None, :]                             # (in, 1, B)
            bases = jnp.logical_and(xe >= g3[:, :-1], xe < g3[:, 1:])
            bases = bases.astype(x.dtype)                  # (in, NK-1, B)
            for k in range(1, spline_order + 1):
                ln = xe - g3[:, : -(k + 1)]
                ld = g3[:, k:-1] - g3[:, : -(k + 1)]
                rn = g3[:, k + 1:] - xe
                rd = g3[:, k + 1:] - g3[:, 1:-k]
                bases = (ln / ld) * bases[:, :-1] + (rn / rd) * bases[:, 1:]
            C = n_knots - 1 - spline_order                 # grid_size + order
            B = x.shape[-1]
            y = y + jax.lax.dot_general(
                sw2[:], bases.reshape(in_d * C, B), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

            # ---- ferro branch, fresh frozen state (prev_x=0, branch=+1)
            N = in_d * out_d * K
            xf = jnp.broadcast_to(x[:, None, :], (in_d, out_d * K, B))
            xf = xf.reshape(N, B)
            moving_up = jax.nn.sigmoid(gate_slope * xf)    # prev_x == 0
            crossed_pos = jax.nn.sigmoid(gate_slope * (xf - fec[:]))
            crossed_neg = jax.nn.sigmoid(gate_slope * (-xf - fec[:]))
            sw_up = moving_up * crossed_pos
            sw_dn = (1.0 - moving_up) * crossed_neg
            target = sw_up - sw_dn + (1.0 - sw_up - sw_dn)  # branch_prev=1
            branch = alpha + (1.0 - alpha) * target
            fb = fps[:] * jnp.tanh(fk[:] * (xf + fec[:] * branch)) + fbias[:]
            contrib = (fb * fcoef[:]).reshape(in_d, out_d * K, B)
            contrib = jnp.sum(contrib, axis=0).reshape(out_d, K, B)
            y = y + jnp.sum(contrib, axis=1)               # (out, B)
            x = y
        return x

    return field


def _make_kernel(layer_dims, spline_order, gate_slope, alpha, n_knots,
                 D, T, max_steps, rtol, atol):
    field0 = _field_factory(layer_dims, spline_order, gate_slope, alpha,
                            n_knots)
    n_per_layer = 8
    A, Bw, BE = DOPRI5.a, DOPRI5.b, DOPRI5.b_err

    def kernel(x0_ref, ts_ref, *refs):
        out_ref = refs[-1]
        layer_refs = [refs[i * n_per_layer:(i + 1) * n_per_layer]
                      for i in range(len(layer_dims))]
        field = lambda x: field0(x, layer_refs)

        y0 = x0_ref[:]                                    # (D, B)
        ts_col = ts_ref[:]                                # (T, 1)
        t0 = ts_col[0, 0]
        t_final = ts_col[T - 1, 0]
        tiny = jnp.float32(1e-12)

        # Prefill output with y0 (index 0 is correct; tails filled later).
        for d in range(D):
            out_ref[d] = jnp.broadcast_to(y0[d:d + 1, :], out_ref[d].shape)

        f0 = field(y0)

        # ---- Hairer initial step, per lane (solvers/dopri5.py:55-78).
        def rms(v, ref):
            s = atol + rtol * jnp.abs(ref)
            return jnp.sqrt(jnp.mean((v / s) ** 2, axis=0, keepdims=True))

        d0 = rms(y0, y0)
        d1 = rms(f0, y0)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                       0.01 * d0 / jnp.maximum(d1, 1e-30))
        f1i = field(y0 + h0 * f0)
        d2 = rms(f1i - f0, y0) / h0
        dmax = jnp.maximum(d1, d2)
        h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3),
                       (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (_ORDER + 1)))
        dt0 = jnp.minimum(jnp.minimum(100.0 * h0, h1), t_final - t0)

        t = jnp.full((1, y0.shape[1]), t0, jnp.float32)
        errp = jnp.ones_like(t)

        def body(carry):
            n, t, dt, errp, y, f = carry
            finished = t >= t_final - tiny
            dt = jnp.where(finished, 0.0, jnp.minimum(dt, t_final - t))
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)

            # RK stage recursion, FSAL first stage (rk_common.py:48-83).
            ks = [f]
            for i in range(1, 7):
                incr = None
                for aij, kj in zip(A[i][:i], ks):
                    if aij == 0.0:
                        continue
                    incr = aij * kj if incr is None else incr + aij * kj
                ks.append(field(y + dt * incr))
            y1 = y
            for bi, ki in zip(Bw, ks):
                if bi != 0.0:
                    y1 = y1 + dt * (bi * ki)
            yerr = None
            for bi, ki in zip(BE, ks):
                if bi == 0.0:
                    continue
                yerr = bi * ki if yerr is None else yerr + bi * ki
            yerr = dt * yerr

            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            err = jnp.sqrt(jnp.mean((yerr / scale) ** 2, axis=0,
                                    keepdims=True))
            err = jnp.maximum(err, 1e-10)
            accept = (err <= 1.0) | finished

            fac_pi = _SAFETY * err ** (-_ALPHA) * errp ** _BETA
            fac_acc = jnp.clip(fac_pi, _DFACTOR, _IFACTOR)
            fac_rej = jnp.clip(_SAFETY * err ** (-1.0 / _ORDER), _DFACTOR, 1.0)
            dt_next = jnp.where(finished, 0.0,
                                dt_safe * jnp.where(accept, fac_acc, fac_rej))
            t_new = jnp.where(accept, t + dt, t)

            # Dense output (CONTD5; solvers/dopri5.py:81-110,186-196).
            dy = y1 - y
            r3 = dt * ks[0] - dy
            r4 = dy - dt * ks[6] - r3
            r5 = None
            for di, ki in zip(DOPRI5_DENSE_D, ks):
                if di == 0.0:
                    continue
                r5 = di * ki if r5 is None else r5 + di * ki
            r5 = dt * r5

            theta = jnp.clip((ts_col - t) / dt_safe, 0.0, 1.0)   # (T, B)
            th1 = 1.0 - theta
            write = (accept & (~finished) & (ts_col > t)
                     & (ts_col <= t + dt + tiny))                # (T, B)
            for d in range(D):
                dense = y[d:d + 1] + theta * (
                    dy[d:d + 1] + th1 * (r3[d:d + 1] + theta * (
                        r4[d:d + 1] + th1 * r5[d:d + 1])))
                out_ref[d] = jnp.where(write, dense, out_ref[d])

            adv = accept & ~finished
            return (n + 1,
                    t_new,
                    dt_next,
                    jnp.where(adv, err, errp),
                    jnp.where(adv, y1, y),
                    jnp.where(adv, ks[6], f))

        # while_loop (not fori): stop as soon as EVERY lane has reached
        # t_final — measured 512-step fori wastes the whole tail budget.
        def cond(carry):
            n, t = carry[0], carry[1]
            return (n < max_steps) & jnp.any(t < t_final - tiny)

        _, t, dt, errp, y, f = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t, dt0, errp, y0, f0))

        # Unreached tails hold the last reached state (dopri5.py:229-237).
        unreached = ts_col > t + tiny                            # (T, B)
        for d in range(D):
            out_ref[d] = jnp.where(unreached,
                                   jnp.broadcast_to(y[d:d + 1],
                                                    out_ref[d].shape),
                                   out_ref[d])

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "rtol", "atol",
                                             "max_steps", "interpret",
                                             "block_b"))
def pallas_kanfet_solve(params: Sequence[dict], cfg, x0s: jax.Array,
                        ts: jax.Array, *, rtol: float = 1e-7,
                        atol: float = 1e-9, max_steps: int = 512,
                        interpret: bool = False,
                        block_b: int = 512) -> jax.Array:
    """Solve the autonomous KANFET NODE for a batch of initial conditions.

    Args:
      params/cfg: a ``KANConfig`` stack where EVERY layer has the ferro
        branch and no logistic branch (the KANFET contract).
      x0s: (B, D) initial conditions; ts: (T,) increasing output times.
      block_b: trajectories per grid step — bounds VMEM residency, so
        arbitrary B works (B=2048 whole-batch OOMs the 16 MB scoped VMEM).

    Returns:
      (B, T, D) trajectories — same contract as
      ``vmap(lambda x0: predict(params, spec, x0, ts))`` in while mode.
    """
    cfgs = cfg.layers
    if any(c.ferro_num_basis == 0 or c.logistic_num_basis > 0 for c in cfgs):
        raise ValueError("pallas_kanfet_solve supports pure KANFET stacks "
                         "(ferro branch on, logistic off) only")
    D = cfgs[0].in_features
    if cfgs[-1].out_features != D:
        raise ValueError("NODE field must map D -> D")
    B, T = x0s.shape[0], ts.shape[0]
    f32 = jnp.float32

    # Pad B up to a block multiple; grid over batch blocks keeps VMEM
    # residency bounded (each block solves independently per lane anyway).
    bb = min(block_b, B) if B <= block_b else block_b
    n_blocks = -(-B // bb)
    B_pad = n_blocks * bb
    x0p = x0s.astype(f32)
    if B_pad != B:
        x0p = jnp.concatenate(
            [x0p, jnp.broadcast_to(x0p[-1:], (B_pad - B, x0p.shape[1]))], 0)

    layer_dims = tuple((c.in_features, c.out_features, c.ferro_num_basis)
                       for c in cfgs)
    n_knots = cfgs[0].grid_size + 2 * cfgs[0].spline_order + 1

    inputs = [x0p.T, ts.astype(f32)[:, None]]
    for p, c in zip(params, cfgs):
        sw = p["spline_weight"]
        if c.standalone_spline_scaler:
            sw = sw * p["spline_scaler"][..., None]
        fe = p["ferro"]
        N = c.in_features * c.out_features * c.ferro_num_basis
        inputs += [
            p["base_weight"].astype(f32),
            sw.reshape(c.out_features, -1).astype(f32),
            p["_buffers"]["grid"].astype(f32),
            fe["k"].reshape(N, 1).astype(f32),
            fe["ec"].reshape(N, 1).astype(f32),
            fe["ps"].reshape(N, 1).astype(f32),
            fe["bias"].reshape(N, 1).astype(f32),
            fe["coef"].reshape(N, 1).astype(f32),
        ]

    kernel = _make_kernel(layer_dims, cfgs[0].spline_order,
                          cfgs[0].ferro_gate_slope, cfgs[0].ferro_alpha,
                          n_knots, D, T, max_steps, rtol, atol)
    # Grid over batch blocks: x0 and the output are split on the lane
    # (batch) axis, every parameter block is broadcast to each grid step.
    in_specs = [pl.BlockSpec((D, bb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for a in inputs[1:]:
        in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=jax.ShapeDtypeStruct((D, T, B_pad), f32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((D, T, bb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return jnp.transpose(out[:, :, :B], (2, 1, 0)).astype(x0s.dtype)
