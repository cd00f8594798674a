"""Whole-solve Pallas kernel + in-kernel discrete adjoint for the ECG
ferro MLP-NODE latent field (models/ecg.py: ``kanfet_mlp_node_field``,
the rebuild of the reference's ``KanFet_MLP_NODE`` ODE function,
train_ecg.py:986-1059).

Why a second kernel next to ``ops/pallas_adjoint.py``: that kernel lays
ferro rows on SUBLANES and batch on LANES — right for the flagship's
small field (N=160) solved over hundreds of trajectories, pathological
for the ECG field, whose ferro row count per layer is
``in*out*K = 64*128*10 = 81,920`` while the training batch is 8.  In the
(N, B) layout every (N, 1)-ish array pads its lane dimension to 128, so
one layer's parameter set alone would occupy ~16 MB of VMEM.  This
kernel flips the layout:

* state is ``(B, D)`` — batch on sublanes (8 rows = exactly one tile),
  latent on lanes;
* ferro parameters are ``(out, in*K)`` — out-features on sublanes,
  ferro columns on lanes, zero padding waste at ECG shapes
  ((128, 640) = 320 KB per parameter array);
* the per-(in,K) field replication ``x -> x[l // K]`` rides the MXU as a
  0/1 repetition matmul (``x @ R^T``), and the reduction back
  (sum over K) is the transposed matmul (``xbar_lanes @ R``);
* batch is a short in-kernel ``fori_loop``: each iteration processes one
  sample's full (out, in*K) elementwise ferro block.

The dopri5 solve/replay scaffolding (global step control matching the
XLA path's error norm, frozen-mesh discrete adjoint) lives in
``ops/pallas_node_common.py``; this module contributes the field and its
hand VJP.  Only the final state is returned (the ECG solve evaluates
ts=[0, 1] and keeps ``traj[-1]``).

Hysteresis state is fresh-and-frozen during the solve (prev_x=0,
branch=+1), which collapses the branch target to ``1 - 2*(1-mu)*cn`` —
see ``_ferro_rows``.  Device noise (``noise_std > 0``) follows the XLA
dopri5 path's FROZEN-per-solve semantics (models/ecg.py:
``kanfet_mlp_node_field`` — an adaptive solver's error estimate cannot
budget a white-noise RHS): the draw happens OUTSIDE the kernel with the
same keys/shapes as ``ops/ferro.py: ferro_basis`` and rides in as two
extra VMEM inputs, added to the basis rows before the coef contraction.
The backward replay reuses the same arrays, so forward values reproduce
exactly; per the reference's ``noise.detach()`` only the coef gradient
sees the noise (additive, stop-gradient).

Field math citations: ops/ferro.py:113-187 (ferro basis + contraction),
models/ecg.py:202-218 (tanh bound / tanh link / nan scrub / slope clamp
armor, from the reference's train_ecg.py:1002-1011).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import (
    VMEM_LIMIT_BYTES,
    _dot,
    adaptive_solve_final,
    adjoint_replay,
    tableau_table,
    interpret_default,
)

_N_PRM = 5   # fk, fec, fps, fbias, fcoef — each (out, in*K)


def _ferro_rows(xf, prm, gate_slope, alpha):
    """Ferro forward terms on an (out, L) block with fresh frozen state.

    With branch_prev == +1 the switch target simplifies symbolically:
    ``su - sd + (1 - su - sd)*1 = 1 - 2*sd`` (the crossed-positive gate
    cancels), so only the down-switch path is computed.
    """
    fk, fec, fps, fbias, fcoef = prm
    mu = jax.nn.sigmoid(gate_slope * xf)
    cn = jax.nn.sigmoid(gate_slope * (-xf - fec))
    sd = (1.0 - mu) * cn
    beta = alpha + (1.0 - alpha) * (1.0 - 2.0 * sd)
    th = jnp.tanh(fk * (xf + fec * beta))
    fb = fps * th + fbias
    return mu, cn, beta, th, fb


def _make_fwd_kernel(dims1, dims2, B, D, hidden, gate_slope, alpha,
                     h_bound, dh_clip, max_steps, rtol, atol,
                     noisy=False):
    """Forward adaptive solve of [0,1] + per-attempt records."""
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    L1, L2 = in1 * K1, in2 * K2
    inv_hb = 1.0 / h_bound

    def kernel(h0_ref, tab_ref, r1_ref, r2_ref, *refs):
        prm1 = [r[:] for r in refs[:_N_PRM]]
        prm2 = [r[:] for r in refs[_N_PRM:2 * _N_PRM]]
        pos = 2 * _N_PRM
        nz1_ref = nz2_ref = None
        if noisy:
            nz1_ref, nz2_ref = refs[pos:pos + 2]
            pos += 2
        (out_ref, tda_ref, yrec_ref, krec_ref,
         misc_ref) = refs[pos:pos + 5]
        z_buf, dh_buf, ks_buf, xk1_buf, xk2_buf = refs[pos + 5:]

        ones1 = jnp.ones((1, L1), jnp.float32)
        ones2 = jnp.ones((1, L2), jnp.float32)

        def field(y):
            hb = h_bound * jnp.tanh(y * inv_hb)            # (B, D)
            # Mosaic has no dynamic_slice on VALUES — per-sample rows are
            # read back through scratch refs (pl.ds on refs lowers fine)
            xk1_buf[:] = _dot(hb, r1_ref[:], 1, 1)         # (B, L1)

            def b1(b, _):
                row = xk1_buf[pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out1, L1))
                _, _, _, _, fb = _ferro_rows(xf, prm1, gate_slope, alpha)
                if noisy:
                    fb = fb + nz1_ref[pl.ds(b, 1)][0]
                zb = _dot(ones1, fb * prm1[4], 1, 1)       # (1, out1)
                z_buf[pl.ds(b, 1), :] = jnp.tanh(zb)
                return 0

            jax.lax.fori_loop(0, B, b1, 0)
            z = z_buf[:]                                   # (B, hidden)
            xk2_buf[:] = _dot(z, r2_ref[:], 1, 1)          # (B, L2)

            def b2(b, _):
                row = xk2_buf[pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out2, L2))
                _, _, _, _, fb = _ferro_rows(xf, prm2, gate_slope, alpha)
                if noisy:
                    fb = fb + nz2_ref[pl.ds(b, 1)][0]
                dh_buf[pl.ds(b, 1), :] = _dot(ones2, fb * prm2[4], 1, 1)
                return 0

            jax.lax.fori_loop(0, B, b2, 0)
            return jnp.clip(dh_buf[:], -dh_clip, dh_clip)  # (B, D)

        adaptive_solve_final(field, h0_ref[:], tab_ref, out_ref, tda_ref,
                             yrec_ref, krec_ref, misc_ref, ks_buf, B, D,
                             max_steps, rtol, atol)

    return kernel


def _make_bwd_kernel(dims1, dims2, B, D, hidden, gate_slope, alpha,
                     h_bound, dh_clip, max_steps, noisy=False):
    """Reverse replay of recorded attempts; hand VJP of the ferro field."""
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    L1, L2 = in1 * K1, in2 * K2
    inv_hb = 1.0 / h_bound

    def kernel(ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref, tab_ref,
               r1_ref, r2_ref, *refs):
        prm1 = [r[:] for r in refs[:_N_PRM]]
        prm2 = [r[:] for r in refs[_N_PRM:2 * _N_PRM]]
        pos = 2 * _N_PRM
        nz1_ref = nz2_ref = None
        if noisy:
            nz1_ref, nz2_ref = refs[pos:pos + 2]
            pos += 2
        grads1 = refs[pos:pos + _N_PRM]
        grads2 = refs[pos + _N_PRM:pos + 2 * _N_PRM]
        h0bar_ref = refs[pos + 2 * _N_PRM]
        ub_buf, kbar_buf, xk1_buf = refs[pos + 2 * _N_PRM + 1:]

        for gr in list(grads1) + list(grads2):
            gr[:] = jnp.zeros_like(gr)

        ones1 = jnp.ones((1, L1), jnp.float32)
        ones2 = jnp.ones((1, L2), jnp.float32)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def bwd_layer(xf, rows, prm, grads, wcol, outs):
            """One sample's VJP through one ferro layer, reusing the
            FORWARD-pass ``rows = (mu, cn, beta, th, fb)`` (the
            transcendental block is evaluated once per layer per sample,
            not recomputed here).  When noisy, ``rows[4]`` is the NOISY
            basis — correct for ``g_fcoef`` (the only consumer; the
            reference's detached additive noise reaches exactly the coef
            gradient).  ``wcol`` is the (out, 1) output cotangent;
            returns the (1, L) lane cotangent of the layer's replicated
            input."""
            g_fk, g_fec, g_fps, g_fbias, g_fcoef = grads
            fk, fec, fps, fbias, fcoef = prm
            mu, cn, beta, th, fb = rows
            g_fcoef[:] += fb * wcol
            fbar = fcoef * wcol                          # (out, L)
            sech2 = 1.0 - th * th
            g_fps[:] += th * fbar
            g_fbias[:] += fbar
            g_fk[:] += fps * (xf + fec * beta) * sech2 * fbar
            gs1a = gate_slope * (1.0 - alpha)
            dbeta_dec = 2.0 * gs1a * (1.0 - mu) * cn * (1.0 - cn)
            dbeta_dx = 2.0 * gs1a * (1.0 - mu) * cn * (mu + 1.0 - cn)
            common = fps * fk * sech2 * fbar
            g_fec[:] += common * (beta + fec * dbeta_dec)
            xfbar = common * (1.0 + fec * dbeta_dx)      # (out, L)
            # row-sum over out -> (1, L) lane cotangent
            return _dot(jnp.ones((1, outs), jnp.float32), xfbar, 1, 0)

        def field_vjp(u, w):
            """Cotangent of the field at input u.  Per-sample chains are
            independent, so ONE fori_loop runs forward (layer1 -> tanh ->
            layer2) and immediately backward (clamp -> ferro2 -> tanh ->
            ferro1) with the ferro rows held live — half the
            transcendental work of a separate-recompute backward.
            Column/row duals of z and dh come from cheap extra matmuls
            against the ones vectors (Mosaic has no fast transpose)."""
            hb = h_bound * jnp.tanh(u * inv_hb)
            xk1_buf[:] = _dot(hb, r1_ref[:], 1, 1)         # (B, L1)

            def per_sample(b, _):
                # ---- forward, keeping the transcendental blocks
                row1 = xk1_buf[pl.ds(b, 1), :]
                xf1 = jnp.broadcast_to(row1, (out1, L1))
                rows1 = _ferro_rows(xf1, prm1, gate_slope, alpha)
                if noisy:
                    rows1 = rows1[:4] + (rows1[4] + nz1_ref[pl.ds(b, 1)][0],)
                fbc1 = rows1[4] * prm1[4]                  # fb * coef
                z_row = jnp.tanh(_dot(ones1, fbc1, 1, 1))  # (1, hidden)
                z_col = jnp.tanh(_dot(fbc1, ones1, 1, 1))  # (hidden, 1)
                row2 = _dot(z_row, r2_ref[:], 1, 1)        # (1, L2)
                xf2 = jnp.broadcast_to(row2, (out2, L2))
                rows2 = _ferro_rows(xf2, prm2, gate_slope, alpha)
                if noisy:
                    rows2 = rows2[:4] + (rows2[4] + nz2_ref[pl.ds(b, 1)][0],)
                dh_col = _dot(rows2[4] * prm2[4], ones2, 1, 1)  # (D, 1)

                # ---- backward (clamp passes gradient strictly inside)
                e_b = (iota_b == b).astype(jnp.float32)    # (B, 1)
                mask = ((dh_col > -dh_clip)
                        & (dh_col < dh_clip)).astype(jnp.float32)
                wcol2 = _dot(w, e_b, 0, 0) * mask          # (D, 1)
                lanes2 = bwd_layer(xf2, rows2, prm2, grads2, wcol2, out2)
                zbar_col = _dot(r2_ref[:], lanes2, 0, 1)   # (hidden, 1)
                wcol1 = zbar_col * (1.0 - z_col * z_col)   # tanh link
                lanes1 = bwd_layer(xf1, rows1, prm1, grads1, wcol1, out1)
                ub_buf[pl.ds(b, 1), :] = _dot(lanes1, r1_ref[:], 1, 0)
                return 0

            jax.lax.fori_loop(0, B, per_sample, 0)
            # bound chain: d hb/du = 1 - (hb/h_bound)^2
            return ub_buf[:] * (1.0 - (hb * inv_hb) ** 2)

        h0bar_ref[:] = adjoint_replay(field_vjp, ybar_ref[:], tab_ref,
                                      tda_ref, yrec_ref, krec_ref, n_att,
                                      kbar_buf, B, D)

    return kernel


def _make_fwd_kernel_vec(dims1, dims2, B, D, hidden, gate_slope, alpha,
                         h_bound, dh_clip, max_steps, rtol, atol,
                         noisy=False):
    """Batch-VECTORIZED forward solve: the per-sample fori_loop of
    :func:`_make_fwd_kernel` is replaced by 3-D (B, out, in*K) blocks —
    replication is a second-minor broadcast, the ferro transcendental
    chain is one big VPU op over all samples, and the coef contraction
    is a lane reduction.  Measured motive: halving the loop kernel's
    transcendental work did not move its throughput, so the B-iteration
    serialization, not VPU math, limits it (BASELINE.md ferro row)."""
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    L1, L2 = in1 * K1, in2 * K2
    inv_hb = 1.0 / h_bound

    def kernel(h0_ref, tab_ref, r1_ref, r2_ref, *refs):
        prm1 = [r[:][None] for r in refs[:_N_PRM]]         # (1, out, L)
        prm2 = [r[:][None] for r in refs[_N_PRM:2 * _N_PRM]]
        pos = 2 * _N_PRM
        nz1 = nz2 = None
        if noisy:
            nz1, nz2 = refs[pos][:], refs[pos + 1][:]      # (B, out, L)
            pos += 2
        (out_ref, tda_ref, yrec_ref, krec_ref,
         misc_ref) = refs[pos:pos + 5]
        ks_buf, = refs[pos + 5:]

        def field(y):
            hb = h_bound * jnp.tanh(y * inv_hb)            # (B, D)
            xk1 = _dot(hb, r1_ref[:], 1, 1)                # (B, L1)
            xf1 = jnp.broadcast_to(xk1[:, None, :], (B, out1, L1))
            _, _, _, _, fb = _ferro_rows(xf1, prm1, gate_slope, alpha)
            if noisy:
                fb = fb + nz1
            z = jnp.tanh(jnp.sum(fb * prm1[4], axis=2))    # (B, hidden)
            xk2 = _dot(z, r2_ref[:], 1, 1)                 # (B, L2)
            xf2 = jnp.broadcast_to(xk2[:, None, :], (B, out2, L2))
            _, _, _, _, fb2 = _ferro_rows(xf2, prm2, gate_slope, alpha)
            if noisy:
                fb2 = fb2 + nz2
            dh = jnp.sum(fb2 * prm2[4], axis=2)            # (B, D)
            return jnp.clip(dh, -dh_clip, dh_clip)

        adaptive_solve_final(field, h0_ref[:], tab_ref, out_ref, tda_ref,
                             yrec_ref, krec_ref, misc_ref, ks_buf, B, D,
                             max_steps, rtol, atol)

    return kernel


def _make_bwd_kernel_vec(dims1, dims2, B, D, hidden, gate_slope, alpha,
                         h_bound, dh_clip, max_steps, noisy=False):
    """Batch-vectorized reverse replay (see :func:`_make_fwd_kernel_vec`)."""
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    L1, L2 = in1 * K1, in2 * K2
    inv_hb = 1.0 / h_bound

    def kernel(ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref, tab_ref,
               r1_ref, r2_ref, *refs):
        prm1 = [r[:][None] for r in refs[:_N_PRM]]
        prm2 = [r[:][None] for r in refs[_N_PRM:2 * _N_PRM]]
        pos = 2 * _N_PRM
        nz1 = nz2 = None
        if noisy:
            nz1, nz2 = refs[pos][:], refs[pos + 1][:]
            pos += 2
        grads1 = refs[pos:pos + _N_PRM]
        grads2 = refs[pos + _N_PRM:pos + 2 * _N_PRM]
        h0bar_ref = refs[pos + 2 * _N_PRM]
        kbar_buf, = refs[pos + 2 * _N_PRM + 1:]

        for gr in list(grads1) + list(grads2):
            gr[:] = jnp.zeros_like(gr)
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def bwd_layer(xf, rows, prm, grads, w):
            """All samples' VJP through one ferro layer on (B, out, L)
            blocks; ``w`` is the (B, out) output cotangent.  ``rows[4]``
            is the noisy basis when noisy (sole consumer: g_fcoef, the
            reference's detached additive noise).  Returns the (B, L)
            input cotangent."""
            g_fk, g_fec, g_fps, g_fbias, g_fcoef = grads
            fk, fec, fps, fbias, fcoef = prm
            mu, cn, beta, th, fb = rows
            w3 = w[:, :, None]                             # (B, out, 1)
            fbar = fcoef * w3                              # (B, out, L)
            g_fcoef[:] += jnp.sum(fb * w3, axis=0)
            sech2 = 1.0 - th * th
            g_fps[:] += jnp.sum(th * fbar, axis=0)
            g_fbias[:] += jnp.sum(fbar, axis=0)
            g_fk[:] += jnp.sum(fps * (xf + fec * beta) * sech2 * fbar,
                               axis=0)
            gs1a = gate_slope * (1.0 - alpha)
            dbeta_dec = 2.0 * gs1a * (1.0 - mu) * cn * (1.0 - cn)
            dbeta_dx = 2.0 * gs1a * (1.0 - mu) * cn * (mu + 1.0 - cn)
            common = fps * fk * sech2 * fbar
            g_fec[:] += jnp.sum(common * (beta + fec * dbeta_dec), axis=0)
            xfbar = common * (1.0 + fec * dbeta_dx)        # (B, out, L)
            return jnp.sum(xfbar, axis=1)                  # (B, L)

        def field_vjp(u, w):
            hb = h_bound * jnp.tanh(u * inv_hb)
            xk1 = _dot(hb, r1_ref[:], 1, 1)                # (B, L1)
            xf1 = jnp.broadcast_to(xk1[:, None, :], (B, out1, L1))
            rows1 = _ferro_rows(xf1, prm1, gate_slope, alpha)
            if noisy:
                rows1 = rows1[:4] + (rows1[4] + nz1,)
            zs = jnp.sum(rows1[4] * prm1[4], axis=2)       # (B, hidden)
            z = jnp.tanh(zs)
            xk2 = _dot(z, r2_ref[:], 1, 1)                 # (B, L2)
            xf2 = jnp.broadcast_to(xk2[:, None, :], (B, out2, L2))
            rows2 = _ferro_rows(xf2, prm2, gate_slope, alpha)
            if noisy:
                rows2 = rows2[:4] + (rows2[4] + nz2,)
            dh = jnp.sum(rows2[4] * prm2[4], axis=2)       # (B, D)

            mask = ((dh > -dh_clip) & (dh < dh_clip)).astype(jnp.float32)
            lanes2 = bwd_layer(xf2, rows2, prm2, grads2, w * mask)
            zbar = _dot(lanes2, r2_ref[:], 1, 0)           # (B, hidden)
            lanes1 = bwd_layer(xf1, rows1, prm1, grads1,
                               zbar * (1.0 - z * z))
            ub = _dot(lanes1, r1_ref[:], 1, 0)             # (B, D)
            return ub * (1.0 - (hb * inv_hb) ** 2)

        h0bar_ref[:] = adjoint_replay(field_vjp, ybar_ref[:], tab_ref,
                                      tda_ref, yrec_ref, krec_ref, n_att,
                                      kbar_buf, B, D)

    return kernel


def _flatten_ferro(fp, dims):
    """(in, out, K) param dict -> (out, in*K) kernel arrays, lane order
    l = i*K + k."""
    in_d, out_d, K = dims
    f32 = jnp.float32

    def r(a):
        return jnp.transpose(a, (1, 0, 2)).reshape(out_d, in_d * K).astype(f32)

    return [r(fp["k"]), r(fp["ec"]), r(fp["ps"]), r(fp["bias"]),
            r(fp["coef"])]


def _unflatten_ferro(grads, dims, like):
    in_d, out_d, K = dims
    names = ["k", "ec", "ps", "bias", "coef"]
    return {n: jnp.transpose(g.reshape(out_d, in_d, K), (1, 0, 2)).astype(
        like[n].dtype) for n, g in zip(names, grads)}


def _repeat_mat(in_d, K):
    return jnp.repeat(jnp.eye(in_d, dtype=jnp.float32), K, axis=0)


@functools.lru_cache(maxsize=16)
def make_ferro_node_solver(dims1, dims2, gate_slope=10.0, alpha=0.8,
                           h_bound=1.0, dh_clip=50.0, rtol=1e-2,
                           atol=1e-3, max_steps=16, interpret=False,
                           noisy=False, batch_vec=False):
    """Differentiable whole-solve for the 2-ferro-layer latent field.

    Returns ``solve(fc1, fc2, h0) -> hT`` ((B, D) -> (B, D), solve over
    t in [0, 1]) with a custom VJP (discrete adjoint, frozen mesh).
    ``fc1``/``fc2`` are the ferro param dicts of models/ecg.py;
    ``dims*`` are (in, out, K) tuples.  With ``noisy=True`` the
    signature becomes ``solve(fc1, fc2, h0, nz1, nz2)`` where ``nz*``
    are frozen per-solve device-noise blocks shaped (B, out, in*K)
    (std already multiplied in; see :func:`pallas_ferro_node_solve`).
    """
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    if in2 != out1 or out2 != in1:
        raise ValueError("field must map D -> hidden -> D")
    D, hidden = in1, out1
    f32 = jnp.float32
    M = max_steps
    # the noisy variant adds two (B, out, in*K) blocks to both kernels'
    # operand set, and the batch-vectorized layout stacks 3-D ferro
    # temporaries — lift Mosaic's default 16 MB scoped-vmem limit (the
    # physical bound still applies; see ops/pallas_mlp_node.py)
    cparams = (pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
               if (noisy or batch_vec) else None)

    def _prep(fc1, fc2):
        return (_flatten_ferro(fc1, dims1) + _flatten_ferro(fc2, dims2),
                _repeat_mat(in1, K1), _repeat_mat(in2, K2))

    def _noise_args(nz):
        return [a.astype(f32) for a in nz] if noisy else []

    def _fwd_call(fc1, fc2, h0, *nz):
        B = h0.shape[0]
        flat, r1, r2 = _prep(fc1, fc2)
        maker = _make_fwd_kernel_vec if batch_vec else _make_fwd_kernel
        kernel = maker(dims1, dims2, B, D, hidden, gate_slope,
                       alpha, h_bound, dh_clip, M, rtol, atol,
                       noisy=noisy)
        inputs = ([h0.astype(f32), tableau_table(), r1, r2] + flat
                  + _noise_args(nz))
        out_shapes = [
            jax.ShapeDtypeStruct((B, D), f32),           # hT
            jax.ShapeDtypeStruct((M, 4), f32),           # dt/adv/t records
            jax.ShapeDtypeStruct((M, B, D), f32),        # y per attempt
            jax.ShapeDtypeStruct((M, 7, B, D), f32),     # ks per attempt
            jax.ShapeDtypeStruct((1, 4), f32),           # n_att, t_end
        ]
        if batch_vec:
            scratch = [pltpu.VMEM((7 * B, D), f32)]      # ks only
        else:
            scratch = [pltpu.VMEM((B, hidden), f32),     # z
                       pltpu.VMEM((B, D), f32),          # dh
                       pltpu.VMEM((7 * B, D), f32),      # ks
                       pltpu.VMEM((B, in1 * K1), f32),   # xk1
                       pltpu.VMEM((B, in2 * K2), f32)]   # xk2
        hT, tda, yrec, krec, misc = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(*inputs)
        return hT, (tda, yrec, krec, misc)

    def _bwd_call(fc1, fc2, recs, ct, *nz):
        tda, yrec, krec, misc = recs
        B = ct.shape[0]
        flat, r1, r2 = _prep(fc1, fc2)
        maker = _make_bwd_kernel_vec if batch_vec else _make_bwd_kernel
        kernel = maker(dims1, dims2, B, D, hidden, gate_slope,
                       alpha, h_bound, dh_clip, M, noisy=noisy)
        inputs = ([ct.astype(f32), tda, yrec, krec, misc,
                   tableau_table(), r1, r2] + flat + _noise_args(nz))
        out_shapes = (
            [jax.ShapeDtypeStruct((out1, in1 * K1), f32)] * _N_PRM
            + [jax.ShapeDtypeStruct((out2, in2 * K2), f32)] * _N_PRM
            + [jax.ShapeDtypeStruct((B, D), f32)])
        if batch_vec:
            scratch = [pltpu.VMEM((7 * B, D), f32)]      # kbar only
        else:
            scratch = [pltpu.VMEM((B, D), f32),          # ubar
                       pltpu.VMEM((7 * B, D), f32),      # kbar
                       pltpu.VMEM((B, in1 * K1), f32)]   # xk1
        results = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * len(out_shapes),
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(*inputs)
        g1 = _unflatten_ferro(results[:_N_PRM], dims1, fc1)
        g2 = _unflatten_ferro(results[_N_PRM:2 * _N_PRM], dims2, fc2)
        return g1, g2, results[-1]

    @jax.custom_vjp
    def solve(fc1, fc2, h0, *nz):
        hT, _ = _fwd_call(fc1, fc2, h0, *nz)
        return hT.astype(h0.dtype)

    def fwd(fc1, fc2, h0, *nz):
        hT, recs = _fwd_call(fc1, fc2, h0, *nz)
        return hT.astype(h0.dtype), (fc1, fc2, h0, recs, nz)

    def bwd(res, ct):
        fc1, fc2, h0, recs, nz = res
        g1, g2, h0bar = _bwd_call(fc1, fc2, recs, ct, *nz)
        # device noise is stop-gradient (the reference's noise.detach())
        return (g1, g2, h0bar.astype(h0.dtype),
                *(jnp.zeros_like(a) for a in nz))

    solve.defvjp(fwd, bwd)
    solve.fwd_with_records = _fwd_call   # test hook (frozen-mesh oracle)
    return solve


def pallas_ferro_node_solve_sharded(fc1, fc2, h0, spec, mesh, *,
                                    axis="data", interpret=None,
                                    noise_key=None):
    """Data-parallel whole-solve over a device mesh: each device runs the
    in-kernel adjoint on its batch shard (``shard_map`` over ``axis``);
    parameters are replicated and the shard_map transpose psums their
    gradients.  ``h0`` batch must divide the axis size.  Device noise
    (``spec.noise_std > 0``) requires ``noise_key``; the frozen per-solve
    blocks are drawn for the GLOBAL batch (same keys and values as the
    single-device path) and sharded alongside ``h0``."""
    if interpret is None:
        interpret = interpret_default()
    from jax.sharding import PartitionSpec as P

    if h0.shape[0] % mesh.shape[axis]:
        raise ValueError(f"batch {h0.shape[0]} not divisible by "
                         f"{axis}={mesh.shape[axis]}")
    noisy = spec.noise_std > 0.0
    if noisy and noise_key is None:
        raise ValueError("noise_std > 0 requires a noise_key")
    c1, c2 = spec.fc1_cfg, spec.fc2_cfg
    fn = make_ferro_node_solver(
        (c1.in_dim, c1.out_dim, c1.num_basis),
        (c2.in_dim, c2.out_dim, c2.num_basis),
        gate_slope=c1.gate_slope, alpha=c1.alpha, h_bound=spec.h_bound,
        dh_clip=spec.dh_clip, rtol=spec.rtol, atol=spec.atol,
        max_steps=spec.max_steps, interpret=interpret, noisy=noisy,
        batch_vec=getattr(spec, "pallas_layout", "loop") == "vec")
    nz = (_spec_solve_noise(fc1, fc2, h0, c1, c2, noise_key)
          if noisy else ())
    solve = jax.shard_map(lambda a, b, h, *n: fn(a, b, h, *n), mesh=mesh,
                          in_specs=(P(), P(), P(axis)) + (P(axis),) * len(nz),
                          out_specs=P(axis), check_vma=False)
    return solve(fc1, fc2, h0, *nz)


def frozen_solve_noise(noise_key, B, cfg1, cfg2, dtype=jnp.float32,
                       noise_std=None):
    """Draw the frozen per-solve device noise for both ferro layers in
    kernel layout, bit-identical to the XLA dopri5 path: the model splits
    ``noise_key`` into per-layer keys (models/ecg.py:
    ``kanfet_mlp_node_apply``) and ``ops/ferro.py: ferro_basis`` draws
    ``normal(key, (B, in, out, K))``.  Transposed to (B, out, in*K).

    ``dtype`` must be the XLA path's basis dtype (a single dtype or one
    per layer): ``jax.random.normal`` consumes different bit budgets per
    dtype, so an f32 draw is NOT the rounded f64 draw (bit-different
    values under x64 test configs).

    ``noise_std``: optional TRACED override of each layer's static
    ``cfg.noise_std`` — the scale rides into the kernel inside the
    pre-scaled noise operand, so a population (``vmap``-ed member) run
    can carry a different device-noise level per member on the kernel
    path without recompiling (``ops/ferro.py: ferro_apply`` is the XLA
    analogue; multiplication matches it bit-for-bit)."""
    ks = jax.random.split(noise_key)
    dtypes = dtype if isinstance(dtype, (tuple, list)) else (dtype, dtype)
    out = []
    for k, cfg, dt in zip(ks, (cfg1, cfg2), dtypes):
        n = jax.random.normal(
            k, (B, cfg.in_dim, cfg.out_dim, cfg.num_basis), dt)
        std = cfg.noise_std if noise_std is None else noise_std
        out.append((std * jnp.transpose(n, (0, 2, 1, 3)).reshape(
            B, cfg.out_dim, cfg.in_dim * cfg.num_basis)).astype(jnp.float32))
    return tuple(out)


def pallas_ferro_node_solve(fc1, fc2, h0, spec, *, noise_key=None,
                            noise_std=None, interpret=None):
    """Solve the ``KanFetMLPNODESpec`` latent ODE with the in-kernel
    adjoint.  ``spec`` must be a dopri5 config; device noise
    (``noise_std > 0``) requires ``noise_key`` and follows the XLA path's
    frozen-per-solve semantics (same keys, same draws).
    ``interpret=None`` auto-selects interpret mode on the CPU backend.

    ``noise_std``: optional TRACED override of ``spec.noise_std`` — the
    kernel is compiled in its noisy form and the traced scale enters via
    the pre-scaled noise operands (``frozen_solve_noise``), so a vmapped
    population can put EVERY (noise_std, seed) member on the kernel path
    in one program (a std-0 member rides zero-valued blocks).
    """
    if interpret is None:
        interpret = interpret_default()
    noisy = spec.noise_std > 0.0 or noise_std is not None
    if noisy and noise_key is None:
        raise ValueError("noise_std > 0 requires a noise_key")
    c1, c2 = spec.fc1_cfg, spec.fc2_cfg
    fn = make_ferro_node_solver(
        (c1.in_dim, c1.out_dim, c1.num_basis),
        (c2.in_dim, c2.out_dim, c2.num_basis),
        gate_slope=c1.gate_slope, alpha=c1.alpha, h_bound=spec.h_bound,
        dh_clip=spec.dh_clip, rtol=spec.rtol, atol=spec.atol,
        max_steps=spec.max_steps, interpret=interpret, noisy=noisy,
        batch_vec=getattr(spec, "pallas_layout", "loop") == "vec")
    if not noisy:
        return fn(fc1, fc2, h0)
    nz1, nz2 = _spec_solve_noise(fc1, fc2, h0, c1, c2, noise_key,
                                 noise_std=noise_std)
    return fn(fc1, fc2, h0, nz1, nz2)


def _spec_solve_noise(fc1, fc2, h0, c1, c2, noise_key, noise_std=None):
    """Frozen per-solve draws in the XLA path's per-layer basis dtypes:
    layer 1's basis promotes (h0, fc1 params); layer 2's input carries
    that dtype and promotes with fc2's params (models/ecg.py:
    ``kanfet_mlp_node_field``)."""
    dt1 = jnp.result_type(h0, *jax.tree_util.tree_leaves(fc1))
    dt2 = jnp.result_type(dt1, *jax.tree_util.tree_leaves(fc2))
    return frozen_solve_noise(noise_key, h0.shape[0], c1, c2,
                              dtype=(dt1, dt2), noise_std=noise_std)
