"""In-kernel discrete adjoint for the whole-solve Pallas NODE kernel.

``pallas_kanfet_solve_train`` is a differentiable (``jax.custom_vjp``)
version of ``ops.pallas_node.pallas_kanfet_solve``: the forward pass is
one Pallas kernel that integrates the KANFET field with adaptive dopri5
AND records every solver attempt (t, dt, accepted-flag, state, all seven
RK stages); the backward pass is a SECOND Pallas kernel that replays the
recorded attempts in reverse with a hand-written VJP of the KANFET field,
accumulating parameter gradients in VMEM.

Semantics — **discrete adjoint on the frozen step sequence**: gradients
are exact for the realized discrete map holding the accepted/rejected
step mesh fixed.  The XLA checkpointed-scan path additionally
differentiates the PI step-size controller chain (dt_{i+1} depends on the
local error, which depends on the state); that contribution is dropped
here, exactly as in classical discrete-adjoint ODE training
(torchdiffeq-style).  ``tests/test_pallas_adjoint.py`` checks the hand
VJP against autodiff of a frozen-mesh XLA replay (machine-precision
oracle) and against the full scan-mode gradients (estimator closeness).

Why: the flagship train step is backward-dominated (measured on v5e:
XLA scan forward 3.3 ms, Pallas forward 1.9 ms, XLA forward+backward
12.4 ms at the north-star config).  The backward XLA scan pays all
``max_steps`` masked iterations plus remat; this kernel replays only the
attempts that actually happened.

Field math and solver constants mirror ``ops/pallas_node.py`` (see the
reference citations there: ops/bsplines.py:46-75, nn/kan.py:144-196,
ops/ferro.py:113-163, solvers/dopri5.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import interpret_default
from fetode_tpu.solvers.tableaux import DOPRI5, DOPRI5_DENSE_D

_ORDER = 5
_BETA = 0.04
_ALPHA = 1.0 / _ORDER - 0.75 * _BETA
_SAFETY = 0.9
_IFACTOR = 10.0
_DFACTOR = 0.2

_N_PER_LAYER = 8   # base_w, sw2, grid, fk, fec, fps, fbias, fcoef
_N_GRAD = 7        # base_w, sw2, fk, fec, fps, fbias, fcoef (no grid)


def _dot(a, b, ca, cb):
    """lax.dot_general contracting a[ca] with b[cb] — full f32 MXU
    precision.  The default (bf16 passes) is NOT enough here: adaptive
    error control compares the 4th/5th-order embedded solutions, and bf16
    matmul noise floors the error estimate near err~1, so dt can never
    grow (measured on v5e: the solver oscillates at dt~1e-2 and burns the
    whole step budget on a window the f32 path crosses in 18 steps)."""
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _spline_with_deriv(x, grid_ref, p, n_knots):
    """Cox-de Boor bases of order ``p`` AND their x-derivative.

    x: (in, B); returns (bases_p, dbases_p), both (in, C, B) with
    C = n_knots - 1 - p.  dB_{i,p}/dx = p*(B_{i,p-1}/(g_{i+p}-g_i)
    - B_{i+1,p-1}/(g_{i+p+1}-g_{i+1})).
    """
    g3 = grid_ref[:][:, :, None]
    xe = x[:, None, :]
    bases = jnp.logical_and(xe >= g3[:, :-1], xe < g3[:, 1:]).astype(x.dtype)
    for k in range(1, p):
        ln = xe - g3[:, : -(k + 1)]
        ld = g3[:, k:-1] - g3[:, : -(k + 1)]
        rn = g3[:, k + 1:] - xe
        rd = g3[:, k + 1:] - g3[:, 1:-k]
        bases = (ln / ld) * bases[:, :-1] + (rn / rd) * bases[:, 1:]
    # final order p from the saved order p-1
    ln = xe - g3[:, : -(p + 1)]
    ld = g3[:, p:-1] - g3[:, : -(p + 1)]
    rn = g3[:, p + 1:] - xe
    rd = g3[:, p + 1:] - g3[:, 1:-p]
    bases_p = (ln / ld) * bases[:, :-1] + (rn / rd) * bases[:, 1:]
    dbases_p = float(p) * (bases[:, :-1] / ld - bases[:, 1:] / rd)
    return bases_p, dbases_p


def _ferro_terms(xf, fec, gate_slope, alpha):
    """Shared ferro forward terms on (N, B) with fresh frozen state
    (prev_x=0, branch_prev=+1).  With branch_prev == 1 the target
    simplifies EXACTLY: target = su - sd + (1-su-sd) = 1 - 2*sd."""
    mu = jax.nn.sigmoid(gate_slope * xf)
    cn = jax.nn.sigmoid(gate_slope * (-xf - fec))
    sd = (1.0 - mu) * cn
    beta = alpha + (1.0 - alpha) * (1.0 - 2.0 * sd)
    return mu, cn, beta


def _layer_forward(x, refs, dims, p, n_knots, gate_slope, alpha):
    in_d, out_d, K = dims
    base_w, sw2, grid, fk, fec, fps, fbias, fcoef = refs
    B = x.shape[-1]
    y = _dot(base_w[:], jax.nn.silu(x), 1, 0)
    bases_p, _ = _spline_with_deriv(x, grid, p, n_knots)
    C = n_knots - 1 - p
    y = y + _dot(sw2[:], bases_p.reshape(in_d * C, B), 1, 0)
    N = in_d * out_d * K
    xf = jnp.broadcast_to(x[:, None, :], (in_d, out_d * K, B)).reshape(N, B)
    _, _, beta = _ferro_terms(xf, fec[:], gate_slope, alpha)
    fb = fps[:] * jnp.tanh(fk[:] * (xf + fec[:] * beta)) + fbias[:]
    contrib = (fb * fcoef[:]).reshape(in_d, out_d * K, B)
    return y + jnp.sum(contrib, axis=0).reshape(out_d, K, B).sum(axis=1)


def _layer_vjp(x, ybar, refs, grad_refs, dims, p, n_knots, gate_slope,
               alpha):
    """Backward of one KANFET layer.  Recomputes forward intermediates
    from the saved layer input ``x`` (in, B), accumulates parameter
    gradients into ``grad_refs`` and returns xbar (in, B)."""
    in_d, out_d, K = dims
    base_w, sw2, grid, fk, fec, fps, fbias, fcoef = refs
    g_bw, g_sw2, g_fk, g_fec, g_fps, g_fbias, g_fcoef = grad_refs
    B = x.shape[-1]

    # ---- base branch
    sig = jax.nn.sigmoid(x)
    s = x * sig
    g_bw[:] += _dot(ybar, s, 1, 1)                       # (out, in)
    sbar = _dot(base_w[:], ybar, 0, 0)                   # (in, B)
    xbar = sbar * (sig * (1.0 + x * (1.0 - sig)))        # silu'

    # ---- spline branch
    bases_p, dbases_p = _spline_with_deriv(x, grid, p, n_knots)
    C = n_knots - 1 - p
    bflat = bases_p.reshape(in_d * C, B)
    g_sw2[:] += _dot(ybar, bflat, 1, 1)                  # (out, in*C)
    gb = _dot(sw2[:], ybar, 0, 0).reshape(in_d, C, B)    # bases cotangent
    xbar = xbar + jnp.sum(gb * dbases_p, axis=1)

    # ---- ferro branch
    N = in_d * out_d * K
    xf = jnp.broadcast_to(x[:, None, :], (in_d, out_d * K, B)).reshape(N, B)
    ec = fec[:]
    mu, cn, beta = _ferro_terms(xf, ec, gate_slope, alpha)
    z = fk[:] * (xf + ec * beta)
    th = jnp.tanh(z)
    fb = fps[:] * th + fbias[:]
    # yhat: ybar broadcast to (N, B) over (in, K)
    yhat = jnp.broadcast_to(ybar[:, None, :], (out_d, K, B)).reshape(
        out_d * K, B)
    yhat = jnp.broadcast_to(yhat[None], (in_d, out_d * K, B)).reshape(N, B)
    g_fcoef[:] += jnp.sum(fb * yhat, axis=1, keepdims=True)
    fbar = fcoef[:] * yhat
    sech2 = 1.0 - th * th
    g_fps[:] += jnp.sum(th * fbar, axis=1, keepdims=True)
    g_fbias[:] += jnp.sum(fbar, axis=1, keepdims=True)
    g_fk[:] += jnp.sum(fps[:] * (xf + ec * beta) * sech2 * fbar, axis=1,
                       keepdims=True)
    gs1a = gate_slope * (1.0 - alpha)
    # d beta / d ec = 2*g*(1-alpha)*(1-mu)*cn*(1-cn)
    dbeta_dec = 2.0 * gs1a * (1.0 - mu) * cn * (1.0 - cn)
    # d beta / d xf = 2*g*(1-alpha)*(1-mu)*cn*(mu + 1 - cn)
    dbeta_dx = 2.0 * gs1a * (1.0 - mu) * cn * (mu + 1.0 - cn)
    common = fps[:] * fk[:] * sech2 * fbar
    g_fec[:] += jnp.sum(common * (beta + ec * dbeta_dec), axis=1,
                        keepdims=True)
    xfbar = common * (1.0 + ec * dbeta_dx)
    xbar = xbar + jnp.sum(xfbar.reshape(in_d, out_d * K, B), axis=1)
    return xbar


def _tableau_table():
    """(7, 12) runtime coefficient table for the stage-LOOPED kernels:
    cols 0..5 = A[j][l] (strictly lower triangular, zeros elsewhere),
    col 7 = b_j, col 8 = b_err_j, col 9 = dense d_j.  A full 7-term
    contraction with these rows equals the per-stage partial sums — the
    zero coefficients make masks unnecessary."""
    import numpy as np

    tab = np.zeros((7, 12), np.float32)
    for j in range(7):
        for l, a in enumerate(DOPRI5.a[j][:j]):
            tab[j, l] = a
        tab[j, 7] = DOPRI5.b[j]
        tab[j, 8] = DOPRI5.b_err[j]
        tab[j, 9] = DOPRI5_DENSE_D[j]
    return jnp.asarray(tab)


def _make_fwd_kernel(layer_dims, p, gate_slope, alpha, n_knots, D, T,
                     max_steps, rtol, atol, stage_loop=False):
    """Forward solve + per-attempt records (t, dt, adv, y, all 7 stages).

    ``stage_loop``: run the RK stage recursion as an in-kernel
    ``fori_loop`` over a runtime tableau table with the stage values in a
    VMEM scratch buffer, instead of fully unrolling 6 field evals.  The
    unrolled form is fastest for small fields but its code size crashes
    the Mosaic compiler once the ferro row count reaches ~1024
    (measured: [2,32,2] compiles, [2,64,2] does not); the looped form
    compiles one field body regardless of width.
    """
    A, Bw, BE = DOPRI5.a, DOPRI5.b, DOPRI5.b_err
    n_layers = len(layer_dims)

    def field(x, layer_refs):
        for dims, refs in zip(layer_dims, layer_refs):
            x = _layer_forward(x, refs, dims, p, n_knots, gate_slope, alpha)
        return x

    def kernel(x0_ref, ts_ref, *refs):
        out_ref, tda_ref, yrec_ref, krec_ref, misc_ref = refs[-5:]
        layer_refs = [refs[i * _N_PER_LAYER:(i + 1) * _N_PER_LAYER]
                      for i in range(n_layers)]
        f = lambda x: field(x, layer_refs)

        y0 = x0_ref[:]
        ts_col = ts_ref[:]
        t0 = ts_col[0, 0]
        t_final = ts_col[T - 1, 0]
        tiny = jnp.float32(1e-12)
        Bn = y0.shape[1]

        tda_ref[:] = jnp.zeros_like(tda_ref)
        for d in range(D):
            out_ref[d] = jnp.broadcast_to(y0[d:d + 1, :], out_ref[d].shape)

        f0 = f(y0)

        def rms(v, ref):
            s = atol + rtol * jnp.abs(ref)
            return jnp.sqrt(jnp.mean((v / s) ** 2, axis=0, keepdims=True))

        d0 = rms(y0, y0)
        d1 = rms(f0, y0)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                       0.01 * d0 / jnp.maximum(d1, 1e-30))
        f1i = f(y0 + h0 * f0)
        d2 = rms(f1i - f0, y0) / h0
        dmax = jnp.maximum(d1, d2)
        h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3),
                       (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (_ORDER + 1)))
        dt0 = jnp.minimum(jnp.minimum(100.0 * h0, h1), t_final - t0)

        t = jnp.full((1, Bn), t0, jnp.float32)
        errp = jnp.ones_like(t)

        def body(carry):
            m, t, dt, errp, y, fv = carry
            finished = t >= t_final - tiny
            dt = jnp.where(finished, 0.0, jnp.minimum(dt, t_final - t))
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)

            ks = [fv]
            for i in range(1, 7):
                incr = None
                for aij, kj in zip(A[i][:i], ks):
                    if aij == 0.0:
                        continue
                    incr = aij * kj if incr is None else incr + aij * kj
                ks.append(f(y + dt * incr))
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
            adv = accept & ~finished

            # ---- attempt records (the frozen mesh the backward replays)
            advf = adv.astype(jnp.float32)
            tda_ref[0, pl.ds(m, 1), :] = t
            tda_ref[1, pl.ds(m, 1), :] = dt
            tda_ref[2, pl.ds(m, 1), :] = advf
            for d in range(D):
                yrec_ref[d, pl.ds(m, 1), :] = y[d:d + 1]
                for j in range(7):
                    krec_ref[j * D + d, pl.ds(m, 1), :] = ks[j][d:d + 1]

            # ---- dense output (CONTD5)
            dy = y1 - y
            r3 = dt * ks[0] - dy
            r4 = dy - dt * ks[6] - r3
            r5 = None
            for di, ki in zip(DOPRI5_DENSE_D, ks):
                if di == 0.0:
                    continue
                r5 = di * ki if r5 is None else r5 + di * ki
            r5 = dt * r5

            theta = jnp.clip((ts_col - t) / dt_safe, 0.0, 1.0)
            th1 = 1.0 - theta
            write = (adv & (ts_col > t) & (ts_col <= t + dt + tiny))
            for d in range(D):
                dense = y[d:d + 1] + theta * (
                    dy[d:d + 1] + th1 * (r3[d:d + 1] + theta * (
                        r4[d:d + 1] + th1 * r5[d:d + 1])))
                out_ref[d] = jnp.where(write, dense, out_ref[d])

            return (m + 1,
                    t_new,
                    dt_next,
                    jnp.where(adv, err, errp),
                    jnp.where(adv, y1, y),
                    jnp.where(adv, ks[6], fv))

        def cond(carry):
            m, t = carry[0], carry[1]
            return (m < max_steps) & jnp.any(t < t_final - tiny)

        m, t, dt, errp, y, fv = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t, dt0, errp, y0, f0))

        unreached = ts_col > t + tiny
        for d in range(D):
            out_ref[d] = jnp.where(unreached,
                                   jnp.broadcast_to(y[d:d + 1],
                                                    out_ref[d].shape),
                                   out_ref[d])
        misc_ref[0] = t                                   # final time per lane
        misc_ref[1] = jnp.full((1, Bn), m.astype(jnp.float32))

    if not stage_loop:
        return kernel

    def kernel_sl(x0_ref, ts_ref, *refs):
        ks_buf = refs[-1]                                  # VMEM scratch
        out_ref, tda_ref, yrec_ref, krec_ref, misc_ref = refs[-6:-1]
        tab_ref = refs[n_layers * _N_PER_LAYER]
        layer_refs = [refs[i * _N_PER_LAYER:(i + 1) * _N_PER_LAYER]
                      for i in range(n_layers)]
        f = lambda x: field(x, layer_refs)

        y0 = x0_ref[:]
        ts_col = ts_ref[:]
        t0 = ts_col[0, 0]
        t_final = ts_col[T - 1, 0]
        tiny = jnp.float32(1e-12)
        Bn = y0.shape[1]

        tda_ref[:] = jnp.zeros_like(tda_ref)
        ks_buf[:] = jnp.zeros_like(ks_buf)   # 0*uninit would be NaN
        for d in range(D):
            out_ref[d] = jnp.broadcast_to(y0[d:d + 1, :], out_ref[d].shape)

        f0 = f(y0)

        def rms(v, ref):
            s = atol + rtol * jnp.abs(ref)
            return jnp.sqrt(jnp.mean((v / s) ** 2, axis=0, keepdims=True))

        d0 = rms(y0, y0)
        d1 = rms(f0, y0)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                       0.01 * d0 / jnp.maximum(d1, 1e-30))
        f1i = f(y0 + h0 * f0)
        d2 = rms(f1i - f0, y0) / h0
        dmax = jnp.maximum(d1, d2)
        h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3),
                       (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (_ORDER + 1)))
        dt0 = jnp.minimum(jnp.minimum(100.0 * h0, h1), t_final - t0)

        t = jnp.full((1, Bn), t0, jnp.float32)
        errp = jnp.ones_like(t)

        def body(carry):
            m, t, dt, errp, y, fv = carry
            finished = t >= t_final - tiny
            dt = jnp.where(finished, 0.0, jnp.minimum(dt, t_final - t))
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)

            # ---- stage loop (k1 = FSAL carry seeds row 0)
            ks_buf[pl.ds(0, D)] = fv
            row0 = tab_ref[pl.ds(0, 1), :]
            acc0 = (y + (dt * row0[0, 7]) * fv, row0[0, 8] * fv,
                    row0[0, 9] * fv)

            def stage(j, acc):
                y1a, yea, r5a = acc
                row = tab_ref[pl.ds(j, 1), :]
                incr = row[0, 0] * ks_buf[pl.ds(0, D)]
                for l in range(1, 6):
                    incr = incr + row[0, l] * ks_buf[pl.ds(l * D, D)]
                kj = f(y + dt * incr)
                ks_buf[pl.ds(j * D, D)] = kj
                return (y1a + (dt * row[0, 7]) * kj,
                        yea + row[0, 8] * kj,
                        r5a + row[0, 9] * kj)

            y1, yerr_s, r5s = jax.lax.fori_loop(1, 7, stage, acc0)
            yerr = dt * yerr_s
            k7 = ks_buf[pl.ds(6 * D, D)]

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
            adv = accept & ~finished

            # ---- attempt records (bulk stage copy)
            tda_ref[0, pl.ds(m, 1), :] = t
            tda_ref[1, pl.ds(m, 1), :] = dt
            tda_ref[2, pl.ds(m, 1), :] = adv.astype(jnp.float32)
            for d in range(D):
                yrec_ref[d, pl.ds(m, 1), :] = y[d:d + 1]
            krec_ref[:, pl.ds(m, 1), :] = ks_buf[:][:, None, :]

            # ---- dense output (CONTD5)
            dy = y1 - y
            r3 = dt * fv - dy
            r4 = dy - dt * k7 - r3
            r5 = dt * r5s

            theta = jnp.clip((ts_col - t) / dt_safe, 0.0, 1.0)
            th1 = 1.0 - theta
            write = (adv & (ts_col > t) & (ts_col <= t + dt + tiny))
            for d in range(D):
                dense = y[d:d + 1] + theta * (
                    dy[d:d + 1] + th1 * (r3[d:d + 1] + theta * (
                        r4[d:d + 1] + th1 * r5[d:d + 1])))
                out_ref[d] = jnp.where(write, dense, out_ref[d])

            return (m + 1,
                    t_new,
                    dt_next,
                    jnp.where(adv, err, errp),
                    jnp.where(adv, y1, y),
                    jnp.where(adv, k7, fv))

        def cond(carry):
            m, t = carry[0], carry[1]
            return (m < max_steps) & jnp.any(t < t_final - tiny)

        m, t, dt, errp, y, fv = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t, dt0, errp, y0, f0))

        unreached = ts_col > t + tiny
        for d in range(D):
            out_ref[d] = jnp.where(unreached,
                                   jnp.broadcast_to(y[d:d + 1],
                                                    out_ref[d].shape),
                                   out_ref[d])
        misc_ref[0] = t
        misc_ref[1] = jnp.full((1, Bn), m.astype(jnp.float32))

    return kernel_sl


def _make_bwd_kernel(layer_dims, p, gate_slope, alpha, n_knots, D, T,
                     max_steps, stage_loop=False):
    """Reverse replay of recorded attempts; hand VJP of the KANFET field.

    ``stage_loop``: fori over stages (kbar rows in VMEM scratch, tableau
    as a runtime table) instead of unrolling seven field-VJP bodies —
    see ``_make_fwd_kernel``."""
    A, Bw = DOPRI5.a, DOPRI5.b
    DN = DOPRI5_DENSE_D
    n_layers = len(layer_dims)

    def kernel(ts_ref, ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref,
               *refs):
        x0bar_ref = refs[-1]
        grad_refs_all = refs[-1 - n_layers * _N_GRAD:-1]
        param_refs = refs[:n_layers * _N_PER_LAYER]
        layer_refs = [param_refs[i * _N_PER_LAYER:(i + 1) * _N_PER_LAYER]
                      for i in range(n_layers)]
        layer_grads = [grad_refs_all[i * _N_GRAD:(i + 1) * _N_GRAD]
                       for i in range(n_layers)]

        @pl.when(pl.program_id(0) == 0)
        def _zero_grads():
            for gr in grad_refs_all:
                gr[:] = jnp.zeros_like(gr)

        ts_col = ts_ref[:]
        t0 = ts_col[0, 0]
        tiny = jnp.float32(1e-12)
        Bn = ybar_ref.shape[-1]
        t_end = misc_ref[0]                                  # (1, B)
        n_att = misc_ref[1, 0, 0].astype(jnp.int32)

        def field_vjp(x, ybar):
            """VJP through the whole field: forward saving layer inputs,
            then layer-by-layer backward accumulating param grads."""
            xs = []
            h = x
            for dims, refs_l in zip(layer_dims, layer_refs):
                xs.append(h)
                h = _layer_forward(h, refs_l, dims, p, n_knots, gate_slope,
                                   alpha)
            g = ybar
            for li in range(n_layers - 1, -1, -1):
                g = _layer_vjp(xs[li], g, layer_refs[li], layer_grads[li],
                               layer_dims[li], p, n_knots, gate_slope,
                               alpha)
            return g

        # lambda init: cotangents of unreached output tails land on y_final.
        unreached = ts_col > t_end + tiny                    # (T, B)
        lam = jnp.stack(
            [jnp.sum(jnp.where(unreached, ybar_ref[d], 0.0), axis=0)
             for d in range(D)], axis=0)                     # (D, B)

        def body(carry):
            m, lam = carry
            mm = m - 1
            t = tda_ref[0, pl.ds(mm, 1), :]                  # (1, B)
            dt = tda_ref[1, pl.ds(mm, 1), :]
            adv = tda_ref[2, pl.ds(mm, 1), :]                # 0/1 float
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)
            y = jnp.concatenate(
                [yrec_ref[d, pl.ds(mm, 1), :] for d in range(D)], axis=0)
            ks = [jnp.concatenate(
                [krec_ref[j * D + d, pl.ds(mm, 1), :] for d in range(D)],
                axis=0) for j in range(7)]

            # ---- dense-output cotangent sums over this attempt's window
            theta = jnp.clip((ts_col - t) / dt_safe, 0.0, 1.0)   # (T, B)
            th1 = 1.0 - theta
            write = ((adv > 0.5) & (ts_col > t)
                     & (ts_col <= t + dt + tiny)).astype(jnp.float32)
            P1 = theta * write
            P3 = theta * th1 * write
            P4 = theta * theta * th1 * write
            P5 = theta * theta * th1 * th1 * write
            # dense = y + P1*dy + P3*(dt k1 - dy) + P4*(2dy - dt k1 - dt k7)
            #           + P5*dt*sum_j d_j k_j
            c_dy = P1 - P3 + 2.0 * P4
            wsum, s_dy, s_1, s_7, s_5 = [], [], [], [], []
            for d in range(D):
                yb = ybar_ref[d]                              # (T, B)
                wsum.append(jnp.sum(write * yb, axis=0))
                s_dy.append(jnp.sum(c_dy * yb, axis=0))
                s_1.append(jnp.sum((P3 - P4) * yb, axis=0))
                s_7.append(jnp.sum(-P4 * yb, axis=0))
                s_5.append(jnp.sum(P5 * yb, axis=0))
            wsum = jnp.stack(wsum, axis=0)[None].reshape(D, Bn)
            s_dy = jnp.stack(s_dy, axis=0)
            s_1 = jnp.stack(s_1, axis=0)
            s_7 = jnp.stack(s_7, axis=0)
            s_5 = jnp.stack(s_5, axis=0)

            advm = adv                                        # (1, B)
            lam_m = lam * advm                                # masked lambda
            kbar = []
            for j in range(7):
                kb = dt * (Bw[j] * (lam_m + s_dy) + DN[j] * s_5)
                if j == 0:
                    kb = kb + dt * s_1
                if j == 6:
                    kb = kb + dt * s_7
                kbar.append(kb)
            ybar_m = lam_m + wsum

            # ---- reverse through stages (stage inputs from recorded ks)
            for j in range(6, -1, -1):
                if j == 0:
                    u = y
                else:
                    incr = None
                    for aij, kj in zip(A[j][:j], ks):
                        if aij == 0.0:
                            continue
                        incr = aij * kj if incr is None else incr + aij * kj
                    u = y + dt * incr
                ub = field_vjp(u, kbar[j] * advm)
                ybar_m = ybar_m + ub
                for l in range(j):
                    if A[j][l] != 0.0:
                        kbar[l] = kbar[l] + dt * (A[j][l] * ub)

            lam = jnp.where(advm > 0.5, ybar_m, lam)
            return (mm, lam)

        _, lam = jax.lax.while_loop(lambda c: c[0] > 0, body, (n_att, lam))

        # prefix outputs (ts <= t0) read y0 directly
        head = (ts_col <= t0 + tiny)
        x0bar_ref[:] = lam + jnp.stack(
            [jnp.sum(jnp.where(head, ybar_ref[d], 0.0), axis=0)
             for d in range(D)], axis=0)

    if not stage_loop:
        return kernel

    def kernel_sl(ts_ref, ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref,
                  *refs):
        kbar_buf = refs[-1]                                # VMEM scratch
        x0bar_ref = refs[-2]
        grad_refs_all = refs[-2 - n_layers * _N_GRAD:-2]
        tab_ref = refs[n_layers * _N_PER_LAYER]
        param_refs = refs[:n_layers * _N_PER_LAYER]
        layer_refs = [param_refs[i * _N_PER_LAYER:(i + 1) * _N_PER_LAYER]
                      for i in range(n_layers)]
        layer_grads = [grad_refs_all[i * _N_GRAD:(i + 1) * _N_GRAD]
                       for i in range(n_layers)]

        @pl.when(pl.program_id(0) == 0)
        def _zero_grads():
            for gr in grad_refs_all:
                gr[:] = jnp.zeros_like(gr)

        ts_col = ts_ref[:]
        t0 = ts_col[0, 0]
        tiny = jnp.float32(1e-12)
        Bn = ybar_ref.shape[-1]
        t_end = misc_ref[0]
        n_att = misc_ref[1, 0, 0].astype(jnp.int32)

        def field_vjp(x, ybar):
            xs = []
            h = x
            for dims, refs_l in zip(layer_dims, layer_refs):
                xs.append(h)
                h = _layer_forward(h, refs_l, dims, p, n_knots, gate_slope,
                                   alpha)
            g = ybar
            for li in range(n_layers - 1, -1, -1):
                g = _layer_vjp(xs[li], g, layer_refs[li], layer_grads[li],
                               layer_dims[li], p, n_knots, gate_slope,
                               alpha)
            return g

        unreached = ts_col > t_end + tiny
        lam = jnp.stack(
            [jnp.sum(jnp.where(unreached, ybar_ref[d], 0.0), axis=0)
             for d in range(D)], axis=0)

        def body(carry):
            m, lam = carry
            mm = m - 1
            t = tda_ref[0, pl.ds(mm, 1), :]
            dt = tda_ref[1, pl.ds(mm, 1), :]
            adv = tda_ref[2, pl.ds(mm, 1), :]
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)
            y = jnp.concatenate(
                [yrec_ref[d, pl.ds(mm, 1), :] for d in range(D)], axis=0)
            ksall = krec_ref[:, pl.ds(mm, 1), :].reshape(7 * D, Bn)

            theta = jnp.clip((ts_col - t) / dt_safe, 0.0, 1.0)
            th1 = 1.0 - theta
            write = ((adv > 0.5) & (ts_col > t)
                     & (ts_col <= t + dt + tiny)).astype(jnp.float32)
            P1 = theta * write
            P3 = theta * th1 * write
            P4 = theta * theta * th1 * write
            P5 = theta * theta * th1 * th1 * write
            c_dy = P1 - P3 + 2.0 * P4
            wsum, s_dy, s_1, s_7, s_5 = [], [], [], [], []
            for d in range(D):
                yb = ybar_ref[d]
                wsum.append(jnp.sum(write * yb, axis=0))
                s_dy.append(jnp.sum(c_dy * yb, axis=0))
                s_1.append(jnp.sum((P3 - P4) * yb, axis=0))
                s_7.append(jnp.sum(-P4 * yb, axis=0))
                s_5.append(jnp.sum(P5 * yb, axis=0))
            wsum = jnp.stack(wsum, axis=0)[None].reshape(D, Bn)
            s_dy = jnp.stack(s_dy, axis=0)
            s_1 = jnp.stack(s_1, axis=0)
            s_7 = jnp.stack(s_7, axis=0)
            s_5 = jnp.stack(s_5, axis=0)

            advm = adv
            lam_m = lam * advm
            for j in range(7):                     # init (cheap, no field)
                kb = dt * (Bw[j] * (lam_m + s_dy) + DN[j] * s_5)
                if j == 0:
                    kb = kb + dt * s_1
                if j == 6:
                    kb = kb + dt * s_7
                kbar_buf[pl.ds(j * D, D)] = kb

            def rev_stage(i, ybar_m):
                j = 6 - i
                row = tab_ref[pl.ds(j, 1), :]
                # u_j = y + dt*sum_l a_jl k_l  (row 0 is all zeros -> u=y)
                incr = row[0, 0] * ksall[0:D]
                for l in range(1, 6):
                    incr = incr + row[0, l] * ksall[l * D:(l + 1) * D]
                u = y + dt * incr
                ub = field_vjp(u, kbar_buf[pl.ds(j * D, D)] * advm)
                # kbar_l += dt*a_jl*ub — zero coeffs for l >= j keep
                # already-consumed rows untouched in value terms
                for l in range(6):
                    kbar_buf[pl.ds(l * D, D)] += dt * (row[0, l] * ub)
                return ybar_m + ub

            ybar_m = jax.lax.fori_loop(0, 7, rev_stage, lam_m + wsum)
            lam = jnp.where(advm > 0.5, ybar_m, lam)
            return (mm, lam)

        _, lam = jax.lax.while_loop(lambda c: c[0] > 0, body, (n_att, lam))

        head = (ts_col <= t0 + tiny)
        x0bar_ref[:] = lam + jnp.stack(
            [jnp.sum(jnp.where(head, ybar_ref[d], 0.0), axis=0)
             for d in range(D)], axis=0)

    return kernel_sl

    return kernel


def _flatten_params(params, cfgs):
    """Kernel input arrays from the KAN param tree (same layout as
    ops/pallas_node.py)."""
    f32 = jnp.float32
    flat = []
    for pp, c in zip(params, cfgs):
        sw = pp["spline_weight"]
        if c.standalone_spline_scaler:
            sw = sw * pp["spline_scaler"][..., None]
        fe = pp["ferro"]
        N = c.in_features * c.out_features * c.ferro_num_basis
        flat += [
            pp["base_weight"].astype(f32),
            sw.reshape(c.out_features, -1).astype(f32),
            pp["_buffers"]["grid"].astype(f32),
            fe["k"].reshape(N, 1).astype(f32),
            fe["ec"].reshape(N, 1).astype(f32),
            fe["ps"].reshape(N, 1).astype(f32),
            fe["bias"].reshape(N, 1).astype(f32),
            fe["coef"].reshape(N, 1).astype(f32),
        ]
    return flat


def _unflatten_grads(params, cfgs, grads_flat):
    """Map kernel gradients (w.r.t. base_w / fused sw2 / flat ferro) back
    onto the parameter tree, chaining through the scaler fusion."""
    out = []
    gi = 0
    for pp, c in zip(params, cfgs):
        g_bw, g_sw2, g_fk, g_fec, g_fps, g_fbias, g_fcoef = \
            grads_flat[gi:gi + _N_GRAD]
        gi += _N_GRAD
        C = c.grid_size + c.spline_order
        shape3 = (c.in_features, c.out_features, c.ferro_num_basis)
        g_sw3 = g_sw2.reshape(c.out_features, c.in_features, C)
        layer = {
            "_buffers": {"grid": jnp.zeros_like(pp["_buffers"]["grid"])},
            "base_weight": g_bw.astype(pp["base_weight"].dtype),
        }
        if c.standalone_spline_scaler:
            scaler = pp["spline_scaler"]
            layer["spline_weight"] = (g_sw3 * scaler[..., None]).astype(
                pp["spline_weight"].dtype)
            layer["spline_scaler"] = jnp.sum(
                g_sw3 * pp["spline_weight"], axis=-1).astype(scaler.dtype)
        else:
            layer["spline_weight"] = g_sw3.astype(pp["spline_weight"].dtype)
        fe = pp["ferro"]
        layer["ferro"] = {
            "k": g_fk.reshape(shape3).astype(fe["k"].dtype),
            "ec": g_fec.reshape(shape3).astype(fe["ec"].dtype),
            "ps": g_fps.reshape(shape3).astype(fe["ps"].dtype),
            "bias": g_fbias.reshape(shape3).astype(fe["bias"].dtype),
            "coef": g_fcoef.reshape(shape3).astype(fe["coef"].dtype),
        }
        out.append(layer)
    return out


@functools.lru_cache(maxsize=32)
def make_train_solver(cfg, rtol=1e-7, atol=1e-9, max_steps=256,
                      block_b=512, interpret=False, stage_loop=None):
    """Build the differentiable whole-solve function for one KANFET stack.

    Returns ``solve(params, x0s, ts) -> (B, T, D)`` with a custom VJP
    (discrete adjoint on the frozen step mesh).  ``params`` is the
    standard KAN param list; ``x0s`` is (B, D).
    """
    cfgs = cfg.layers
    if any(c.ferro_num_basis == 0 or c.logistic_num_basis > 0 for c in cfgs):
        raise ValueError("pallas adjoint supports pure KANFET stacks only")
    D = cfgs[0].in_features
    if cfgs[-1].out_features != D:
        raise ValueError("NODE field must map D -> D")
    p = cfgs[0].spline_order
    n_knots = cfgs[0].grid_size + 2 * p + 1
    gate_slope = cfgs[0].ferro_gate_slope
    alpha = cfgs[0].ferro_alpha
    layer_dims = tuple((c.in_features, c.out_features, c.ferro_num_basis)
                       for c in cfgs)
    n_layers = len(cfgs)
    f32 = jnp.float32
    if stage_loop is None:
        # auto: full unroll is fastest for small fields; its code size
        # crashes Mosaic once any layer's ferro row count nears 1024
        # (measured boundary between [2,32,2]=512 ok and [2,64,2]=1024).
        stage_loop = any(i * o * k >= 1024 for i, o, k in layer_dims)

    def _pad(x0s):
        bb = min(block_b, x0s.shape[0])
        x0p, n_blocks, B_pad = _pad_batch(x0s.astype(f32), bb)
        return x0p, bb, n_blocks, B_pad

    def _fwd_call(params, x0s, ts):
        T = ts.shape[0]
        x0p, bb, n_blocks, B_pad = _pad(x0s)
        flat = _flatten_params(params, cfgs)
        inputs = [x0p.T, ts.astype(f32)[:, None]] + flat
        if stage_loop:
            inputs.append(_tableau_table())
        kernel = _make_fwd_kernel(layer_dims, p, gate_slope, alpha, n_knots,
                                  D, T, max_steps, rtol, atol,
                                  stage_loop=stage_loop)

        in_specs = [pl.BlockSpec((D, bb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
        for a in inputs[1:]:
            in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
        out_shapes = [
            jax.ShapeDtypeStruct((D, T, B_pad), f32),
            jax.ShapeDtypeStruct((3, max_steps, B_pad), f32),
            jax.ShapeDtypeStruct((D, max_steps, B_pad), f32),
            jax.ShapeDtypeStruct((7 * D, max_steps, B_pad), f32),
            jax.ShapeDtypeStruct((2, 1, B_pad), f32),
        ]
        out_specs = [
            pl.BlockSpec((D, T, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, max_steps, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, max_steps, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7 * D, max_steps, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        scratch = ([pltpu.VMEM((7 * D, bb), f32)] if stage_loop else [])
        out, tda, yrec, krec, misc = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)
        traj = jnp.transpose(out[:, :, :x0s.shape[0]], (2, 1, 0))
        return traj.astype(x0s.dtype), (tda, yrec, krec, misc)

    def _bwd_call(params, ts, recs, ct):
        tda, yrec, krec, misc = recs
        T = ts.shape[0]
        B_pad = tda.shape[-1]
        bb = min(block_b, B_pad)
        n_blocks = B_pad // bb
        Bout = ct.shape[0]
        ybar = jnp.transpose(ct.astype(f32), (2, 1, 0))      # (D, T, B)
        if B_pad != Bout:
            ybar = jnp.concatenate(
                [ybar, jnp.zeros((D, T, B_pad - Bout), f32)], axis=-1)
        flat = _flatten_params(params, cfgs)
        inputs = [ts.astype(f32)[:, None], ybar, tda, yrec, krec,
                  misc.reshape(2, 1, B_pad)] + flat

        if stage_loop:
            inputs.append(_tableau_table())
        kernel = _make_bwd_kernel(layer_dims, p, gate_slope, alpha, n_knots,
                                  D, T, max_steps, stage_loop=stage_loop)

        # inputs: ts, ybar, records (batch-split), params (broadcast)
        in_specs = [
            pl.BlockSpec(inputs[0].shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, T, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, max_steps, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, max_steps, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7 * D, max_steps, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, bb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
        for a in inputs[6:]:       # params (+ tableau table in loop mode)
            in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))

        kernel_inputs = inputs
        out_shapes, out_specs = [], []
        for pp, c in zip(params, cfgs):
            C = c.grid_size + c.spline_order
            N = c.in_features * c.out_features * c.ferro_num_basis
            shapes = [(c.out_features, c.in_features),
                      (c.out_features, c.in_features * C)] + [(N, 1)] * 5
            for s in shapes:
                out_shapes.append(jax.ShapeDtypeStruct(s, f32))
                out_specs.append(pl.BlockSpec(s, lambda i: (0, 0),
                                              memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((D, B_pad), f32))
        out_specs.append(pl.BlockSpec((D, bb), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))

        # kernel arg order matches the call layout exactly: records,
        # params (+ table), grad outputs, x0bar (+ kbar scratch).
        scratch = ([pltpu.VMEM((7 * D, bb), f32)] if stage_loop else [])
        results = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*kernel_inputs)
        grads_flat = results[:-1]
        x0bar = results[-1][:, :Bout].T                      # (B, D)
        return list(grads_flat), x0bar

    @jax.custom_vjp
    def solve(params, x0s, ts):
        traj, _ = _fwd_call(params, x0s, ts)
        return traj

    def fwd(params, x0s, ts):
        traj, recs = _fwd_call(params, x0s, ts)
        return traj, (params, x0s, ts, recs)

    def bwd(res, ct):
        params, x0s, ts, recs = res
        grads_flat, x0bar = _bwd_call(params, ts, recs, ct)
        gtree = _unflatten_grads(params, cfgs, grads_flat)
        if isinstance(params, tuple):
            gtree = tuple(gtree)
        return gtree, x0bar.astype(x0s.dtype), jnp.zeros_like(ts)

    solve.defvjp(fwd, bwd)
    solve.fwd_with_records = _fwd_call   # test/debug hook (frozen-mesh oracle)
    return solve


def pallas_kanfet_solve_train_sharded(params, cfg, x0s, ts, mesh, *,
                                      axis="data", rtol=1e-7, atol=1e-9,
                                      max_steps=256, block_b=512,
                                      interpret=None):
    """Data-parallel whole-solve training over a device mesh.

    Each device runs the adjoint kernel on its local trajectory shard
    (``shard_map`` over ``axis``); parameters are replicated, and the
    shard_map transpose inserts the psum that all-reduces their gradients
    — the GSPMD analogue of the reference's (absent) DDP.  ``x0s`` batch
    must divide the axis size.

    Differentiable exactly like ``pallas_kanfet_solve_train``.
    """
    if interpret is None:
        interpret = interpret_default()
    from jax.sharding import PartitionSpec as P

    n_shard = mesh.shape[axis]
    if x0s.shape[0] % n_shard:
        raise ValueError(f"batch {x0s.shape[0]} not divisible by "
                         f"{axis}={n_shard}")
    fn = make_train_solver(cfg, rtol=rtol, atol=atol, max_steps=max_steps,
                           block_b=block_b, interpret=interpret)
    solve = jax.shard_map(
        # per-shard batches beyond block_b chunk at the JAX level, same
        # as the unsharded wrapper (the Mosaic multi-block grid fails to
        # compile on-chip — see pallas_kanfet_solve_train)
        lambda p, x, t: _chunked_solve(fn, p, x, t, block_b),
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return solve(params, x0s, ts)


def _pad_batch(x, block):
    """Pad the leading axis up to a multiple of ``block`` by repeating
    the last row; returns (padded, n_blocks, padded_len).  One shared
    helper so the padding policy cannot drift between the kernel's own
    ``_pad`` and the JAX-level chunking (the padded rows are discarded
    by the final slice and — under differentiation — carry zero
    cotangent, so any valid row works)."""
    B = x.shape[0]
    n_blocks = -(-B // block)
    B_pad = n_blocks * block
    if B_pad != B:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (B_pad - B,) + x.shape[1:])], 0)
    return x, n_blocks, B_pad


def _chunked_solve(fn, params, x0s, ts, block_b):
    """Apply a single-block train solver over batches of any size:
    ``lax.map`` over block-sized chunks (pad-with-last, slice back).

    Chunking is semantically identical to the kernel's own batch grid
    because step control is PER-LANE (each trajectory carries its own
    dt/t in the tda records) — block membership never influences a
    lane's step mesh, so grid-vs-chunk parity is exact to fp noise
    (tests/test_pallas_adjoint.py:
    test_chunked_batch_matches_manual_chunks)."""
    B = x0s.shape[0]
    if B <= block_b:
        return fn(params, x0s, ts)
    x0p, n_blocks, B_pad = _pad_batch(x0s, block_b)
    chunks = x0p.reshape(n_blocks, block_b, *x0s.shape[1:])
    traj = jax.lax.map(lambda xc: fn(params, xc, ts), chunks)
    return traj.reshape(B_pad, *traj.shape[2:])[:B]


def pallas_kanfet_solve_train(params, cfg, x0s, ts, *, rtol=1e-7,
                              atol=1e-9, max_steps=256, block_b=512,
                              interpret=None, stage_loop=None):
    """Differentiable whole-solve (see ``make_train_solver``).

    ``interpret=None`` auto-selects: Mosaic on TPU, interpret mode on the
    CPU backend (so the same model spec runs in the virtual-mesh tests).
    ``stage_loop=None`` auto-selects looped RK stages for wide stacks.

    Batches beyond ``block_b`` are chunked at the JAX level
    (``lax.map`` over block-sized chunks of single-block kernel calls)
    rather than through the kernel's own batch grid: the multi-block
    Mosaic form fails to compile on-chip (opaque remote-compile 500 at
    B=1024, round 5), while lax.map of the single-block kernel is
    semantically identical — step control is PER-LANE, so block
    membership never affects a trajectory's step mesh, and
    interpret-mode grid-vs-chunk parity is exact to fp noise (grads
    accumulate through the scan transpose; tests/test_pallas_adjoint.py:
    test_chunked_batch_matches_manual_chunks).
    """
    if interpret is None:
        interpret = interpret_default()
    fn = make_train_solver(cfg, rtol=rtol, atol=atol, max_steps=max_steps,
                           block_b=block_b, interpret=interpret,
                           stage_loop=stage_loop)
    return _chunked_solve(fn, params, x0s, ts, block_b)
