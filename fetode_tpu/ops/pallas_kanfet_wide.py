"""Wide-stack whole-solve KANFET NODE kernel: (B, lanes) layout.

``ops/pallas_adjoint.py`` lays ferro rows on SUBLANES and batch on LANES
— right for the flagship's small field (N = in*out*K = 160) trained over
many trajectories, impossible for wide stacks: every (N, 1) ferro
parameter pads its lane dimension to 128, so a [2,64,64,2] stack
(N = 32,768 per middle layer) would spend ~16 MB of VMEM per parameter
array.  This module is the same discrete-adjoint whole-solve with the
layout flipped, following ``ops/pallas_ferro_node.py``:

* state is ``(B, D)`` — batch on sublanes, state on lanes;
* ferro parameters are ``(out, in*K)`` — zero lane-padding waste
  ((64, 512) = 128 KB at the [2,64,64,2] middle layer);
* the spline branch runs the roll-based lane-space Cox-de Boor of
  ``ops/pallas_spline.py`` on an ``(B, in*C0)`` block (per-lane knot
  windows gathered host-side), fused with the spline matmul;
* the per-(in,K) ferro replication rides the MXU as a 0/1 repetition
  matmul; per-sample ferro blocks run in a short batch ``fori_loop``;
* step control is GLOBAL (batch-shared scalar t/dt, like the ECG
  kernels) instead of per-lane: the wide regime is few trajectories x
  huge field, where a shared mesh is the right trade;
* trajectory outputs ride a ``(B, T*D)`` lane layout: CONTD5 dense
  writes and their adjoint sums become tiny ``(D, T*D)`` one-hot
  matmuls, with the write mask a single (1, T*D) row (global t).

Gradient semantics match ``pallas_kanfet_solve_train``: discrete adjoint
on the frozen attempt mesh (the PI-controller chain is not
differentiated).  Field math citations: ops/bsplines.py:46-75,
nn/kan.py:144-196, ops/ferro.py:113-163; reference formulas
efficientkan.py:117-131 (splines), ferro_class.py:250-320 (hysteresis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import interpret_default
from fetode_tpu.ops.pallas_adjoint import _tableau_table
from fetode_tpu.solvers.tableaux import DOPRI5

_ORDER = 5
_BETA = 0.04
_ALPHA = 1.0 / _ORDER - 0.75 * _BETA
_SAFETY = 0.9
_IFACTOR = 10.0
_DFACTOR = 0.2

_N_PRM = 11   # bw, sw2, gs, lmask, Rg, Rf, fk, fec, fps, fbias, fcoef
_N_GRAD = 7   # bw, sw2, fk, fec, fps, fbias, fcoef


def _dot(a, b, ca, cb):
    """f32 MXU dot (HIGHEST: the embedded error estimate feeds step
    control — see ops/pallas_adjoint.py: _dot)."""
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _pow(x, p):
    """Scalar x**p (Mosaic cannot legalize scalar math.powf)."""
    return jnp.exp(p * jnp.log(x))


def _spline_lane(xg, gs_ref, p, M, mask):
    """Roll-based Cox-de Boor on the lane axis (ops/pallas_spline.py).

    xg (B, M) per-lane inputs; gs_ref (p+2, M) per-lane knot windows;
    returns (bases_p, dbases_p), both (B, M), invalid lanes zeroed.
    dB_p/dx = p*(B_{p-1}/(g_p - g_0) - roll(B_{p-1})/(g_{p+1} - g_1)).
    """
    g = [gs_ref[r, :] for r in range(p + 2)]
    b = jnp.logical_and(xg >= g[0], xg < g[1]).astype(jnp.float32)
    for k in range(1, p):
        left = (xg - g[0]) / (g[k] - g[0])
        right = (g[k + 1] - xg) / (g[k + 1] - g[1])
        b = left * b + right * pltpu.roll(b, M - 1, 1)
    ld = g[p] - g[0]
    rd = g[p + 1] - g[1]
    rb = pltpu.roll(b, M - 1, 1)
    bases = (xg - g[0]) / ld * b + (g[p + 1] - xg) / rd * rb
    dbases = float(p) * (b / ld - rb / rd)
    valid = mask > 0
    return (jnp.where(valid, bases, 0.0), jnp.where(valid, dbases, 0.0))


def _ferro_rows(xf, fk, fec, fps, fbias, gate_slope, alpha):
    """Ferro forward terms on an (out, L) block, fresh frozen state
    (prev_x=0, branch=+1 => target = 1 - 2*(1-mu)*cn)."""
    mu = jax.nn.sigmoid(gate_slope * xf)
    cn = jax.nn.sigmoid(gate_slope * (-xf - fec))
    sd = (1.0 - mu) * cn
    beta = alpha + (1.0 - alpha) * (1.0 - 2.0 * sd)
    th = jnp.tanh(fk * (xf + fec * beta))
    fb = fps * th + fbias
    return mu, cn, beta, th, fb


def _make_fwd_kernel(layer_dims, Ms, p, gate_slope, alpha, B, D, T,
                     max_steps, rtol, atol):
    """Forward adaptive solve over [ts[0], ts[-1]] with CONTD5 dense
    output at the T requested times and per-attempt records."""
    n_layers = len(layer_dims)
    TD = T * D

    def kernel(x0_ref, tsl_ref, tile_ref, tab_ref, *refs):
        out_ref, tda_ref, yrec_ref, krec_ref, misc_ref = \
            refs[n_layers * _N_PRM:n_layers * _N_PRM + 5]
        scr = refs[n_layers * _N_PRM + 5:]
        ks_buf = scr[0]
        xk_bufs = scr[1:1 + n_layers]
        zf_bufs = scr[1 + n_layers:1 + 2 * n_layers]
        layer_refs = [refs[i * _N_PRM:(i + 1) * _N_PRM]
                      for i in range(n_layers)]

        def layer_fwd(x, li):
            (bw, sw2, gs, lmask, Rg, Rf,
             fk, fec, fps, fbias, fcoef) = layer_refs[li]
            in_d, out_d, K = layer_dims[li]
            L = in_d * K
            y = _dot(jax.nn.silu(x), bw[:], 1, 0)           # (B, out)
            xg = _dot(x, Rg[:], 1, 0)                        # (B, M)
            bases, _ = _spline_lane(xg, gs, p, Ms[li], lmask[0, :])
            y = y + _dot(bases, sw2[:], 1, 0)
            xk_bufs[li][:] = _dot(x, Rf[:], 1, 0)            # (B, L)

            def one(b, _):
                row = xk_bufs[li][pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out_d, L))
                _, _, _, _, fb = _ferro_rows(xf, fk[:], fec[:], fps[:],
                                             fbias[:], gate_slope, alpha)
                # lane-sum over (in, K) -> (1, out) row
                zf_bufs[li][pl.ds(b, 1), :] = _dot(
                    jnp.ones((1, L), jnp.float32), fb * fcoef[:], 1, 1)
                return 0

            jax.lax.fori_loop(0, B, one, 0)
            return y + zf_bufs[li][:]

        def field(x):
            for li in range(n_layers):
                x = layer_fwd(x, li)
            return x

        y0 = x0_ref[:]                                       # (B, D)
        tsl = tsl_ref[:]                                     # (1, TD)
        tile = tile_ref[:]                                   # (D, TD)
        t0 = tsl[0, 0]
        t_final = tsl[0, TD - 1]
        tiny = jnp.float32(1e-12)

        def tile_up(v):                                      # (B,D)->(B,TD)
            return _dot(v, tile, 1, 0)

        tda_ref[:] = jnp.zeros_like(tda_ref)
        ks_buf[:] = jnp.zeros_like(ks_buf)
        out_ref[:] = tile_up(y0)

        f0 = field(y0)

        def rms(v, ref):
            s = atol + rtol * jnp.abs(ref)
            return jnp.sqrt(jnp.mean((v / s) ** 2))

        d0 = rms(y0, y0)
        d1 = rms(f0, y0)
        h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                       0.01 * d0 / jnp.maximum(d1, 1e-30))
        f1i = field(y0 + h0 * f0)
        d2 = rms(f1i - f0, y0) / h0
        dmax = jnp.maximum(d1, d2)
        h1 = jnp.where(dmax <= 1e-15, jnp.maximum(1e-6, h0 * 1e-3),
                       _pow(0.01 / jnp.maximum(dmax, 1e-30),
                            1.0 / (_ORDER + 1)))
        dt0 = jnp.minimum(jnp.minimum(100.0 * h0, h1), t_final - t0)

        def body(carry):
            m, t, dt, errp, y, fv = carry
            finished = t >= t_final - tiny
            dt = jnp.where(finished, 0.0, jnp.minimum(dt, t_final - t))
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)

            # ---- stage loop (FSAL: k1 = carried fv)
            ks_buf[pl.ds(0, B)] = fv
            row0 = tab_ref[pl.ds(0, 1), :]
            acc0 = (y + (dt * row0[0, 7]) * fv, row0[0, 8] * fv,
                    row0[0, 9] * fv)

            def stage(j, acc):
                y1a, yea, r5a = acc
                row = tab_ref[pl.ds(j, 1), :]
                incr = row[0, 0] * ks_buf[pl.ds(0, B)]
                for l in range(1, 6):
                    incr = incr + row[0, l] * ks_buf[pl.ds(l * B, B)]
                kj = field(y + dt * incr)
                ks_buf[pl.ds(j * B, B)] = kj
                return (y1a + (dt * row[0, 7]) * kj,
                        yea + row[0, 8] * kj,
                        r5a + row[0, 9] * kj)

            y1, yerr_s, r5s = jax.lax.fori_loop(1, 7, stage, acc0)
            yerr = dt * yerr_s
            k7 = ks_buf[pl.ds(6 * B, B)]

            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            err = jnp.sqrt(jnp.mean((yerr / scale) ** 2))
            err = jnp.maximum(err, 1e-10)
            accept = (err <= 1.0) | finished

            fac_pi = _SAFETY * _pow(err, -_ALPHA) * _pow(errp, _BETA)
            fac_acc = jnp.clip(fac_pi, _DFACTOR, _IFACTOR)
            fac_rej = jnp.clip(_SAFETY * _pow(err, -1.0 / _ORDER),
                               _DFACTOR, 1.0)
            dt_next = jnp.where(finished, 0.0,
                                dt_safe * jnp.where(accept, fac_acc,
                                                    fac_rej))
            t_new = jnp.where(accept, t + dt, t)
            adv = accept & ~finished

            # ---- attempt records (the frozen mesh)
            rec = jnp.stack([dt, adv.astype(jnp.float32), t,
                             jnp.float32(0.0)])[None, :]
            tda_ref[pl.ds(m, 1), :] = rec
            yrec_ref[pl.ds(m, 1)] = y[None]
            krec_ref[pl.ds(m, 1)] = ks_buf[:].reshape(7, B, D)[None]

            # ---- dense output (CONTD5) into the (B, T*D) lane layout
            dy = y1 - y
            r3 = dt * fv - dy
            r4 = dy - dt * k7 - r3
            r5 = dt * r5s
            theta = jnp.clip((tsl - t) / dt_safe, 0.0, 1.0)   # (1, TD)
            th1 = 1.0 - theta
            write = (adv & (tsl > t) & (tsl <= t + dt + tiny))
            dense = tile_up(y) + theta * (
                tile_up(dy) + th1 * (tile_up(r3) + theta * (
                    tile_up(r4) + th1 * tile_up(r5))))
            out_ref[:] = jnp.where(write, dense, out_ref[:])

            return (m + 1, t_new, dt_next,
                    jnp.where(adv, err, errp),
                    jnp.where(adv, y1, y),
                    jnp.where(adv, k7, fv))

        def cond(carry):
            m, t = carry[0], carry[1]
            return (m < max_steps) & (t < t_final - tiny)

        m, t, dt, errp, y, fv = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t0, dt0, jnp.float32(1.0), y0, f0))

        unreached = tsl > t + tiny
        out_ref[:] = jnp.where(unreached, tile_up(y), out_ref[:])
        misc_ref[:] = jnp.stack([m.astype(jnp.float32), t,
                                 jnp.float32(0.0),
                                 jnp.float32(0.0)])[None, :]

    return kernel


def _make_bwd_kernel(layer_dims, Ms, p, gate_slope, alpha, B, D, T,
                     max_steps):
    """Reverse replay with dense-output cotangents; hand VJP of the
    KANFET field in the (B, lanes) layout."""
    n_layers = len(layer_dims)
    TD = T * D

    def kernel(tsl_ref, tile_ref, ybar_ref, tda_ref, yrec_ref, krec_ref,
               misc_ref, tab_ref, *refs):
        param_refs = refs[:n_layers * _N_PRM]
        grad_refs = refs[n_layers * _N_PRM:
                         n_layers * (_N_PRM + _N_GRAD)]
        x0bar_ref = refs[n_layers * (_N_PRM + _N_GRAD)]
        scr = refs[n_layers * (_N_PRM + _N_GRAD) + 1:]
        kbar_buf = scr[0]
        xk_bufs = scr[1:1 + n_layers]
        xb_bufs = scr[1 + n_layers:1 + 2 * n_layers]
        layer_refs = [param_refs[i * _N_PRM:(i + 1) * _N_PRM]
                      for i in range(n_layers)]
        layer_grads = [grad_refs[i * _N_GRAD:(i + 1) * _N_GRAD]
                       for i in range(n_layers)]

        for gr in grad_refs:
            gr[:] = jnp.zeros_like(gr)

        tsl = tsl_ref[:]
        tile = tile_ref[:]
        ybar = ybar_ref[:]                                   # (B, TD)
        t0 = tsl[0, 0]
        tiny = jnp.float32(1e-12)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        t_end = misc_ref[0, 1]
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def tile_down(w):                                    # (B,TD)->(B,D)
            return _dot(w, tile, 1, 1)

        def layer_fwd(x, li):
            (bw, sw2, gs, lmask, Rg, Rf,
             fk, fec, fps, fbias, fcoef) = layer_refs[li]
            in_d, out_d, K = layer_dims[li]
            L = in_d * K
            y = _dot(jax.nn.silu(x), bw[:], 1, 0)
            xg = _dot(x, Rg[:], 1, 0)
            bases, _ = _spline_lane(xg, gs, p, Ms[li], lmask[0, :])
            y = y + _dot(bases, sw2[:], 1, 0)
            xk_bufs[li][:] = _dot(x, Rf[:], 1, 0)

            # per-sample ferro contributions accumulated as a value (the
            # bwd pass owns the xb scratch for cotangents)
            def one_add(b, acc):
                row = xk_bufs[li][pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out_d, L))
                _, _, _, _, fb = _ferro_rows(xf, fk[:], fec[:], fps[:],
                                             fbias[:], gate_slope, alpha)
                zb = _dot(jnp.ones((1, L), jnp.float32),
                          fb * fcoef[:], 1, 1)               # (1, out)
                e_b = (iota_b == b).astype(jnp.float32)      # (B, 1)
                return acc + _dot(e_b, zb, 1, 0)

            zf = jax.lax.fori_loop(0, B, one_add,
                                   jnp.zeros((B, out_d), jnp.float32))
            return y + zf

        def layer_vjp(x, g, li):
            """Backward of one layer at saved input x with output
            cotangent g (B, out); accumulates grads, returns xbar."""
            (bw, sw2, gs, lmask, Rg, Rf,
             fk, fec, fps, fbias, fcoef) = layer_refs[li]
            (g_bw, g_sw2, g_fk, g_fec, g_fps, g_fbias,
             g_fcoef) = layer_grads[li]
            in_d, out_d, K = layer_dims[li]
            L = in_d * K

            # ---- base branch
            sig = jax.nn.sigmoid(x)
            s = x * sig
            g_bw[:] += _dot(s, g, 0, 0)                      # (in, out)
            sbar = _dot(g, bw[:], 1, 1)                      # (B, in)
            xbar = sbar * (sig * (1.0 + x * (1.0 - sig)))

            # ---- spline branch
            xg = _dot(x, Rg[:], 1, 0)
            bases, dbases = _spline_lane(xg, gs, p, Ms[li], lmask[0, :])
            g_sw2[:] += _dot(bases, g, 0, 0)                 # (M, out)
            gb = _dot(g, sw2[:], 1, 1)                       # (B, M)
            xbar = xbar + _dot(gb * dbases, Rg[:], 1, 1)     # (B, in)

            # ---- ferro branch (per-sample blocks)
            xk_bufs[li][:] = _dot(x, Rf[:], 1, 0)            # (B, L)

            def one(b, _):
                row = xk_bufs[li][pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out_d, L))
                mu, cn, beta, th, fb = _ferro_rows(
                    xf, fk[:], fec[:], fps[:], fbias[:], gate_slope, alpha)
                e_b = (iota_b == b).astype(jnp.float32)
                wcol = _dot(g, e_b, 0, 0)                    # (out, 1)
                g_fcoef[:] += fb * wcol
                fbar = fcoef[:] * wcol                       # (out, L)
                sech2 = 1.0 - th * th
                g_fps[:] += th * fbar
                g_fbias[:] += fbar
                ec = fec[:]
                g_fk[:] += fps[:] * (xf + ec * beta) * sech2 * fbar
                gs1a = gate_slope * (1.0 - alpha)
                dbeta_dec = 2.0 * gs1a * (1.0 - mu) * cn * (1.0 - cn)
                dbeta_dx = 2.0 * gs1a * (1.0 - mu) * cn * (mu + 1.0 - cn)
                common = fps[:] * fk[:] * sech2 * fbar
                g_fec[:] += common * (beta + ec * dbeta_dec)
                xfbar = common * (1.0 + ec * dbeta_dx)       # (out, L)
                lanes = _dot(jnp.ones((1, out_d), jnp.float32), xfbar,
                             1, 0)                           # (1, L)
                xb_bufs[li][pl.ds(b, 1), :] = _dot(lanes, Rf[:], 1, 1)
                return 0

            jax.lax.fori_loop(0, B, one, 0)
            return xbar + xb_bufs[li][:]

        def field_vjp(x, w):
            xs = []
            h = x
            for li in range(n_layers):
                xs.append(h)
                h = layer_fwd(h, li)
            g = w
            for li in range(n_layers - 1, -1, -1):
                g = layer_vjp(xs[li], g, li)
            return g

        # lambda init: cotangents of unreached output tails land on y_fin
        unreached = (tsl > t_end + tiny).astype(jnp.float32)
        lam = tile_down(ybar * unreached)                    # (B, D)

        def body(carry):
            m, lam = carry
            mm = m - 1
            rec = tda_ref[pl.ds(mm, 1), :]
            dt = rec[0, 0]
            adv = rec[0, 1]
            t = rec[0, 2]
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)
            y = yrec_ref[pl.ds(mm, 1)][0]                    # (B, D)
            ksall = krec_ref[pl.ds(mm, 1)][0].reshape(7 * B, D)

            # ---- dense-output cotangent sums over this attempt's window
            theta = jnp.clip((tsl - t) / dt_safe, 0.0, 1.0)  # (1, TD)
            th1 = 1.0 - theta
            write = ((adv > 0.5) & (tsl > t)
                     & (tsl <= t + dt + tiny)).astype(jnp.float32)
            P1 = theta * write
            P3 = theta * th1 * write
            P4 = theta * theta * th1 * write
            P5 = theta * theta * th1 * th1 * write
            wsum = tile_down(ybar * write)
            s_dy = tile_down(ybar * (P1 - P3 + 2.0 * P4))
            s_1 = tile_down(ybar * (P3 - P4))
            s_7 = -tile_down(ybar * P4)
            s_5 = tile_down(ybar * P5)

            lam_m = adv * lam
            for j in range(7):                   # kbar init (no field)
                row = tab_ref[pl.ds(j, 1), :]
                kb = dt * (row[0, 7] * (lam_m + s_dy) + row[0, 9] * s_5)
                if j == 0:
                    kb = kb + dt * s_1
                if j == 6:
                    kb = kb + dt * s_7
                kbar_buf[pl.ds(j * B, B)] = kb

            def rev_stage(i, ybar_m):
                j = 6 - i
                row = tab_ref[pl.ds(j, 1), :]
                incr = row[0, 0] * ksall[0:B]
                for l in range(1, 6):
                    incr = incr + row[0, l] * ksall[l * B:(l + 1) * B]
                u = y + dt * incr
                ub = field_vjp(u, adv * kbar_buf[pl.ds(j * B, B)])
                for l in range(6):
                    kbar_buf[pl.ds(l * B, B)] += dt * (row[0, l] * ub)
                return ybar_m + ub

            ybar_m = jax.lax.fori_loop(0, 7, rev_stage, lam_m + wsum)
            lam = jnp.where(adv > 0.5, ybar_m, lam)
            return (mm, lam)

        _, lam = jax.lax.while_loop(lambda c: c[0] > 0, body, (n_att, lam))

        head = (tsl <= t0 + tiny).astype(jnp.float32)
        x0bar_ref[:] = lam + tile_down(ybar * head)

    return kernel


def _lane_tables(c):
    """Host-side per-lane spline tables for one layer config: returns
    (M, gs (p+2, M), mask (1, M), Rg (in, M), perm) with M padded to a
    lane multiple.  ``perm`` maps valid (i, c) lanes to in*C rows."""
    import numpy as np

    p, G = c.spline_order, c.grid_size
    in_d = c.in_features
    C0 = G + 2 * p
    C = G + p
    n_knots = G + 2 * p + 1
    M = -(-in_d * C0 // 128) * 128
    lane_feat = np.arange(in_d * C0) // C0
    lane_c = np.arange(in_d * C0) % C0
    return M, lane_feat, lane_c, C0, C, n_knots


def _flatten_layer(pp, c):
    """Kernel arrays for one layer: [bw, sw2, gs, lmask, Rg, Rf, 5 ferro].

    Param-dependent arrays (grid windows, weights) are built with jnp ops
    so this traces under jit; layout constants (masks, one-hot maps) are
    host numpy.
    """
    import numpy as np

    f32 = jnp.float32
    M, lane_feat, lane_c, C0, C, n_knots = _lane_tables(c)
    in_d, out_d, K = c.in_features, c.out_features, c.ferro_num_basis

    grid = pp["_buffers"]["grid"].astype(f32)                # (in, n_knots)
    gs = jnp.stack([grid[lane_feat, np.minimum(lane_c + r, n_knots - 1)]
                    for r in range(c.spline_order + 2)])
    pad = M - in_d * C0
    if pad:
        dummy = jnp.asarray(
            np.arange(c.spline_order + 2, dtype=np.float32)[:, None]
            * np.ones((1, pad), np.float32))
        gs = jnp.concatenate([gs, dummy], axis=1)

    lmask = np.zeros((1, M), np.float32)
    lmask[0, :in_d * C0] = (lane_c < C).astype(np.float32)

    Rg = np.zeros((in_d, M), np.float32)
    Rg[lane_feat, np.arange(in_d * C0)] = 1.0

    sw = pp["spline_weight"]
    if c.standalone_spline_scaler:
        sw = sw * pp["spline_scaler"][..., None]
    src = jnp.transpose(sw.astype(f32), (1, 2, 0)).reshape(in_d * C, out_d)
    rows = np.arange(in_d * C0)[lane_c < C]
    sw2 = jnp.zeros((M, out_d), f32).at[rows].set(src)

    Rf = np.repeat(np.eye(in_d, dtype=np.float32), K, axis=0).T  # (in, in*K)

    fe = pp["ferro"]

    def fr(a):
        return jnp.transpose(a.astype(f32), (1, 0, 2)).reshape(
            out_d, in_d * K)

    return [pp["base_weight"].astype(f32).T,
            sw2, gs, jnp.asarray(lmask), jnp.asarray(Rg), jnp.asarray(Rf),
            fr(fe["k"]), fr(fe["ec"]), fr(fe["ps"]), fr(fe["bias"]),
            fr(fe["coef"])]


def _unflatten_grads(params, cfgs, grads_flat):
    """Kernel grads back onto the parameter tree (scaler chain rule as in
    ops/pallas_adjoint.py: _unflatten_grads)."""
    import numpy as np

    out = []
    gi = 0
    for pp, c in zip(params, cfgs):
        g_bw, g_sw2, g_fk, g_fec, g_fps, g_fbias, g_fcoef = \
            grads_flat[gi:gi + _N_GRAD]
        gi += _N_GRAD
        M, lane_feat, lane_c, C0, C, n_knots = _lane_tables(c)
        in_d, out_d, K = c.in_features, c.out_features, c.ferro_num_basis
        valid = lane_c < C
        rows = jnp.asarray(np.arange(in_d * C0)[valid])
        g_sw3 = jnp.transpose(
            g_sw2[rows].reshape(in_d, C, out_d), (2, 0, 1))

        layer = {
            "_buffers": {"grid": jnp.zeros_like(pp["_buffers"]["grid"])},
            "base_weight": g_bw.T.astype(pp["base_weight"].dtype),
        }
        if c.standalone_spline_scaler:
            scaler = pp["spline_scaler"]
            layer["spline_weight"] = (g_sw3 * scaler[..., None]).astype(
                pp["spline_weight"].dtype)
            layer["spline_scaler"] = jnp.sum(
                g_sw3 * pp["spline_weight"], axis=-1).astype(scaler.dtype)
        else:
            layer["spline_weight"] = g_sw3.astype(pp["spline_weight"].dtype)

        def unfr(g, ref):
            return jnp.transpose(g.reshape(out_d, in_d, K),
                                 (1, 0, 2)).astype(ref.dtype)

        fe = pp["ferro"]
        layer["ferro"] = {
            "k": unfr(g_fk, fe["k"]), "ec": unfr(g_fec, fe["ec"]),
            "ps": unfr(g_fps, fe["ps"]), "bias": unfr(g_fbias, fe["bias"]),
            "coef": unfr(g_fcoef, fe["coef"]),
        }
        out.append(layer)
    return out


@functools.lru_cache(maxsize=32)
def make_wide_train_solver(cfg, rtol=1e-7, atol=1e-9, max_steps=256,
                           interpret=False):
    """Differentiable whole-solve for a wide KANFET stack.

    Returns ``solve(params, x0s, ts) -> (B, T, D)`` with a custom VJP
    (discrete adjoint, frozen mesh, GLOBAL batch-shared step control).
    """
    cfgs = cfg.layers
    if any(c.ferro_num_basis == 0 or c.logistic_num_basis > 0
           for c in cfgs):
        raise ValueError("wide kernel supports pure KANFET stacks only")
    D = cfgs[0].in_features
    if cfgs[-1].out_features != D:
        raise ValueError("NODE field must map D -> D")
    p = cfgs[0].spline_order
    gate_slope = cfgs[0].ferro_gate_slope
    alpha = cfgs[0].ferro_alpha
    layer_dims = tuple((c.in_features, c.out_features, c.ferro_num_basis)
                      for c in cfgs)
    Ms = tuple(_lane_tables(c)[0] for c in cfgs)
    n_layers = len(cfgs)
    f32 = jnp.float32
    MS = max_steps

    def _tile_mat(T):
        import numpy as np

        m = np.zeros((D, T * D), np.float32)
        for tau in range(T):
            for d in range(D):
                m[d, tau * D + d] = 1.0
        return jnp.asarray(m)

    def _scratch(B, bwd=False):
        scr = [pltpu.VMEM((7 * B, D), f32)]              # ks / kbar rows
        scr += [pltpu.VMEM((B, i * k), f32) for i, o, k in layer_dims]
        # fwd: per-sample ferro output rows (B, out);
        # bwd: per-sample input cotangent rows (B, in)
        scr += [pltpu.VMEM((B, i if bwd else o), f32)
                for i, o, k in layer_dims]
        return scr

    def _fwd_call(params, x0s, ts):
        T = ts.shape[0]
        B = x0s.shape[0]
        flat = sum((_flatten_layer(pp, c) for pp, c in zip(params, cfgs)),
                   [])
        tsl = jnp.repeat(ts.astype(f32), D)[None, :]         # (1, T*D)
        inputs = [x0s.astype(f32), tsl, _tile_mat(T), _tableau_table()] \
            + flat
        kernel = _make_fwd_kernel(layer_dims, Ms, p, gate_slope, alpha,
                                  B, D, T, MS, rtol, atol)
        out_shapes = [
            jax.ShapeDtypeStruct((B, T * D), f32),
            jax.ShapeDtypeStruct((MS, 4), f32),
            jax.ShapeDtypeStruct((MS, B, D), f32),
            jax.ShapeDtypeStruct((MS, 7, B, D), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ]
        out, tda, yrec, krec, misc = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=_scratch(B),
            interpret=interpret,
        )(*inputs)
        traj = out.reshape(B, T, D)
        return traj.astype(x0s.dtype), (tda, yrec, krec, misc)

    def _bwd_call(params, ts, recs, ct):
        tda, yrec, krec, misc = recs
        T = ts.shape[0]
        B = ct.shape[0]
        flat = sum((_flatten_layer(pp, c) for pp, c in zip(params, cfgs)),
                   [])
        tsl = jnp.repeat(ts.astype(f32), D)[None, :]
        ybar = ct.astype(f32).reshape(B, T * D)
        inputs = [tsl, _tile_mat(T), ybar, tda, yrec, krec, misc,
                  _tableau_table()] + flat
        kernel = _make_bwd_kernel(layer_dims, Ms, p, gate_slope, alpha,
                                  B, D, T, MS)
        out_shapes = []
        for c, M in zip(cfgs, Ms):
            in_d, out_d, K = (c.in_features, c.out_features,
                              c.ferro_num_basis)
            out_shapes += [jax.ShapeDtypeStruct((in_d, out_d), f32),
                           jax.ShapeDtypeStruct((M, out_d), f32)]
            out_shapes += [jax.ShapeDtypeStruct((out_d, in_d * K), f32)] * 5
        out_shapes.append(jax.ShapeDtypeStruct((B, D), f32))
        results = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * len(out_shapes),
            scratch_shapes=_scratch(B, bwd=True),
            interpret=interpret,
        )(*inputs)
        return list(results[:-1]), results[-1]

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
    solve.fwd_with_records = _fwd_call   # test hook (frozen-mesh oracle)
    return solve


def pallas_kanfet_wide_solve_train(params, cfg, x0s, ts, *, rtol=1e-7,
                                   atol=1e-9, max_steps=256,
                                   interpret=None):
    """Differentiable whole-solve, wide-stack layout (see
    ``make_wide_train_solver``).  ``interpret=None`` auto-selects
    interpret mode on the CPU backend."""
    if interpret is None:
        interpret = interpret_default()
    fn = make_wide_train_solver(cfg, rtol=rtol, atol=atol,
                                max_steps=max_steps, interpret=interpret)
    return fn(tuple(params) if isinstance(params, list) else params,
              x0s, ts)
