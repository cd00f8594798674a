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

Step control is GLOBAL (one dt for the whole batch), matching the XLA
path exactly: ``kanfet_mlp_node_apply`` calls ``odeint_dopri5`` on the
(B, D) state, whose error norm reduces over all elements
(solvers/rk_common.py: error_norm).  Only the final state is returned
(the ECG solve evaluates ts=[0, 1] and keeps ``traj[-1]``), so there is
no dense-output machinery — the backward's lambda starts at the
final-state cotangent.

Semantics: discrete adjoint on the frozen attempt mesh, exactly as
``ops/pallas_adjoint.py`` (gradients through the PI controller chain are
dropped).  Hysteresis state is fresh-and-frozen during the solve
(prev_x=0, branch=+1), which collapses the branch target to
``1 - 2*(1-mu)*cn`` — see ``_ferro_rows``.  Device noise
(``noise_std > 0``) is not supported here; callers fall back to the XLA
path.

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

from fetode_tpu.solvers.tableaux import DOPRI5

_ORDER = 5
_BETA = 0.04
_ALPHA = 1.0 / _ORDER - 0.75 * _BETA
_SAFETY = 0.9
_IFACTOR = 10.0
_DFACTOR = 0.2

_N_PRM = 5   # fk, fec, fps, fbias, fcoef — each (out, in*K)


def _dot(a, b, ca, cb):
    """f32 MXU dot (see ops/pallas_adjoint.py: _dot for why HIGHEST)."""
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _pow(x, p):
    """x**p for positive x — Mosaic cannot legalize SCALAR math.powf
    (this kernel's step control is global, so err/dt are 0-d)."""
    return jnp.exp(p * jnp.log(x))


def _tableau_table():
    """(7, 9) runtime dopri5 table: cols 0..5 = A[j][:6], 7 = b_j,
    8 = b_err_j (no dense column — final state only)."""
    import numpy as np

    tab = np.zeros((7, 9), np.float32)
    for j in range(7):
        for l, a in enumerate(DOPRI5.a[j][:j]):
            tab[j, l] = a
        tab[j, 7] = DOPRI5.b[j]
        tab[j, 8] = DOPRI5.b_err[j]
    return jnp.asarray(tab)


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
                     h_bound, dh_clip, max_steps, rtol, atol):
    """Forward adaptive solve of [0,1] + per-attempt records."""
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    L1, L2 = in1 * K1, in2 * K2
    inv_hb = 1.0 / h_bound

    def kernel(h0_ref, tab_ref, r1_ref, r2_ref, *refs):
        prm1 = [r[:] for r in refs[:_N_PRM]]
        prm2 = [r[:] for r in refs[_N_PRM:2 * _N_PRM]]
        (out_ref, tda_ref, yrec_ref, krec_ref,
         misc_ref) = refs[2 * _N_PRM:2 * _N_PRM + 5]
        z_buf, dh_buf, ks_buf, xk1_buf, xk2_buf = refs[2 * _N_PRM + 5:]

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
                dh_buf[pl.ds(b, 1), :] = _dot(ones2, fb * prm2[4], 1, 1)
                return 0

            jax.lax.fori_loop(0, B, b2, 0)
            return jnp.clip(dh_buf[:], -dh_clip, dh_clip)  # (B, D)

        y0 = h0_ref[:]
        tiny = jnp.float32(1e-12)
        t_final = jnp.float32(1.0)
        tda_ref[:] = jnp.zeros_like(tda_ref)
        ks_buf[:] = jnp.zeros_like(ks_buf)

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
        dt0 = jnp.minimum(jnp.minimum(100.0 * h0, h1), t_final)

        def body(carry):
            m, t, dt, errp, y, fv = carry
            finished = t >= t_final - tiny
            dt = jnp.where(finished, 0.0, jnp.minimum(dt, t_final - t))
            dt_safe = jnp.where(dt == 0.0, 1.0, dt)

            # ---- stage loop (k1 = FSAL carry seeds row 0)
            ks_buf[pl.ds(0, B)] = fv
            row0 = tab_ref[pl.ds(0, 1), :]
            acc0 = (y + (dt * row0[0, 7]) * fv, row0[0, 8] * fv)

            def stage(j, acc):
                y1a, yea = acc
                row = tab_ref[pl.ds(j, 1), :]
                incr = row[0, 0] * ks_buf[pl.ds(0, B)]
                for l in range(1, 6):
                    incr = incr + row[0, l] * ks_buf[pl.ds(l * B, B)]
                kj = field(y + dt * incr)
                ks_buf[pl.ds(j * B, B)] = kj
                return (y1a + (dt * row[0, 7]) * kj, yea + row[0, 8] * kj)

            y1, yerr_s = jax.lax.fori_loop(1, 7, stage, acc0)
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

            # ---- attempt records (the frozen mesh the backward replays)
            rec = jnp.stack([dt, adv.astype(jnp.float32), t,
                             jnp.float32(0.0)])[None, :]
            tda_ref[pl.ds(m, 1), :] = rec
            yrec_ref[pl.ds(m, 1)] = y[None]
            krec_ref[pl.ds(m, 1)] = ks_buf[:].reshape(7, B, D)[None]

            return (m + 1, t_new, dt_next,
                    jnp.where(adv, err, errp),
                    jnp.where(adv, y1, y),
                    jnp.where(adv, k7, fv))

        def cond(carry):
            m, t = carry[0], carry[1]
            return (m < max_steps) & (t < t_final - tiny)

        m, t, dt, errp, y, fv = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.float32(0.0), dt0,
                         jnp.float32(1.0), y0, f0))

        out_ref[:] = y
        misc_ref[:] = jnp.stack(
            [m.astype(jnp.float32), t, jnp.float32(0.0),
             jnp.float32(0.0)])[None, :]

    return kernel


def _make_bwd_kernel(dims1, dims2, B, D, hidden, gate_slope, alpha,
                     h_bound, dh_clip, max_steps):
    """Reverse replay of recorded attempts; hand VJP of the ferro field."""
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    L1, L2 = in1 * K1, in2 * K2
    inv_hb = 1.0 / h_bound

    def kernel(ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref, tab_ref,
               r1_ref, r2_ref, *refs):
        prm1 = [r[:] for r in refs[:_N_PRM]]
        prm2 = [r[:] for r in refs[_N_PRM:2 * _N_PRM]]
        grads1 = refs[2 * _N_PRM:3 * _N_PRM]
        grads2 = refs[3 * _N_PRM:4 * _N_PRM]
        h0bar_ref = refs[4 * _N_PRM]
        (z_buf, dh_buf, zb_buf, ub_buf, kbar_buf, xk1_buf,
         xk2_buf) = refs[4 * _N_PRM + 1:]

        for gr in list(grads1) + list(grads2):
            gr[:] = jnp.zeros_like(gr)

        ones1 = jnp.ones((1, L1), jnp.float32)
        ones2 = jnp.ones((1, L2), jnp.float32)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def field_vjp(u, w):
            """Cotangent of the field at input u: recompute forward
            intermediates, backward through clamp -> ferro2 -> tanh ->
            ferro1 -> bound, accumulating parameter gradients."""
            hb = h_bound * jnp.tanh(u * inv_hb)
            xk1_buf[:] = _dot(hb, r1_ref[:], 1, 1)         # (B, L1)

            def f1(b, _):
                row = xk1_buf[pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out1, L1))
                _, _, _, _, fb = _ferro_rows(xf, prm1, gate_slope, alpha)
                z_buf[pl.ds(b, 1), :] = jnp.tanh(
                    _dot(ones1, fb * prm1[4], 1, 1))
                return 0

            jax.lax.fori_loop(0, B, f1, 0)
            z = z_buf[:]
            xk2_buf[:] = _dot(z, r2_ref[:], 1, 1)          # (B, L2)

            def f2(b, _):
                row = xk2_buf[pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (out2, L2))
                _, _, _, _, fb = _ferro_rows(xf, prm2, gate_slope, alpha)
                dh_buf[pl.ds(b, 1), :] = _dot(ones2, fb * prm2[4], 1, 1)
                return 0

            jax.lax.fori_loop(0, B, f2, 0)
            dh_raw = dh_buf[:]

            # clamp mask (jnp.clip passes gradient strictly inside)
            w2 = w * ((dh_raw > -dh_clip) & (dh_raw < dh_clip)).astype(
                jnp.float32)                                # (B, D)

            def bwd_layer(b, xk_buf, prm, grads, wmat, outs, L):
                """One sample's VJP through one ferro layer; returns the
                (1, L) lane cotangent of the layer's replicated input.
                ``wmat`` is the (B, out) output cotangent; the sample's
                column is fetched by a one-hot matmul (no transpose, no
                minormost dynamic slice — both are Mosaic slow/no paths).
                """
                g_fk, g_fec, g_fps, g_fbias, g_fcoef = grads
                fk, fec, fps, fbias, fcoef = prm
                row = xk_buf[pl.ds(b, 1), :]
                xf = jnp.broadcast_to(row, (outs, L))
                mu, cn, beta, th, fb = _ferro_rows(xf, prm, gate_slope,
                                                   alpha)
                e_b = (iota_b == b).astype(jnp.float32)      # (B, 1)
                wcol = _dot(wmat, e_b, 0, 0)                 # (out, 1)
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

            def b2(b, _):
                lanes = bwd_layer(b, xk2_buf, prm2, grads2, w2, out2, L2)
                zb_buf[pl.ds(b, 1), :] = _dot(lanes, r2_ref[:], 1, 0)
                return 0

            jax.lax.fori_loop(0, B, b2, 0)
            zbar = zb_buf[:] * (1.0 - z * z)                 # tanh link

            def b1(b, _):
                lanes = bwd_layer(b, xk1_buf, prm1, grads1, zbar, out1, L1)
                ub_buf[pl.ds(b, 1), :] = _dot(lanes, r1_ref[:], 1, 0)
                return 0

            jax.lax.fori_loop(0, B, b1, 0)
            # bound chain: d hb/du = 1 - (hb/h_bound)^2
            return ub_buf[:] * (1.0 - (hb * inv_hb) ** 2)

        lam = ybar_ref[:]                                    # (B, D)

        def body(carry):
            m, lam = carry
            mm = m - 1
            rec = tda_ref[pl.ds(mm, 1), :]
            dt = rec[0, 0]
            adv = rec[0, 1]
            y = yrec_ref[pl.ds(mm, 1)][0]                    # (B, D)
            ksall = krec_ref[pl.ds(mm, 1)][0].reshape(7 * B, D)

            lam_m = adv * lam
            for j in range(7):
                kbar_buf[pl.ds(j * B, B)] = (
                    dt * DOPRI5.b[j]) * lam_m

            def rev_stage(i, ybar_m):
                j = 6 - i
                row = tab_ref[pl.ds(j, 1), :]
                incr = row[0, 0] * ksall[0:B]
                for l in range(1, 6):
                    incr = incr + row[0, l] * ksall[l * B:(l + 1) * B]
                u = y + dt * incr
                ub = field_vjp(u, kbar_buf[pl.ds(j * B, B)])
                for l in range(6):
                    kbar_buf[pl.ds(l * B, B)] += (dt * row[0, l]) * ub
                return ybar_m + ub

            ybar_m = jax.lax.fori_loop(0, 7, rev_stage, lam_m)
            lam = jnp.where(adv > 0.5, ybar_m, lam)
            return (mm, lam)

        _, lam = jax.lax.while_loop(lambda c: c[0] > 0, body, (n_att, lam))
        h0bar_ref[:] = lam

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
                           atol=1e-3, max_steps=16, interpret=False):
    """Differentiable whole-solve for the 2-ferro-layer latent field.

    Returns ``solve(fc1, fc2, h0) -> hT`` ((B, D) -> (B, D), solve over
    t in [0, 1]) with a custom VJP (discrete adjoint, frozen mesh).
    ``fc1``/``fc2`` are the ferro param dicts of models/ecg.py;
    ``dims*`` are (in, out, K) tuples.
    """
    in1, out1, K1 = dims1
    in2, out2, K2 = dims2
    if in2 != out1 or out2 != in1:
        raise ValueError("field must map D -> hidden -> D")
    D, hidden = in1, out1
    f32 = jnp.float32
    M = max_steps

    def _prep(fc1, fc2):
        return (_flatten_ferro(fc1, dims1) + _flatten_ferro(fc2, dims2),
                _repeat_mat(in1, K1), _repeat_mat(in2, K2))

    def _fwd_call(fc1, fc2, h0):
        B = h0.shape[0]
        flat, r1, r2 = _prep(fc1, fc2)
        kernel = _make_fwd_kernel(dims1, dims2, B, D, hidden, gate_slope,
                                  alpha, h_bound, dh_clip, M, rtol, atol)
        inputs = [h0.astype(f32), _tableau_table(), r1, r2] + flat
        out_shapes = [
            jax.ShapeDtypeStruct((B, D), f32),           # hT
            jax.ShapeDtypeStruct((M, 4), f32),           # dt/adv/t records
            jax.ShapeDtypeStruct((M, B, D), f32),        # y per attempt
            jax.ShapeDtypeStruct((M, 7, B, D), f32),     # ks per attempt
            jax.ShapeDtypeStruct((1, 4), f32),           # n_att, t_end
        ]
        scratch = [pltpu.VMEM((B, hidden), f32),         # z
                   pltpu.VMEM((B, D), f32),              # dh
                   pltpu.VMEM((7 * B, D), f32),          # ks
                   pltpu.VMEM((B, in1 * K1), f32),       # xk1
                   pltpu.VMEM((B, in2 * K2), f32)]       # xk2
        hT, tda, yrec, krec, misc = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)
        return hT, (tda, yrec, krec, misc)

    def _bwd_call(fc1, fc2, recs, ct):
        tda, yrec, krec, misc = recs
        B = ct.shape[0]
        flat, r1, r2 = _prep(fc1, fc2)
        kernel = _make_bwd_kernel(dims1, dims2, B, D, hidden, gate_slope,
                                  alpha, h_bound, dh_clip, M)
        inputs = [ct.astype(f32), tda, yrec, krec, misc,
                  _tableau_table(), r1, r2] + flat
        out_shapes = (
            [jax.ShapeDtypeStruct((out1, in1 * K1), f32)] * _N_PRM
            + [jax.ShapeDtypeStruct((out2, in2 * K2), f32)] * _N_PRM
            + [jax.ShapeDtypeStruct((B, D), f32)])
        scratch = [pltpu.VMEM((B, hidden), f32),         # z
                   pltpu.VMEM((B, D), f32),              # dh
                   pltpu.VMEM((B, hidden), f32),         # zbar
                   pltpu.VMEM((B, D), f32),              # ubar
                   pltpu.VMEM((7 * B, D), f32),          # kbar
                   pltpu.VMEM((B, in1 * K1), f32),       # xk1
                   pltpu.VMEM((B, in2 * K2), f32)]       # xk2
        results = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * len(out_shapes),
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)
        g1 = _unflatten_ferro(results[:_N_PRM], dims1, fc1)
        g2 = _unflatten_ferro(results[_N_PRM:2 * _N_PRM], dims2, fc2)
        return g1, g2, results[-1]

    @jax.custom_vjp
    def solve(fc1, fc2, h0):
        hT, _ = _fwd_call(fc1, fc2, h0)
        return hT.astype(h0.dtype)

    def fwd(fc1, fc2, h0):
        hT, recs = _fwd_call(fc1, fc2, h0)
        return hT.astype(h0.dtype), (fc1, fc2, h0, recs)

    def bwd(res, ct):
        fc1, fc2, h0, recs = res
        g1, g2, h0bar = _bwd_call(fc1, fc2, recs, ct)
        return g1, g2, h0bar.astype(h0.dtype)

    solve.defvjp(fwd, bwd)
    solve.fwd_with_records = _fwd_call   # test hook (frozen-mesh oracle)
    return solve


def pallas_ferro_node_solve(fc1, fc2, h0, spec, *, interpret=None):
    """Solve the ``KanFetMLPNODESpec`` latent ODE with the in-kernel
    adjoint.  ``spec`` must be a clean dopri5 config (``noise_std == 0``).
    ``interpret=None`` auto-selects interpret mode on the CPU backend.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if spec.noise_std > 0.0:
        raise ValueError("pallas ferro-NODE kernel has no device noise; "
                         "use the XLA path")
    c1, c2 = spec.fc1_cfg, spec.fc2_cfg
    fn = make_ferro_node_solver(
        (c1.in_dim, c1.out_dim, c1.num_basis),
        (c2.in_dim, c2.out_dim, c2.num_basis),
        gate_slope=c1.gate_slope, alpha=c1.alpha, h_bound=spec.h_bound,
        dh_clip=spec.dh_clip, rtol=spec.rtol, atol=spec.atol,
        max_steps=spec.max_steps, interpret=interpret)
    return fn(fc1, fc2, h0)
