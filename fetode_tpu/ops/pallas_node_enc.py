"""Whole-solve Pallas kernel + in-kernel discrete adjoint for the
conditional-diffusion past encoder's NON-autonomous latent ODE
(models/cond_diffusion.py: ``node_encoder_apply`` — the rebuild of the
reference's ``PastEncoderNeuralODE`` + ``PastODEFunc``,
``/root/reference/kan_diffusion_ett.py:178-341``):

    dz/dt = MLP([LN(z), x(t)])      # silu hidden layers, linear output

where ``x(t)`` linearly interpolates the projected past signal on the
uniform grid t in [0, 1] (the reference's ``_interp_1d_batch``,
``kan_diffusion_ett.py:151-173`` — its self-reported worst hotspot:
"incredibly slow for large context lengths",
``train_kan_fet_ett.py:1154``).  The signal rides in VMEM as an
(L*B, P) table; each stage time costs two dynamic row reads + a lerp,
and the backward scatters the x(t) cotangent back into the same two
rows, so the full solve — interpolation included — runs as ONE kernel.

Scaffolding: the trajectory pair in ops/pallas_node_common.py
(``adaptive_solve_traj`` / ``adjoint_replay_traj``) at T=2 output times
([0, 1]; only the final state is consumed, CONTD5 at theta=1 is exactly
y1).  Step control is global (batch-shared) and the step mesh matches
the XLA ``solvers/dopri5.py`` path; every matmul runs on the MXU at
``Precision.HIGHEST`` (ops/pallas_adjoint.py: _dot).
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
    adaptive_solve_traj,
    adjoint_replay_traj,
    tableau_table,
    interpret_default,
)

_LN_EPS = 1e-5  # nn/mlp.py: layer_norm


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _signal_rows(xseq_ref, t, L, B):
    """Two adjacent rows + lerp weight for x(t) on the uniform [0,1] grid
    (matches ops/interp.py: linear_interp with ts = linspace(0,1,L))."""
    tf = jnp.clip(t, 0.0, 1.0) * (L - 1)
    i0 = jnp.clip(jnp.floor(tf).astype(jnp.int32), 0, L - 2)
    w = tf - i0.astype(jnp.float32)
    x0 = xseq_ref[pl.ds(i0 * B, B)]
    x1 = xseq_ref[pl.ds(i0 * B + B, B)]
    return x0, x1, w, i0


def _ln_fwd(y, scale, bias):
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    yhat = (y - mu) * rstd
    return yhat * scale + bias, yhat, rstd


def _make_fwd_kernel(C, P, H, L, B, max_steps, rtol, atol):
    def kernel(z0_ref, xseq_ref, ts_ref, tab_ref, lns_ref, lnb_ref,
               w1z_ref, w1x_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               out_ref, tda_ref, yrec_ref, krec_ref, misc_ref, ks_buf):
        def field(y, t):
            zn, _, _ = _ln_fwd(y, lns_ref[:], lnb_ref[:])
            x0, x1, w, _ = _signal_rows(xseq_ref, t, L, B)
            xt = x0 + w * (x1 - x0)
            h1 = _silu(_dot(zn, w1z_ref[:], 1, 1)
                       + _dot(xt, w1x_ref[:], 1, 1) + b1_ref[:])
            h2 = _silu(_dot(h1, w2_ref[:], 1, 1) + b2_ref[:])
            return _dot(h2, w3_ref[:], 1, 1) + b3_ref[:]

        adaptive_solve_traj(field, z0_ref[:], ts_ref[:], tab_ref, out_ref,
                            tda_ref, yrec_ref, krec_ref, misc_ref, ks_buf,
                            B, C, 2, max_steps, rtol, atol)

    return kernel


def _make_bwd_kernel(C, P, H, L, B, max_steps):
    def kernel(ybar_ref, xseq_ref, ts_ref, tab_ref, tda_ref, yrec_ref,
               krec_ref, misc_ref, lns_ref, lnb_ref, w1z_ref, w1x_ref,
               b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
               g_lns, g_lnb, g_w1z, g_w1x, g_b1, g_w2, g_b2, g_w3, g_b3,
               g_xseq, z0bar_ref, kbar_buf):
        for gr in (g_lns, g_lnb, g_w1z, g_w1x, g_b1, g_w2, g_b2, g_w3,
                   g_b3, g_xseq):
            gr[:] = jnp.zeros_like(gr)
        ones_b = jnp.ones((1, B), jnp.float32)

        def field_vjp(u, t, wbar):
            # recompute forward, keeping pre-activations
            zn, yhat, rstd = _ln_fwd(u, lns_ref[:], lnb_ref[:])
            x0, x1, w, i0 = _signal_rows(xseq_ref, t, L, B)
            xt = x0 + w * (x1 - x0)
            h1p = (_dot(zn, w1z_ref[:], 1, 1)
                   + _dot(xt, w1x_ref[:], 1, 1) + b1_ref[:])
            a1 = _silu(h1p)
            h2p = _dot(a1, w2_ref[:], 1, 1) + b2_ref[:]
            a2 = _silu(h2p)
            # output layer
            g_w3[:] += _dot(wbar, a2, 0, 0)
            g_b3[:] += _dot(ones_b, wbar, 1, 0)
            g2 = _dot(wbar, w3_ref[:], 1, 0) * _dsilu(h2p)
            g_w2[:] += _dot(g2, a1, 0, 0)
            g_b2[:] += _dot(ones_b, g2, 1, 0)
            g1 = _dot(g2, w2_ref[:], 1, 0) * _dsilu(h1p)
            g_w1z[:] += _dot(g1, zn, 0, 0)
            g_w1x[:] += _dot(g1, xt, 0, 0)
            g_b1[:] += _dot(ones_b, g1, 1, 0)
            gzn = _dot(g1, w1z_ref[:], 1, 0)                 # (B, C)
            gxt = _dot(g1, w1x_ref[:], 1, 0)                 # (B, P)
            # signal cotangent -> the two interpolation rows
            g_xseq[pl.ds(i0 * B, B)] += (1.0 - w) * gxt
            g_xseq[pl.ds(i0 * B + B, B)] += w * gxt
            # layer norm
            g_lns[:] += _dot(ones_b, gzn * yhat, 1, 0)
            g_lnb[:] += _dot(ones_b, gzn, 1, 0)
            gh = gzn * lns_ref[:]
            m1 = jnp.mean(gh, axis=-1, keepdims=True)
            m2 = jnp.mean(gh * yhat, axis=-1, keepdims=True)
            return rstd * (gh - m1 - yhat * m2)               # (B, C)

        z0bar_ref[:] = adjoint_replay_traj(
            field_vjp, ybar_ref, ts_ref[:], tab_ref, tda_ref, yrec_ref,
            krec_ref, misc_ref, kbar_buf, B, C, 2)

    return kernel


def _prep(field_layers, ln_scale, ln_bias, C):
    """Flat kernel param arrays: the field's first-layer weight (H, C+P)
    splits into its LN(z) block (H, C) and its x(t) block (H, P)."""
    f32 = jnp.float32
    w1 = field_layers[0]["w"].astype(f32)
    return [ln_scale[None].astype(f32), ln_bias[None].astype(f32),
            w1[:, :C], w1[:, C:], field_layers[0]["b"][None].astype(f32),
            field_layers[1]["w"].astype(f32),
            field_layers[1]["b"][None].astype(f32),
            field_layers[2]["w"].astype(f32),
            field_layers[2]["b"][None].astype(f32)]


@functools.lru_cache(maxsize=16)
def make_node_enc_solver(C, P, H, L, rtol=1e-3, atol=1e-4, max_steps=24,
                         interpret=False):
    """Differentiable whole-solve for one node-encoder configuration.

    Returns ``solve(field_layers, ln_scale, ln_bias, z0, x_seq) -> (B, C)``
    with a custom VJP (discrete adjoint on the frozen step mesh) —
    ``field_layers`` is the 3-layer mlp_init list for the
    (C+P, H, H, C) silu field, ``z0`` is (B, C), ``x_seq`` is (B, L, P).
    """
    f32 = jnp.float32
    M = max_steps
    comp = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_LIMIT_BYTES)) if not interpret else {}
    # numpy, not jnp: the first call may happen inside a jit trace, and a
    # traced constant captured by this (lru_cached) closure would leak
    # into later traces (observed UnexpectedTracerError)
    import numpy as np

    ts2 = np.asarray([[0.0], [1.0]], np.float32)

    def _xseq_table(x_seq, B):
        # (B, L, P) -> (L*B, P): row block l*B..l*B+B is x(t_l)
        return jnp.swapaxes(x_seq.astype(f32), 0, 1).reshape(L * B, P)

    def _fwd_call(field_layers, ln_scale, ln_bias, z0, x_seq):
        B = z0.shape[0]
        inputs = ([z0.astype(f32), _xseq_table(x_seq, B), ts2,
                   tableau_table()]
                  + _prep(field_layers, ln_scale, ln_bias, C))
        out_shapes = [
            jax.ShapeDtypeStruct((2, B, C), f32),
            jax.ShapeDtypeStruct((M, 4), f32),
            jax.ShapeDtypeStruct((M, B, C), f32),
            jax.ShapeDtypeStruct((M, 7, B, C), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ]
        traj, tda, yrec, krec, misc = pl.pallas_call(
            _make_fwd_kernel(C, P, H, L, B, M, rtol, atol),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=[pltpu.VMEM((7 * B, C), f32)],
            interpret=interpret,
            **comp,
        )(*inputs)
        return traj[1], (tda, yrec, krec, misc)

    def _bwd_call(field_layers, ln_scale, ln_bias, x_seq, recs, ct):
        tda, yrec, krec, misc = recs
        B = ct.shape[0]
        ybar = jnp.stack([jnp.zeros_like(ct, f32), ct.astype(f32)])
        flat = _prep(field_layers, ln_scale, ln_bias, C)
        inputs = [ybar, _xseq_table(x_seq, B), ts2, tableau_table(),
                  tda, yrec, krec, misc] + flat
        out_shapes = [jax.ShapeDtypeStruct(a.shape, f32) for a in flat]
        out_shapes.append(jax.ShapeDtypeStruct((L * B, P), f32))  # g_xseq
        out_shapes.append(jax.ShapeDtypeStruct((B, C), f32))      # z0bar
        results = pl.pallas_call(
            _make_bwd_kernel(C, P, H, L, B, M),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes),
            scratch_shapes=[pltpu.VMEM((7 * B, C), f32)],
            interpret=interpret,
            **comp,
        )(*inputs)
        g_flat, g_xseq, z0bar = results[:-2], results[-2], results[-1]
        return g_flat, g_xseq, z0bar

    def _grad_trees(field_layers, ln_scale, ln_bias, g_flat):
        g_lns, g_lnb, g_w1z, g_w1x, g_b1, g_w2, g_b2, g_w3, g_b3 = g_flat
        l = field_layers
        g_field = [
            {"w": jnp.concatenate([g_w1z, g_w1x], 1).astype(l[0]["w"].dtype),
             "b": g_b1[0].astype(l[0]["b"].dtype)},
            {"w": g_w2.astype(l[1]["w"].dtype),
             "b": g_b2[0].astype(l[1]["b"].dtype)},
            {"w": g_w3.astype(l[2]["w"].dtype),
             "b": g_b3[0].astype(l[2]["b"].dtype)},
        ]
        return (g_field, g_lns[0].astype(ln_scale.dtype),
                g_lnb[0].astype(ln_bias.dtype))

    @jax.custom_vjp
    def solve(field_layers, ln_scale, ln_bias, z0, x_seq):
        zT, _ = _fwd_call(field_layers, ln_scale, ln_bias, z0, x_seq)
        return zT.astype(z0.dtype)

    def fwd(field_layers, ln_scale, ln_bias, z0, x_seq):
        zT, recs = _fwd_call(field_layers, ln_scale, ln_bias, z0, x_seq)
        return (zT.astype(z0.dtype),
                (field_layers, ln_scale, ln_bias, z0, x_seq, recs))

    def bwd(res, ct):
        field_layers, ln_scale, ln_bias, z0, x_seq, recs = res
        g_flat, g_xseq, z0bar = _bwd_call(field_layers, ln_scale, ln_bias,
                                          x_seq, recs, ct)
        g_field, g_lns, g_lnb = _grad_trees(field_layers, ln_scale,
                                            ln_bias, g_flat)
        B = z0.shape[0]
        xseq_bar = jnp.swapaxes(g_xseq.reshape(L, B, P), 0,
                                1).astype(x_seq.dtype)
        return (g_field, g_lns, g_lnb, z0bar.astype(z0.dtype), xseq_bar)

    solve.defvjp(fwd, bwd)
    return solve


def pallas_node_enc_solve(params, cfg, z0, x_seq, *, interpret=None):
    """Final latent state of the node encoder's ODE via the in-kernel
    adjoint.  ``params``/``cfg`` are the ``node_encoder_init`` dict and
    the ``NodeEncoderCfg``; ``z0`` (B, C), ``x_seq`` (B, L, P) is the
    already-projected past signal.  ``interpret=None`` auto-selects:
    Mosaic on TPU, interpret mode on the CPU backend.
    """
    if interpret is None:
        interpret = interpret_default()
    fn = make_node_enc_solver(cfg.cond_dim, cfg.x_proj_dim, cfg.ode_hidden,
                              x_seq.shape[1], rtol=cfg.rtol, atol=cfg.atol,
                              max_steps=cfg.max_steps, interpret=interpret)
    return fn(params["field"], params["ln_scale"], params["ln_bias"],
              z0, x_seq)
