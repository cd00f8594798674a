"""Whole-solve Pallas kernel + in-kernel discrete adjoint for the ECG
``KanFetNODE`` 'mlp' latent field (models/ecg.py: ``kanfet_node_field``
with ``field="mlp"`` — the rebuild of the reference's ``MLPKANODEFunc``,
train_ecg_kan_fet_nn_ode.py:423-481):

    h   = LayerNorm(y) ; h = h_bound * tanh(h / h_bound)
    phi = sigmoid( 2*sigmoid(a * (h_k - b)) )          # logistic mixer, (B, L=D*K)
    z   = SiLU( KAN_2( KAN_1(phi) ) )                  # two B-spline KAN layers
    dy  = scale * softplus(log_alpha) * (z @ W_out^T + b_out)

This completes the whole-solve kernel family: every ECG NODE field
(ferro MLP — ops/pallas_ferro_node.py; logistic 'plain' —
ops/pallas_logistic_node.py; and now the KAN-stack 'mlp' field) trains
through one forward kernel that records the adaptive dopri5 attempt mesh
and one backward kernel that replays it with a hand-written field VJP
(scaffold: ops/pallas_node_common.py).

The new in-kernel piece is the B-spline branch of ``KANLinear``: the
Cox–de Boor recursion is unrolled over knot intervals as (B, in) VPU
tiles (degree 3, 12 knots -> 8 basis columns; math mirrors
ops/bsplines.py: bspline_basis, the rebuild of efficientkan.py:117-131),
the per-column spline matmuls ride the MXU against a column-major
(C*H, in) weight layout, and the backward uses the analytic derivative
  dB3_j/dx = 3*( B2_j/(g_{j+3}-g_j) - B2_{j+1}/(g_{j+4}-g_{j+1}) )
which equals autodiff of the recursion exactly (polynomial identity), so
gradients match the XLA scan path to fp tolerance.

Only the init-time KAN geometry of ``KanFetNODESpec.kan_cfg`` is
supported (two layers [L, H, H], grid 5, order 3, standalone spline
scaler); the scaler chain rule is applied host-side on the scaled-weight
cotangent.

VMEM budget (everything VMEM-resident, no grid): the backward kernel
holds the layer-1 scaled-spline weight AND its gradient, (C*H, L) f32
each — ~2.6 MB apiece at the default spec (D=64, K=10, H=128, L=640) and
~3.1 MB at the ECG preset's K=12 — plus base weights, layer-2 blocks,
and the (M, 7, B, D) attempt records.  Default-spec total ≈ 11 MB; K or
H much beyond the preset will exceed the ~16 MB VMEM of a v5e core, at
which point the spline weights need an in-kernel batch/feature grid or
HBM-resident records.  Not yet measured on chip (tunnel outage; see
benchmarks/run_ecg_mlp_kernel.py).
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

_ORDER = 3          # spline_order of KanFetNODESpec.kan_cfg (KANConfig.make default)
_C = 5 + _ORDER     # n_coeff = grid_size + order = 8 basis columns
_NK = 5 + 2 * _ORDER + 1   # 12 knots per feature

# The default-spec kernels stack ~16.6 MB of refs + temporaries (measured
# on-chip: "16.56M and limit 16.00M ... by 576.5K") — past Mosaic's 16 MB
# default.  K/H far past the preset will still OOM for real.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _bspline_cols(x, g_ref, upto=_ORDER):
    """Degree-``upto`` B-spline basis columns of ``x`` (B, in) against the
    knot rows ``g_ref`` ((NK, in) VMEM ref): a Python list of (B, in)
    arrays, one per basis column — the Cox–de Boor recursion of
    ops/bsplines.py unrolled over intervals."""
    g = [g_ref[pl.ds(j, 1), :] for j in range(_NK)]     # (1, in) knot rows
    b = [((x >= g[j]) & (x < g[j + 1])).astype(jnp.float32)
         for j in range(_NK - 1)]
    for k in range(1, upto + 1):
        b = [(x - g[j]) / (g[j + k] - g[j]) * b[j]
             + (g[j + k + 1] - x) / (g[j + k + 1] - g[j + 1]) * b[j + 1]
             for j in range(len(b) - 1)]
    return b


def _bspline_dcols(x, g_ref):
    """Analytic x-derivative of each degree-3 basis column: list of
    (B, in) arrays (length _C)."""
    b2 = _bspline_cols(x, g_ref, upto=_ORDER - 1)        # 9 degree-2 columns
    g = [g_ref[pl.ds(j, 1), :] for j in range(_NK)]
    return [_ORDER * (b2[j] / (g[j + _ORDER] - g[j])
                      - b2[j + 1] / (g[j + _ORDER + 1] - g[j + 1]))
            for j in range(_C)]


def _kan_layer_fwd(x, g_ref, bw_ref, sw_ref, H):
    """One KANLinear forward: silu-base matmul + per-column spline
    matmuls against the (C*H, in) scaled-weight layout.  Returns
    ``(y, cols)`` — the basis columns are reused by the VJP so the
    reverse pass runs the Cox–de Boor recursion once, not twice."""
    cols = _bspline_cols(x, g_ref)
    y = _dot(_silu(x), bw_ref[:], 1, 1)
    for c in range(_C):
        y = y + _dot(cols[c], sw_ref[pl.ds(c * H, H)], 1, 1)
    return y, cols


def _kan_layer_bwd(x, cols, ybar, g_ref, bw_ref, sw_ref, gbw_ref, gsw_ref,
                   H):
    """VJP of one KANLinear: accumulates base/scaled-spline weight grads
    into ``gbw_ref``/``gsw_ref`` and returns the input cotangent.
    ``cols`` is the forward's basis-column list (recomputed only at
    degree 2 for the analytic derivative)."""
    gbw_ref[:] += _dot(ybar, _silu(x), 0, 0)
    xbar = _dot(ybar, bw_ref[:], 1, 0) * _dsilu(x)
    dcols = _bspline_dcols(x, g_ref)
    for c in range(_C):
        gsw_ref[pl.ds(c * H, H)] += _dot(ybar, cols[c], 0, 0)
        xbar = xbar + _dot(ybar, sw_ref[pl.ds(c * H, H)], 1, 0) * dcols[c]
    return xbar


def _ln_tanh_mixer_fwd(y, ls, lb, av, bv, r_ref, h_bound, eps=1e-5):
    """LayerNorm -> tanh bound -> logistic mixer; returns
    (phi, intermediates) for reuse in the VJP."""
    mu = jnp.mean(y, axis=1, keepdims=True)
    xc = y - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = xc * rstd
    hln = xn * ls + lb
    th = jnp.tanh(hln / h_bound)
    hb = h_bound * th
    xk = _dot(hb, r_ref[:], 1, 1)                       # (B, L)
    s1 = jax.nn.sigmoid(av * (xk - bv))
    phi = jax.nn.sigmoid(2.0 * s1)
    return phi, (xn, rstd, th, xk, s1)


def _make_fwd_kernel(B, D, H, max_steps, rtol, atol, h_bound):
    def kernel(h0_ref, tab_ref, r_ref, ls_ref, lb_ref, av_ref, bv_ref,
               g1_ref, bw1_ref, sw1_ref, g2_ref, bw2_ref, sw2_ref,
               ow_ref, ob_ref, eff_ref,
               out_ref, tda_ref, yrec_ref, krec_ref, misc_ref, ks_buf):
        ls, lb = ls_ref[:], lb_ref[:]
        av, bv = av_ref[:], bv_ref[:]
        eff = eff_ref[0, 0]

        def field(y):                                   # (B, D)
            phi, _ = _ln_tanh_mixer_fwd(y, ls, lb, av, bv, r_ref, h_bound)
            y1, _ = _kan_layer_fwd(phi, g1_ref, bw1_ref, sw1_ref, H)
            y2, _ = _kan_layer_fwd(y1, g2_ref, bw2_ref, sw2_ref, H)
            dh = _dot(_silu(y2), ow_ref[:], 1, 1) + ob_ref[:]
            return eff * dh

        adaptive_solve_final(field, h0_ref[:], tab_ref, out_ref, tda_ref,
                             yrec_ref, krec_ref, misc_ref, ks_buf, B, D,
                             max_steps, rtol, atol)

    return kernel


def _make_bwd_kernel(B, D, H, h_bound):
    def kernel(ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref, tab_ref,
               r_ref, ls_ref, lb_ref, av_ref, bv_ref,
               g1_ref, bw1_ref, sw1_ref, g2_ref, bw2_ref, sw2_ref,
               ow_ref, ob_ref, eff_ref,
               gls_ref, glb_ref, gav_ref, gbv_ref, gbw1_ref, gsw1_ref,
               gbw2_ref, gsw2_ref, gow_ref, gob_ref, geff_ref,
               h0bar_ref, kbar_buf):
        for gr in (gls_ref, glb_ref, gav_ref, gbv_ref, gbw1_ref, gsw1_ref,
                   gbw2_ref, gsw2_ref, gow_ref, gob_ref, geff_ref):
            gr[:] = jnp.zeros_like(gr)
        ls, lb = ls_ref[:], lb_ref[:]
        av, bv = av_ref[:], bv_ref[:]
        eff = eff_ref[0, 0]
        ones_b = jnp.ones((1, B), jnp.float32)
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def field_vjp(u, w):
            phi, (xn, rstd, th, xk, s1) = _ln_tanh_mixer_fwd(
                u, ls, lb, av, bv, r_ref, h_bound)
            y1, cols1 = _kan_layer_fwd(phi, g1_ref, bw1_ref, sw1_ref, H)
            y2, cols2 = _kan_layer_fwd(y1, g2_ref, bw2_ref, sw2_ref, H)
            z = _silu(y2)
            dh = _dot(z, ow_ref[:], 1, 1) + ob_ref[:]

            geff_ref[:] += jnp.sum(w * dh)
            wdh = eff * w                               # (B, D)
            gow_ref[:] += _dot(wdh, z, 0, 0)            # (D, H)
            gob_ref[:] += _dot(ones_b, wdh, 1, 0)       # (1, D)
            y2bar = _dot(wdh, ow_ref[:], 1, 0) * _dsilu(y2)
            y1bar = _kan_layer_bwd(y1, cols2, y2bar, g2_ref, bw2_ref,
                                   sw2_ref, gbw2_ref, gsw2_ref, H)
            phibar = _kan_layer_bwd(phi, cols1, y1bar, g1_ref, bw1_ref,
                                    sw1_ref, gbw1_ref, gsw1_ref, H)

            # mixer: phi = sigmoid(2*sigmoid(av*(xk-bv)))
            zb = phibar * (2.0 * phi * (1.0 - phi)) * (s1 * (1.0 - s1))
            gav_ref[:] += _dot(ones_b, zb * (xk - bv), 1, 0)
            gbv_ref[:] += _dot(ones_b, -zb * av, 1, 0)
            hbbar = _dot(zb * av, r_ref[:], 1, 0)       # (B, D)

            # tanh bound: hb = h_bound*tanh(hln/h_bound)
            hlnbar = hbbar * (1.0 - th * th)
            gls_ref[:] += _dot(ones_b, hlnbar * xn, 1, 0)
            glb_ref[:] += _dot(ones_b, hlnbar, 1, 0)
            xnbar = hlnbar * ls
            # layer norm backward (mean/var over the D axis)
            m1 = jnp.mean(xnbar, axis=1, keepdims=True)
            m2 = jnp.mean(xnbar * xn, axis=1, keepdims=True)
            return rstd * (xnbar - m1 - xn * m2)

        h0bar_ref[:] = adjoint_replay(field_vjp, ybar_ref[:], tab_ref,
                                      tda_ref, yrec_ref, krec_ref, n_att,
                                      kbar_buf, B, D)

    return kernel


@functools.lru_cache(maxsize=16)
def make_mlp_node_solver(D, K, H, rtol=1e-2, atol=1e-3, max_steps=16,
                         h_bound=1.0, interpret=False):
    """Differentiable whole-solve for the 'mlp' latent field.

    Returns ``solve(fp, h0) -> hT`` with a custom VJP (discrete adjoint
    on the frozen attempt mesh).  ``fp`` is the field-parameter dict:
    ``{ln_scale, ln_bias, field_mixer: {a, b}, kan: [layer1, layer2],
    out_w, out_b, log_alpha, scale}`` exactly as stored in the
    ``KanFetNODESpec(field='mlp')`` model params.
    """
    f32 = jnp.float32
    L = D * K
    M = max_steps

    def _sw_flat(layer, H_out):
        """(out, in, C) scaled spline weight -> kernel layout (C*out, in)."""
        sw = layer["spline_weight"] * layer["spline_scaler"][..., None]
        return jnp.transpose(sw.astype(f32), (2, 0, 1)).reshape(
            _C * H_out, -1)

    def _prep(fp):
        l1, l2 = fp["kan"]
        eff = fp["scale"] * jax.nn.softplus(fp["log_alpha"])
        return [jnp.repeat(jnp.eye(D, dtype=f32), K, axis=0),    # r (L, D)
                fp["ln_scale"][None].astype(f32),                # (1, D)
                fp["ln_bias"][None].astype(f32),
                fp["field_mixer"]["a"].reshape(1, L).astype(f32),
                fp["field_mixer"]["b"].reshape(1, L).astype(f32),
                l1["_buffers"]["grid"].T.astype(f32),            # (NK, L)
                l1["base_weight"].astype(f32),                   # (H, L)
                _sw_flat(l1, H),                                 # (C*H, L)
                l2["_buffers"]["grid"].T.astype(f32),            # (NK, H)
                l2["base_weight"].astype(f32),                   # (H, H)
                _sw_flat(l2, H),                                 # (C*H, H)
                fp["out_w"].astype(f32),                         # (D, H)
                fp["out_b"][None].astype(f32),                   # (1, D)
                eff.reshape(1, 1).astype(f32)]

    def _fwd_call(fp, h0):
        B = h0.shape[0]
        inputs = [h0.astype(f32), tableau_table()] + _prep(fp)
        out_shapes = [
            jax.ShapeDtypeStruct((B, D), f32),
            jax.ShapeDtypeStruct((M, 4), f32),
            jax.ShapeDtypeStruct((M, B, D), f32),
            jax.ShapeDtypeStruct((M, 7, B, D), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ]
        hT, tda, yrec, krec, misc = pl.pallas_call(
            _make_fwd_kernel(B, D, H, M, rtol, atol, h_bound),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(*inputs)
        return hT, (tda, yrec, krec, misc)

    def _bwd_call(fp, recs, ct):
        tda, yrec, krec, misc = recs
        B = ct.shape[0]
        inputs = [ct.astype(f32), tda, yrec, krec, misc,
                  tableau_table()] + _prep(fp)
        out_shapes = [jax.ShapeDtypeStruct((1, D), f32),       # gls
                      jax.ShapeDtypeStruct((1, D), f32),       # glb
                      jax.ShapeDtypeStruct((1, L), f32),       # gav
                      jax.ShapeDtypeStruct((1, L), f32),       # gbv
                      jax.ShapeDtypeStruct((H, L), f32),       # gbw1
                      jax.ShapeDtypeStruct((_C * H, L), f32),  # gsw1
                      jax.ShapeDtypeStruct((H, H), f32),       # gbw2
                      jax.ShapeDtypeStruct((_C * H, H), f32),  # gsw2
                      jax.ShapeDtypeStruct((D, H), f32),       # gow
                      jax.ShapeDtypeStruct((1, D), f32),       # gob
                      jax.ShapeDtypeStruct((1, 1), f32),       # geff
                      jax.ShapeDtypeStruct((B, D), f32)]       # h0bar
        outs = pl.pallas_call(
            _make_bwd_kernel(B, D, H, h_bound),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes),
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            compiler_params=_VMEM_LIMIT,
            interpret=interpret,
        )(*inputs)
        (gls, glb, gav, gbv, gbw1, gsw1, gbw2, gsw2, gow, gob, geff,
         h0bar) = outs

        def _sw_chain(layer, gsw_flat, H_out):
            """Kernel scaled-weight cotangent -> (spline_weight, scaler)."""
            gsc = jnp.transpose(gsw_flat.reshape(_C, H_out, -1), (1, 2, 0))
            sw, sc = layer["spline_weight"], layer["spline_scaler"]
            return (gsc * sc[..., None]).astype(sw.dtype), \
                jnp.sum(gsc * sw, axis=-1).astype(sc.dtype)

        l1, l2 = fp["kan"]
        gs1, gc1 = _sw_chain(l1, gsw1, H)
        gs2, gc2 = _sw_chain(l2, gsw2, H)
        ge = geff[0, 0]
        sp = jax.nn.softplus(fp["log_alpha"])
        g_fp = {
            "ln_scale": gls[0].astype(fp["ln_scale"].dtype),
            "ln_bias": glb[0].astype(fp["ln_bias"].dtype),
            "field_mixer": {
                "a": gav.reshape(D, K).astype(fp["field_mixer"]["a"].dtype),
                "b": gbv.reshape(D, K).astype(fp["field_mixer"]["b"].dtype)},
            "kan": [
                {"_buffers": {"grid": jnp.zeros_like(l1["_buffers"]["grid"])},
                 "base_weight": gbw1.astype(l1["base_weight"].dtype),
                 "spline_weight": gs1, "spline_scaler": gc1},
                {"_buffers": {"grid": jnp.zeros_like(l2["_buffers"]["grid"])},
                 "base_weight": gbw2.astype(l2["base_weight"].dtype),
                 "spline_weight": gs2, "spline_scaler": gc2}],
            "out_w": gow.astype(fp["out_w"].dtype),
            "out_b": gob[0].astype(fp["out_b"].dtype),
            "log_alpha": (ge * fp["scale"]
                          * jax.nn.sigmoid(fp["log_alpha"])).astype(
                              fp["log_alpha"].dtype),
            "scale": (ge * sp).astype(fp["scale"].dtype),
        }
        return g_fp, h0bar

    @jax.custom_vjp
    def solve(fp, h0):
        hT, _ = _fwd_call(fp, h0)
        return hT.astype(h0.dtype)

    def fwd(fp, h0):
        hT, recs = _fwd_call(fp, h0)
        return hT.astype(h0.dtype), (fp, h0, recs)

    def bwd(res, ct):
        fp, h0, recs = res
        g_fp, h0bar = _bwd_call(fp, recs, ct)
        return g_fp, h0bar.astype(h0.dtype)

    solve.defvjp(fwd, bwd)
    solve.fwd_with_records = _fwd_call
    return solve


_FIELD_KEYS = ("ln_scale", "ln_bias", "field_mixer", "kan", "out_w",
               "out_b", "log_alpha", "scale")


def pallas_mlp_node_solve_sharded(params, h0, spec, mesh, *,
                                  axis="data", interpret=None):
    """Data-parallel whole-solve over a device mesh (see
    pallas_logistic_node.pallas_logistic_node_solve_sharded)."""
    if interpret is None:
        interpret = interpret_default()
    from jax.sharding import PartitionSpec as P

    if h0.shape[0] % mesh.shape[axis]:
        raise ValueError(f"batch {h0.shape[0]} not divisible by "
                         f"{axis}={mesh.shape[axis]}")
    fn = make_mlp_node_solver(spec.latent_dim, spec.num_basis,
                              spec.ode_hidden, rtol=spec.rtol,
                              atol=spec.atol, max_steps=spec.max_steps,
                              h_bound=spec.h_bound, interpret=interpret)
    solve = jax.shard_map(
        lambda fp, h: fn(fp, h), mesh=mesh,
        in_specs=(P(), P(axis)), out_specs=P(axis), check_vma=False)
    return solve({k: params[k] for k in _FIELD_KEYS}, h0)


def pallas_mlp_node_solve(params, h0, spec, *, interpret=None):
    """Solve the ``KanFetNODESpec`` (field='mlp') latent ODE with the
    in-kernel adjoint.  ``params`` is the model param dict."""
    if interpret is None:
        interpret = interpret_default()
    fn = make_mlp_node_solver(spec.latent_dim, spec.num_basis,
                              spec.ode_hidden, rtol=spec.rtol,
                              atol=spec.atol, max_steps=spec.max_steps,
                              h_bound=spec.h_bound, interpret=interpret)
    return fn({k: params[k] for k in _FIELD_KEYS}, h0)
