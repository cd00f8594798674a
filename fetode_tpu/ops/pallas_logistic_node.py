"""Whole-solve Pallas kernel + in-kernel discrete adjoint for the ECG
``KanFetNODE`` 'plain' latent field (models/ecg.py: ``kanfet_node_field``
with ``field="plain"`` — the rebuild of the reference's
``No_MLP_KANODEFunc``, train_ecg_kan_fet_nn_ode.py:483-508):

    phi = sigmoid( 2*sigmoid(a * (h - b)) )   # logistic mixer, (B, D*K)
    dh  = phi @ W_proj^T + b_proj

Unlike the ferro field (ops/pallas_ferro_node.py) the logistic params
are per-(in, K) — no out-dimension — so the whole field vectorizes over
the batch with no per-sample loop: the in->in*K replication is one MXU
repetition matmul and every VJP reduction is a matmul.  Solve/replay
scaffolding shared via ops/pallas_node_common.py (global step control
matching the XLA path, frozen-mesh discrete adjoint, final state only).

Field math citations: ops/logistic.py:32-41 (2*sigmoid(a(x-b))),
models/ecg.py:54-62 (mixer = sigmoid of the basis, flattened),
models/ecg.py:119-124 (plain field projection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import (
    _dot,
    adaptive_solve_final,
    adjoint_replay,
    tableau_table,
    interpret_default,
)


def _make_fwd_kernel(B, D, K, max_steps, rtol, atol):
    L = D * K

    def kernel(h0_ref, tab_ref, r_ref, av_ref, bv_ref, pw_ref, pb_ref,
               out_ref, tda_ref, yrec_ref, krec_ref, misc_ref, ks_buf):
        av, bv = av_ref[:], bv_ref[:]                      # (1, L)

        def field(y):                                      # (B, D)
            xk = _dot(y, r_ref[:], 1, 1)                   # (B, L)
            phi = jax.nn.sigmoid(2.0 * jax.nn.sigmoid(av * (xk - bv)))
            return _dot(phi, pw_ref[:], 1, 1) + pb_ref[:]  # (B, D)

        adaptive_solve_final(field, h0_ref[:], tab_ref, out_ref, tda_ref,
                             yrec_ref, krec_ref, misc_ref, ks_buf, B, D,
                             max_steps, rtol, atol)

    return kernel


def _make_bwd_kernel(B, D, K, max_steps):
    L = D * K

    def kernel(ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref, tab_ref,
               r_ref, av_ref, bv_ref, pw_ref, pb_ref,
               gav_ref, gbv_ref, gpw_ref, gpb_ref, h0bar_ref, kbar_buf):
        for gr in (gav_ref, gbv_ref, gpw_ref, gpb_ref):
            gr[:] = jnp.zeros_like(gr)
        av, bv = av_ref[:], bv_ref[:]
        ones_b = jnp.ones((1, B), jnp.float32)
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def field_vjp(u, w):
            xk = _dot(u, r_ref[:], 1, 1)                   # (B, L)
            s1 = jax.nn.sigmoid(av * (xk - bv))
            phi = jax.nn.sigmoid(2.0 * s1)
            gpw_ref[:] += _dot(w, phi, 0, 0)               # (D, L)
            gpb_ref[:] += _dot(ones_b, w, 1, 0)            # (1, D)
            phibar = _dot(w, pw_ref[:], 1, 0)              # (B, L)
            zb = phibar * (2.0 * phi * (1.0 - phi)) * (s1 * (1.0 - s1))
            gav_ref[:] += _dot(ones_b, zb * (xk - bv), 1, 0)
            gbv_ref[:] += _dot(ones_b, -zb * av, 1, 0)
            return _dot(zb * av, r_ref[:], 1, 0)           # (B, D)

        h0bar_ref[:] = adjoint_replay(field_vjp, ybar_ref[:], tab_ref,
                                      tda_ref, yrec_ref, krec_ref, n_att,
                                      kbar_buf, B, D)

    return kernel


@functools.lru_cache(maxsize=16)
def make_logistic_node_solver(D, K, rtol=1e-2, atol=1e-3, max_steps=16,
                              interpret=False):
    """Differentiable whole-solve for the logistic-mixer latent field.

    Returns ``solve(mixer, proj_w, proj_b, h0) -> hT`` with a custom VJP
    (discrete adjoint, frozen mesh).  ``mixer`` is the ``field_mixer``
    param dict {a, b} of models/ecg.py (each (D, K)); ``proj_w`` is
    (D, D*K), ``proj_b`` (D,).
    """
    f32 = jnp.float32
    L = D * K
    M = max_steps

    def _prep(mixer, proj_w, proj_b):
        return [jnp.repeat(jnp.eye(D, dtype=f32), K, axis=0),   # (L, D)
                mixer["a"].reshape(1, L).astype(f32),
                mixer["b"].reshape(1, L).astype(f32),
                proj_w.astype(f32),                             # (D, L)
                proj_b[None].astype(f32)]                       # (1, D)

    def _fwd_call(mixer, proj_w, proj_b, h0):
        B = h0.shape[0]
        inputs = [h0.astype(f32), tableau_table()] + _prep(mixer, proj_w,
                                                           proj_b)
        out_shapes = [
            jax.ShapeDtypeStruct((B, D), f32),
            jax.ShapeDtypeStruct((M, 4), f32),
            jax.ShapeDtypeStruct((M, B, D), f32),
            jax.ShapeDtypeStruct((M, 7, B, D), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ]
        hT, tda, yrec, krec, misc = pl.pallas_call(
            _make_fwd_kernel(B, D, K, M, rtol, atol),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            interpret=interpret,
        )(*inputs)
        return hT, (tda, yrec, krec, misc)

    def _bwd_call(mixer, proj_w, proj_b, recs, ct):
        tda, yrec, krec, misc = recs
        B = ct.shape[0]
        inputs = [ct.astype(f32), tda, yrec, krec, misc,
                  tableau_table()] + _prep(mixer, proj_w, proj_b)
        out_shapes = [jax.ShapeDtypeStruct((1, L), f32),
                      jax.ShapeDtypeStruct((1, L), f32),
                      jax.ShapeDtypeStruct((D, L), f32),
                      jax.ShapeDtypeStruct((1, D), f32),
                      jax.ShapeDtypeStruct((B, D), f32)]
        gav, gbv, gpw, gpb, h0bar = pl.pallas_call(
            _make_bwd_kernel(B, D, K, M),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            interpret=interpret,
        )(*inputs)
        g_mixer = {"a": gav.reshape(D, K).astype(mixer["a"].dtype),
                   "b": gbv.reshape(D, K).astype(mixer["b"].dtype)}
        return (g_mixer, gpw.astype(proj_w.dtype),
                gpb[0].astype(proj_b.dtype), h0bar)

    @jax.custom_vjp
    def solve(mixer, proj_w, proj_b, h0):
        hT, _ = _fwd_call(mixer, proj_w, proj_b, h0)
        return hT.astype(h0.dtype)

    def fwd(mixer, proj_w, proj_b, h0):
        hT, recs = _fwd_call(mixer, proj_w, proj_b, h0)
        return hT.astype(h0.dtype), (mixer, proj_w, proj_b, h0, recs)

    def bwd(res, ct):
        mixer, proj_w, proj_b, h0, recs = res
        g_mixer, g_pw, g_pb, h0bar = _bwd_call(mixer, proj_w, proj_b,
                                               recs, ct)
        return g_mixer, g_pw, g_pb, h0bar.astype(h0.dtype)

    solve.defvjp(fwd, bwd)
    solve.fwd_with_records = _fwd_call
    return solve


def pallas_logistic_node_solve_sharded(params, h0, spec, mesh, *,
                                       axis="data", interpret=None):
    """Data-parallel whole-solve over a device mesh (see
    pallas_ferro_node.pallas_ferro_node_solve_sharded)."""
    if interpret is None:
        interpret = interpret_default()
    from jax.sharding import PartitionSpec as P

    if h0.shape[0] % mesh.shape[axis]:
        raise ValueError(f"batch {h0.shape[0]} not divisible by "
                         f"{axis}={mesh.shape[axis]}")
    fn = make_logistic_node_solver(spec.latent_dim, spec.num_basis,
                                   rtol=spec.rtol, atol=spec.atol,
                                   max_steps=spec.max_steps,
                                   interpret=interpret)
    solve = jax.shard_map(
        lambda m, w, b, h: fn(m, w, b, h), mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)), out_specs=P(axis),
        check_vma=False)
    return solve(params["field_mixer"], params["proj_w"], params["proj_b"],
                 h0)


def pallas_logistic_node_solve(params, h0, spec, *, interpret=None):
    """Solve the ``KanFetNODESpec`` (field='plain') latent ODE with the
    in-kernel adjoint.  ``params`` is the model param dict (uses
    ``field_mixer``/``proj_w``/``proj_b``)."""
    if interpret is None:
        interpret = interpret_default()
    fn = make_logistic_node_solver(spec.latent_dim, spec.num_basis,
                                   rtol=spec.rtol, atol=spec.atol,
                                   max_steps=spec.max_steps,
                                   interpret=interpret)
    return fn(params["field_mixer"], params["proj_w"], params["proj_b"], h0)
