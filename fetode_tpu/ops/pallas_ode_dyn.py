"""Whole-solve Pallas kernel + in-kernel discrete adjoint for the
forecasting family's latent ODE field (models/forecasting.py:
``ode_dynamics_apply`` — the rebuild of the reference's ``ODEDynamics``,
``/root/reference/train_kan_fet_ett.py:136-152``):

    dz/dt = MLP([z, t])        # tanh hidden layers, linear output

This field is shared by the ETT/Time-MMD point forecaster AND all three
diffusion forecasters (``LatentODEForecaster`` / ``DiffusionForecaster``,
reference :154-197, :594-664, :667-737, :822-893), so one kernel covers
the whole family's NODE solve.  Unlike the classification NODEs
(final-state kernels in ops/pallas_{ferro,logistic,mlp}_node.py) the
forecaster needs the latent TRAJECTORY at every requested future time —
the solve/replay scaffolding is the trajectory pair in
ops/pallas_node_common.py (``adaptive_solve_traj`` /
``adjoint_replay_traj``): CONTD5 dense output in-kernel, dense-output
cotangents injected on the frozen mesh in the backward, global
(batch-shared) step control matching the XLA ``solvers/dopri5.py`` path.

The field is non-autonomous: the first layer's weight splits into a state
block (H, D) and a time column so the stage time rides in as a scalar
(no in-kernel concat).  Every matmul runs on the MXU at
``Precision.HIGHEST`` (see ops/pallas_adjoint.py: _dot).
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


def _layer_sizes(sizes):
    """((n_in, n_out), ...) for an MLP ``sizes`` tuple (in, hidden.., out)."""
    return tuple(zip(sizes[:-1], sizes[1:]))


def _make_fwd_kernel(sizes, B, T, max_steps, rtol, atol):
    D = sizes[-1]
    n_layers = len(sizes) - 1

    def kernel(z0_ref, ts_ref, tab_ref, *refs):
        # refs: w0z, w0t, b0, (w_i, b_i)*, out, tda, yrec, krec, misc, ks
        ks_buf = refs[-1]
        out_ref, tda_ref, yrec_ref, krec_ref, misc_ref = refs[-6:-1]
        w0z, w0t, b0 = refs[0], refs[1], refs[2]
        tail = refs[3:3 + 2 * (n_layers - 1)]

        def field(y, t):                                   # (B, D), scalar
            h = _dot(y, w0z[:], 1, 1) + t * w0t[:] + b0[:]
            h = jnp.tanh(h)
            for i in range(n_layers - 1):
                w, b = tail[2 * i], tail[2 * i + 1]
                h = _dot(h, w[:], 1, 1) + b[:]
                if i < n_layers - 2:
                    h = jnp.tanh(h)
            return h

        adaptive_solve_traj(field, z0_ref[:], ts_ref[:], tab_ref, out_ref,
                            tda_ref, yrec_ref, krec_ref, misc_ref, ks_buf,
                            B, D, T, max_steps, rtol, atol)

    return kernel


def _make_bwd_kernel(sizes, B, T, max_steps):
    D = sizes[-1]
    n_layers = len(sizes) - 1

    def kernel(ybar_ref, ts_ref, tab_ref, tda_ref, yrec_ref, krec_ref,
               misc_ref, *refs):
        kbar_buf = refs[-1]
        z0bar_ref = refs[-2]
        n_param = 3 + 2 * (n_layers - 1)
        param_refs = refs[:n_param]
        grad_refs = refs[n_param:n_param + n_param]
        w0z, w0t, b0 = param_refs[0], param_refs[1], param_refs[2]
        tail = param_refs[3:]
        g_w0z, g_w0t, g_b0 = grad_refs[0], grad_refs[1], grad_refs[2]
        g_tail = grad_refs[3:]
        for gr in grad_refs:
            gr[:] = jnp.zeros_like(gr)
        ones_b = jnp.ones((1, B), jnp.float32)

        def field_vjp(u, t, w):
            # forward, saving post-activations per hidden layer
            h = jnp.tanh(_dot(u, w0z[:], 1, 1) + t * w0t[:] + b0[:])
            zs = [h]
            for i in range(n_layers - 2):
                wgt, b = tail[2 * i], tail[2 * i + 1]
                h = jnp.tanh(_dot(h, wgt[:], 1, 1) + b[:])
                zs.append(h)
            # backward through the linear output layer
            wgt = tail[2 * (n_layers - 2)]
            g_tail[2 * (n_layers - 2)][:] += _dot(w, zs[-1], 0, 0)
            g_tail[2 * (n_layers - 2) + 1][:] += _dot(ones_b, w, 1, 0)
            g = _dot(w, wgt[:], 1, 0)
            # hidden layers (tanh)
            for i in range(n_layers - 3, -1, -1):
                g = g * (1.0 - zs[i + 1] * zs[i + 1])
                g_tail[2 * i][:] += _dot(g, zs[i], 0, 0)
                g_tail[2 * i + 1][:] += _dot(ones_b, g, 1, 0)
                g = _dot(g, tail[2 * i][:], 1, 0)
            g = g * (1.0 - zs[0] * zs[0])
            gsum = _dot(ones_b, g, 1, 0)                   # (1, H)
            g_w0z[:] += _dot(g, u, 0, 0)
            g_w0t[:] += t * gsum
            g_b0[:] += gsum
            return _dot(g, w0z[:], 1, 0)                   # (B, D)

        z0bar_ref[:] = adjoint_replay_traj(
            field_vjp, ybar_ref, ts_ref[:], tab_ref, tda_ref, yrec_ref,
            krec_ref, misc_ref, kbar_buf, B, D, T)

    return kernel


def _prep(layers, sizes):
    """Kernel param arrays from the MLP layer list: the first layer's
    weight splits into its state block (H, D) and time column (1, H)."""
    f32 = jnp.float32
    D = sizes[-1]
    w0 = layers[0]["w"].astype(f32)
    flat = [w0[:, :D], w0[:, D:].T, layers[0]["b"][None].astype(f32)]
    for layer in layers[1:]:
        flat += [layer["w"].astype(f32), layer["b"][None].astype(f32)]
    return flat


@functools.lru_cache(maxsize=16)
def make_ode_dyn_solver(sizes, rtol=1e-3, atol=1e-4, max_steps=32,
                        interpret=False):
    """Build the differentiable whole-solve for one ``ODEDynamics`` MLP.

    ``sizes`` is the field MLP's ``(D+1, hidden..., D)`` tuple (tanh
    hidden activations, linear output — ``ODEDynamicsConfig.mlp``).
    Returns ``solve(layers, z0, ts) -> (T, B, D)`` with a custom VJP
    (discrete adjoint on the frozen step mesh); ``layers`` is the
    standard mlp_init param list, ``z0`` is (B, D).
    """
    if len(sizes) < 3 or sizes[0] != sizes[-1] + 1:
        raise ValueError(f"expected a ([D+1, hidden.., D]) field, got {sizes}")
    f32 = jnp.float32
    D = sizes[-1]
    M = max_steps
    n_param = 3 + 2 * (len(sizes) - 2)
    comp = dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_LIMIT_BYTES)) if not interpret else {}

    def _fwd_call(layers, z0, ts):
        B, T = z0.shape[0], ts.shape[0]
        inputs = [z0.astype(f32), ts.astype(f32)[:, None],
                  tableau_table()] + _prep(layers, sizes)
        out_shapes = [
            jax.ShapeDtypeStruct((T, B, D), f32),
            jax.ShapeDtypeStruct((M, 4), f32),
            jax.ShapeDtypeStruct((M, B, D), f32),
            jax.ShapeDtypeStruct((M, 7, B, D), f32),
            jax.ShapeDtypeStruct((1, 4), f32),
        ]
        traj, tda, yrec, krec, misc = pl.pallas_call(
            _make_fwd_kernel(sizes, B, T, M, rtol, atol),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            interpret=interpret,
            **comp,
        )(*inputs)
        return traj, (tda, yrec, krec, misc)

    def _bwd_call(layers, ts, recs, ct):
        tda, yrec, krec, misc = recs
        T, B = ct.shape[0], ct.shape[1]
        flat = _prep(layers, sizes)
        inputs = [ct.astype(f32), ts.astype(f32)[:, None], tableau_table(),
                  tda, yrec, krec, misc] + flat
        out_shapes = [jax.ShapeDtypeStruct(a.shape, f32) for a in flat]
        out_shapes.append(jax.ShapeDtypeStruct((B, D), f32))
        results = pl.pallas_call(
            _make_bwd_kernel(sizes, B, T, M),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (n_param + 1),
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            interpret=interpret,
            **comp,
        )(*inputs)
        return results[:-1], results[-1]

    def _grad_tree(layers, grads_flat):
        """Rebuild the mlp_init layer-list structure (re-fusing the first
        layer's state block and time column)."""
        w0z, w0t, b0 = grads_flat[0], grads_flat[1], grads_flat[2]
        l0 = layers[0]
        g0 = {"w": jnp.concatenate([w0z, w0t.T], axis=1).astype(
            l0["w"].dtype), "b": b0[0].astype(l0["b"].dtype)}
        out = [g0]
        for i, layer in enumerate(layers[1:]):
            gw = grads_flat[3 + 2 * i]
            gb = grads_flat[4 + 2 * i]
            out.append({"w": gw.astype(layer["w"].dtype),
                        "b": gb[0].astype(layer["b"].dtype)})
        return out

    @jax.custom_vjp
    def solve(layers, z0, ts):
        traj, _ = _fwd_call(layers, z0, ts)
        return traj.astype(z0.dtype)

    def fwd(layers, z0, ts):
        traj, recs = _fwd_call(layers, z0, ts)
        return traj.astype(z0.dtype), (layers, z0, ts, recs)

    def bwd(res, ct):
        layers, z0, ts, recs = res
        grads_flat, z0bar = _bwd_call(layers, ts, recs, ct)
        return (_grad_tree(layers, grads_flat), z0bar.astype(z0.dtype),
                jnp.zeros_like(ts))

    solve.defvjp(fwd, bwd)
    solve.fwd_with_records = _fwd_call
    return solve


def pallas_ode_dyn_solve(layers, cfg, z0, ts, *, rtol=1e-3, atol=1e-4,
                         max_steps=32, interpret=None):
    """Solve the latent-forecaster ODE with the in-kernel adjoint.

    ``layers``/``cfg`` are the ``ode_dynamics_init`` params and the
    ``ODEDynamicsConfig``; returns the latent trajectory (T, B, D) like
    the XLA ``odeint_dopri5`` path.  ``interpret=None`` auto-selects:
    Mosaic on TPU, interpret mode on the CPU backend.
    """
    if interpret is None:
        interpret = interpret_default()
    fn = make_ode_dyn_solver(tuple(cfg.mlp.sizes), rtol=rtol, atol=atol,
                             max_steps=max_steps, interpret=interpret)
    return fn(layers, z0, ts)
