"""Plug YOUR vector field into the whole-solve kernel scaffold.

`fetode_tpu/ops/pallas_node_common.py` is the framework's most reusable
asset: an adaptive dopri5 solve (Hairer init step, PI controller, FSAL)
that runs ENTIRELY inside one Pallas kernel, records every step attempt,
and replays the frozen step mesh backwards to give a discrete adjoint —
you supply only two callables:

    field(y)        -> dy          the vector field, (B, D) -> (B, D)
    field_vjp(u, w) -> u_bar       its VJP at state u with cotangent w,
                                   accumulating parameter cotangents into
                                   VMEM refs it closes over

This file instantiates the scaffold for a tiny custom field
(dh = tanh(h @ W1) @ W2, a one-hidden-layer MLP) and checks both the
solution and the gradients against the XLA path (solvers/dopri5.py) on
the SAME math.  The production instantiations follow this exact shape:
ops/pallas_logistic_node.py (~100 lines/field), pallas_ferro_node.py,
pallas_mlp_node.py, pallas_ode_dyn.py, pallas_node_enc.py.

Run:  python examples/02_custom_field_kernel.py
(uses Pallas interpret mode off-TPU; compiled Mosaic on a TPU backend)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.ops.pallas_node_common import (_dot, adaptive_solve_final,
                                               adjoint_replay,
                                               interpret_default,
                                               tableau_table)
from fetode_tpu.solvers.dopri5 import odeint_dopri5

# ---------------------------------------------------------------- kernels


def _fwd_kernel(B, D, H, max_steps, rtol, atol):
    def kernel(h0_ref, tab_ref, w1_ref, w2_ref,
               out_ref, tda_ref, yrec_ref, krec_ref, misc_ref, ks_buf):
        def field(y):                                    # (B, D) -> (B, D)
            z = jnp.tanh(_dot(y, w1_ref[:], 1, 1))       # (B, H)
            return _dot(z, w2_ref[:], 1, 1)              # (B, D)

        adaptive_solve_final(field, h0_ref[:], tab_ref, out_ref, tda_ref,
                             yrec_ref, krec_ref, misc_ref, ks_buf, B, D,
                             max_steps, rtol, atol)
    return kernel


def _bwd_kernel(B, D, H, max_steps):
    def kernel(ybar_ref, tda_ref, yrec_ref, krec_ref, misc_ref, tab_ref,
               w1_ref, w2_ref, gw1_ref, gw2_ref, h0bar_ref, kbar_buf):
        gw1_ref[:] = jnp.zeros_like(gw1_ref)
        gw2_ref[:] = jnp.zeros_like(gw2_ref)
        n_att = misc_ref[0, 0].astype(jnp.int32)

        def field_vjp(u, w):                  # u: state, w: cotangent of dy
            pre = _dot(u, w1_ref[:], 1, 1)               # (B, H)
            z = jnp.tanh(pre)
            gw2_ref[:] += _dot(w, z, 0, 0)               # (D, H) layout
            zbar = _dot(w, w2_ref[:], 1, 0) * (1 - z * z)
            gw1_ref[:] += _dot(zbar, u, 0, 0)            # (H, D)
            return _dot(zbar, w1_ref[:], 1, 0)           # (B, D)

        h0bar_ref[:] = adjoint_replay(field_vjp, ybar_ref[:], tab_ref,
                                      tda_ref, yrec_ref, krec_ref, n_att,
                                      kbar_buf, B, D)
    return kernel


# ------------------------------------------------------- the solve wrapper


@functools.lru_cache(maxsize=4)
def make_my_solver(D, H, rtol=1e-4, atol=1e-6, max_steps=32,
                   interpret=None):
    """solve(w1, w2, h0) -> h(t=1), differentiable via the in-kernel
    discrete adjoint.  w1: (H, D) [used as h @ w1^T], w2: (D, H)."""
    if interpret is None:
        interpret = interpret_default()
    f32, M = jnp.float32, max_steps
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)

    def _fwd_call(w1, w2, h0):
        B = h0.shape[0]
        outs = [jax.ShapeDtypeStruct((B, D), f32),        # hT
                jax.ShapeDtypeStruct((M, 4), f32),        # per-attempt [dt,
                jax.ShapeDtypeStruct((M, B, D), f32),     #  adv, t, 0], y
                jax.ShapeDtypeStruct((M, 7, B, D), f32),  # stage k's
                jax.ShapeDtypeStruct((1, 4), f32)]        # [n_attempts, tend]
        return pl.pallas_call(
            _fwd_kernel(B, D, H, M, rtol, atol), out_shape=outs,
            in_specs=[vm] * 4, out_specs=[vm] * 5,
            scratch_shapes=[pltpu.VMEM((7 * B, D), f32)],
            interpret=interpret,
        )(h0.astype(f32), tableau_table(), w1.astype(f32), w2.astype(f32))

    @jax.custom_vjp
    def solve(w1, w2, h0):
        return _fwd_call(w1, w2, h0)[0].astype(h0.dtype)

    def fwd(w1, w2, h0):
        hT, *recs = _fwd_call(w1, w2, h0)
        return hT.astype(h0.dtype), (w1, w2, h0, recs)

    def bwd(res, ct):
        w1, w2, h0, (tda, yrec, krec, misc) = res
        B = ct.shape[0]
        outs = [jax.ShapeDtypeStruct((H, D), jnp.float32),
                jax.ShapeDtypeStruct((D, H), jnp.float32),
                jax.ShapeDtypeStruct((B, D), jnp.float32)]
        gw1, gw2, h0bar = pl.pallas_call(
            _bwd_kernel(B, D, H, M), out_shape=outs,
            in_specs=[vm] * 8, out_specs=[vm] * 3,
            scratch_shapes=[pltpu.VMEM((7 * B, D), jnp.float32)],
            interpret=interpret,
        )(ct.astype(jnp.float32), tda, yrec, krec, misc, tableau_table(),
          w1.astype(jnp.float32), w2.astype(jnp.float32))
        return (gw1.astype(w1.dtype), gw2.astype(w2.dtype),
                h0bar.astype(h0.dtype))

    solve.defvjp(fwd, bwd)
    return solve


# ----------------------------------------------------------------- check

if __name__ == "__main__":
    D, H, B = 4, 8, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    w1 = 0.5 * jax.random.normal(k1, (H, D))
    w2 = 0.5 * jax.random.normal(k2, (D, H))
    h0 = jax.random.normal(k3, (B, D))

    solve = make_my_solver(D, H)
    hT = solve(w1, w2, h0)

    # XLA reference: the same field through the scan/while dopri5.
    def field(t, h):
        return jnp.tanh(h @ w1.T) @ w2.T

    ref = odeint_dopri5(field, h0, jnp.asarray([0.0, 1.0]), rtol=1e-4,
                        atol=1e-6, max_steps=32, mode="while")[-1]
    err = float(jnp.max(jnp.abs(hT - ref)))
    print(f"forward max|kernel - XLA| = {err:.2e}")
    assert err < 1e-4

    def loss_k(w1, w2, h0):
        return jnp.sum(solve(w1, w2, h0) ** 2)

    def loss_x(w1, w2, h0):
        def f(t, h):
            return jnp.tanh(h @ w1.T) @ w2.T
        return jnp.sum(odeint_dopri5(f, h0, jnp.asarray([0.0, 1.0]),
                                     rtol=1e-4, atol=1e-6, max_steps=32,
                                     mode="scan")[-1] ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(w1, w2, h0)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(w1, w2, h0)
    for name, a, b in zip(("w1", "w2", "h0"), gk, gx):
        cos = jnp.sum(a * b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b))
        print(f"grad[{name}] cosine vs XLA autodiff: {float(cos):.7f}")
        assert cos > 0.9999
    print("custom-field whole-solve kernel: forward + adjoint verified")
