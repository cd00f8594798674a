"""Whole-rollout Pallas kernel for the Kuramoto phase lattice (MNIST
front-end, models/kuramoto.py — the rebuild of the reference's
``mnist_kuramoto_kan.py:145-204`` oscillator block).

The XLA path is a 10-step ``lax.scan`` whose carry (the phase field
theta, (B, H, W)) round-trips HBM every step, with two 3x3 cross convs
per step.  This kernel runs ALL ``steps`` Euler updates in one launch
with theta VMEM-resident: per step only VPU work (sin/cos) plus the
4-neighbour sums, which become two masked sublane shifts (+-1 within an
image row, masked at row boundaries) and two row shifts (+-W) — no conv
unit, no HBM traffic between steps.

Layout: lattice flattened on SUBLANES (H*W = 784 = 98 aligned tiles of
8), batch on LANES in 128-wide grid blocks, so any batch size streams
through one resident program.  The backward is an in-kernel discrete
adjoint: replay the rollout storing every theta_t in a VMEM scratch,
then walk the steps in reverse with the hand-derived coupling VJP

    c_i      = cos t_i * S(sin t)_i - sin t_i * S(cos t)_i
             = sum_{j in N(i)} sin(t_j - t_i)
    tbar_m   = gbar_m + dt*K*( cos t_m * S(gbar cos t)_m
                             + sin t_m * S(gbar sin t)_m
                             - gbar_m * (cos t_m * S(cos t)_m
                                        + sin t_m * S(sin t)_m) )

(S is the symmetric masked neighbour-sum operator, so S^T = S and the
scatter of cotangents is the same shift stencil).  omega/K gradients
accumulate across batch blocks inside the kernel (grid steps are
sequential on TPU).

Parity: features and (omega, K, theta0) gradients tested in interpret
mode against the scan path's autodiff (tests/test_pallas_kuramoto.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_masks(H, W):
    """(HW, 1) f32 masks: valid left / right neighbour per lattice site.

    Returned as NUMPY arrays: make_kuramoto_rollout is lru_cached, and a
    jnp constant materialised during a trace would leak that trace's
    tracer into every later call (measured: UnexpectedTracerError when
    the first call happens inside an epoch scan and the second eagerly).
    """
    col = np.arange(H * W) % W
    maskl = (col != 0).astype(np.float32)[:, None]
    maskr = (col != W - 1).astype(np.float32)[:, None]
    return maskl, maskr


def _make_nsum(HW, W):
    """Masked 4-neighbour sum on the (HW, B) sublane layout."""

    def nsum(x, maskl, maskr):
        z1 = jnp.zeros_like(x[:1])
        zw = jnp.zeros_like(x[:W])
        left = jnp.concatenate([z1, x[:-1]], axis=0) * maskl
        right = jnp.concatenate([x[1:], z1], axis=0) * maskr
        up = jnp.concatenate([zw, x[:-W]], axis=0)
        down = jnp.concatenate([x[W:], zw], axis=0)
        return left + right + up + down

    return nsum


def _make_fwd_kernel(HW, W, steps, dt):
    nsum = _make_nsum(HW, W)

    def kernel(th0_ref, om_ref, k_ref, ml_ref, mr_ref, cos_ref, sin_ref):
        om, kc = om_ref[:], k_ref[0, 0]
        ml, mr = ml_ref[:], mr_ref[:]

        def body(_, th):
            s, c = jnp.sin(th), jnp.cos(th)
            coup = c * nsum(s, ml, mr) - s * nsum(c, ml, mr)
            return th + dt * (om + kc * coup)

        th = jax.lax.fori_loop(0, steps, body, th0_ref[:])
        cos_ref[:] = jnp.cos(th)
        sin_ref[:] = jnp.sin(th)

    return kernel


def _make_bwd_kernel(HW, W, steps, dt):
    nsum = _make_nsum(HW, W)

    def kernel(cb_ref, sb_ref, th0_ref, om_ref, k_ref, ml_ref, mr_ref,
               th0bar_ref, gom_ref, gk_ref, rec_buf):
        om, kc = om_ref[:], k_ref[0, 0]
        ml, mr = ml_ref[:], mr_ref[:]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            gom_ref[:] = jnp.zeros_like(gom_ref)
            gk_ref[:] = jnp.zeros_like(gk_ref)

        def fstep(t, th):
            rec_buf[pl.ds(t * HW, HW), :] = th
            s, c = jnp.sin(th), jnp.cos(th)
            coup = c * nsum(s, ml, mr) - s * nsum(c, ml, mr)
            return th + dt * (om + kc * coup)

        thT = jax.lax.fori_loop(0, steps, fstep, th0_ref[:])
        gbar0 = -jnp.sin(thT) * cb_ref[:] + jnp.cos(thT) * sb_ref[:]

        def bstep(j, carry):
            gbar, gom, gk = carry
            t = steps - 1 - j
            th = rec_buf[pl.ds(t * HW, HW), :]
            s, c = jnp.sin(th), jnp.cos(th)
            ss, sc = nsum(s, ml, mr), nsum(c, ml, mr)
            coup = c * ss - s * sc
            gom = gom + dt * jnp.sum(gbar, axis=1, keepdims=True)
            gk = gk + dt * jnp.sum(gbar * coup)
            tb = (c * nsum(gbar * c, ml, mr) + s * nsum(gbar * s, ml, mr)
                  - gbar * (c * sc + s * ss))
            return gbar + dt * kc * tb, gom, gk

        zero_om = jnp.zeros((HW, 1), jnp.float32)
        gbar, gom, gk = jax.lax.fori_loop(
            0, steps, bstep, (gbar0, zero_om, jnp.zeros((), jnp.float32)))
        th0bar_ref[:] = gbar
        gom_ref[:] += gom
        gk_ref[:] += gk.reshape(1, 1)

    return kernel


@functools.lru_cache(maxsize=8)
def make_kuramoto_rollout(H, W, steps, dt, block_b=128, interpret=False):
    """Differentiable whole-rollout for the Kuramoto feature front-end.

    Returns ``rollout(omega, K, theta0) -> feat`` where ``omega`` is
    (H, W), ``K`` a scalar, ``theta0`` (B, H*W), and ``feat`` is
    (B, 2*H*W) laid out [cos(theta_T) | sin(theta_T)] — exactly the scan
    path's feature layout (models/kuramoto.py: kuramoto_features).
    """
    f32 = jnp.float32
    HW = H * W
    maskl, maskr = _row_masks(H, W)

    def _blocks(rows):
        nblk = -(-rows // block_b)
        return nblk, nblk * block_b - rows

    def _prep(omega, kc):
        return [omega.reshape(HW, 1).astype(f32),
                jnp.asarray(kc, f32).reshape(1, 1),
                jnp.asarray(maskl), jnp.asarray(maskr)]

    full = lambda *shape: pl.BlockSpec(  # noqa: E731 — whole-array block
        shape, lambda i: (0,) * len(shape))

    def _fwd(omega, kc, theta0):
        B = theta0.shape[0]
        nblk, pad = _blocks(B)
        tht = jnp.pad(theta0.T.astype(f32), ((0, 0), (0, pad)))
        inputs = [tht] + _prep(omega, kc)
        cosT, sinT = pl.pallas_call(
            _make_fwd_kernel(HW, W, steps, dt),
            grid=(nblk,),
            out_shape=[jax.ShapeDtypeStruct((HW, nblk * block_b), f32)] * 2,
            in_specs=[pl.BlockSpec((HW, block_b), lambda i: (0, i)),
                      full(HW, 1), full(1, 1), full(HW, 1), full(HW, 1)],
            out_specs=[pl.BlockSpec((HW, block_b), lambda i: (0, i))] * 2,
            interpret=interpret,
        )(*inputs)
        return jnp.concatenate([cosT[:, :B].T, sinT[:, :B].T], axis=-1)

    def _bwd(omega, kc, theta0, ct):
        B = theta0.shape[0]
        nblk, pad = _blocks(B)
        cb = jnp.pad(ct[:, :HW].T.astype(f32), ((0, 0), (0, pad)))
        sb = jnp.pad(ct[:, HW:].T.astype(f32), ((0, 0), (0, pad)))
        tht = jnp.pad(theta0.T.astype(f32), ((0, 0), (0, pad)))
        inputs = [cb, sb, tht] + _prep(omega, kc)
        blk = pl.BlockSpec((HW, block_b), lambda i: (0, i))
        th0bar, gom, gk = pl.pallas_call(
            _make_bwd_kernel(HW, W, steps, dt),
            grid=(nblk,),
            out_shape=[jax.ShapeDtypeStruct((HW, nblk * block_b), f32),
                       jax.ShapeDtypeStruct((HW, 1), f32),
                       jax.ShapeDtypeStruct((1, 1), f32)],
            in_specs=[blk, blk, blk, full(HW, 1), full(1, 1),
                      full(HW, 1), full(HW, 1)],
            out_specs=[blk, full(HW, 1), full(1, 1)],
            scratch_shapes=[pltpu.VMEM((steps * HW, block_b), f32)],
            interpret=interpret,
        )(*inputs)
        return (gom.reshape(H, W).astype(omega.dtype),
                gk[0, 0].astype(jnp.asarray(kc).dtype),
                th0bar[:, :B].T.astype(theta0.dtype))

    @jax.custom_vjp
    def rollout(omega, kc, theta0):
        return _fwd(omega, kc, theta0)

    def fwd(omega, kc, theta0):
        return _fwd(omega, kc, theta0), (omega, kc, theta0)

    def bwd(res, ct):
        return _bwd(*res, ct)

    rollout.defvjp(fwd, bwd)
    return rollout


def pallas_kuramoto_features(params, spec, x_img, *, interpret=None):
    """Drop-in replacement for ``kuramoto_features`` (same layout) running
    the whole rollout + adjoint in one kernel pair."""
    import math

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if x_img.ndim == 4:
        x_img = x_img[:, 0]
    B = x_img.shape[0]
    theta0 = (math.pi * (2.0 * x_img - 1.0)).reshape(B, spec.H * spec.W)
    fn = make_kuramoto_rollout(spec.H, spec.W, spec.steps, spec.dt,
                               interpret=interpret)
    return fn(params["omega"], params["K"], theta0)
