"""Whole-chain Pallas DDPM sampler: all T reverse-diffusion steps of the
MLP eps-head forecaster in ONE TPU kernel.

The reference's self-reported hotspot is its 200-250-step Python sampling
loop (``kan_diffusion_ett.py:749``).  The XLA answer is a ``lax.scan``
(nn/diffusion.py) and the algebraically-hoisted variant
(``eps_head_sample_loop``: cond/t-emb first-layer contributions moved out
of the loop).  This kernel removes the remaining per-step HLO loop
overhead: weights, the conditioning contribution, the t-embedding table
and all per-step noises stay VMEM-resident and the chain is one
``fori_loop`` of three MXU matmuls + the posterior update.

Everything step-dependent is precomputed host-side into tables indexed by
loop position (already reversed): t-emb first-layer rows (T, H), the
posterior coefficients (T, 3) with ``y' = c1*y - c2*eps_hat + c3*noise``,
and the noise draws (T, B, P) using the exact PRNG layout of
``p_sample_loop`` — so the kernel is deterministic and parity-testable
bit-close against the scan paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fetode_tpu.nn.diffusion import DiffusionSchedule, sinusoidal_emb


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _make_kernel(T):
    def kernel(y0_ref, condh_ref, tembh_ref, noise_ref, coef_ref,
               w1y_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
        ch = condh_ref[:]                                  # (B, H)

        def body(i, y):
            th = tembh_ref[pl.ds(i, 1), :]                 # (1, H)
            h = jax.nn.silu(_dot(y, w1y_ref[:]) + ch + th)
            h = jax.nn.silu(_dot(h, w2_ref[:]) + b2_ref[:])
            eps = _dot(h, w3_ref[:]) + b3_ref[:]           # (B, P)
            c = coef_ref[pl.ds(i, 1), :]                   # (1, 3)
            return c[0, 0] * y - c[0, 1] * eps + c[0, 2] * noise_ref[i]

        out_ref[:] = jax.lax.fori_loop(0, T, body, y0_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_eps_head_sample(eps_params, cfg, sched: DiffusionSchedule, cond,
                           key, *, interpret=None):
    """Sample (B, pred_len) forecasts — whole chain in one kernel.

    Same math and PRNG layout as ``eps_head_sample_loop``; ``cfg`` is the
    ``EpsHeadConfig``.  ``interpret=None`` auto-selects interpret mode on
    the CPU backend.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    f32 = jnp.float32
    P, E, C = cfg.pred_len, cfg.t_emb_dim, cfg.cond_dim
    T = sched.T
    B = cond.shape[0]
    (W1, b1), (W2, b2), (W3, b3) = [(l["w"], l["b"]) for l in eps_params]
    W1y, W1c, W1t = W1[:, :P], W1[:, P:P + C], W1[:, P + C:]

    cond_h = (cond @ W1c.T + b1).astype(f32)               # (B, H)
    t_all = sinusoidal_emb(jnp.arange(T), E)
    temb_h = (t_all @ W1t.T).astype(f32)                   # (T, H)

    k_init, k_loop = jax.random.split(key)
    y0 = jax.random.normal(k_init, (B, P), f32)
    keys = jax.random.split(k_loop, T)
    noises = jax.vmap(lambda k: jax.random.normal(k, (B, P), f32))(keys)

    t_rev = jnp.arange(T - 1, -1, -1)
    c1 = sched.sqrt_recip_alphas[t_rev]
    c2 = c1 * sched.betas[t_rev] / sched.sqrt_one_minus_alphas_bar[t_rev]
    c3 = jnp.where(t_rev == 0, 0.0,
                   jnp.sqrt(jnp.maximum(sched.posterior_variance[t_rev],
                                        1e-20)))
    coefs = jnp.stack([c1, c2, c3], axis=1).astype(f32)    # (T, 3)

    inputs = [y0, cond_h, temb_h[t_rev], noises, coefs,
              W1y.T.astype(f32), W2.T.astype(f32), b2[None].astype(f32),
              W3.T.astype(f32), b3[None].astype(f32)]
    out = pl.pallas_call(
        _make_kernel(T),
        out_shape=jax.ShapeDtypeStruct((B, P), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return out.astype(cond.dtype)
