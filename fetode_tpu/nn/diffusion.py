"""Gaussian diffusion (DDPM) over forecast sequences.

Capability parity with ``GaussianDiffusion1D`` / ``sinusoidal_emb`` /
``DiffusionEpsHead`` (``/root/reference/train_kan_fet_ett.py:473-591``) and
the sequence-shaped variant of ``kan_diffusion_ett.py:111-147,551-609``:
linear beta schedule, closed-form q_sample, posterior-mean reverse steps.

TPU-native: the schedule is a pytree of arrays indexed by a traced step;
the full reverse chain is one ``lax.scan`` (one compiled body, T sequential
iterations — the sampler the reference runs as a 200-250-step Python loop);
randomness is explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    betas: jax.Array
    alphas: jax.Array
    alphas_bar: jax.Array
    sqrt_alphas_bar: jax.Array
    sqrt_one_minus_alphas_bar: jax.Array
    sqrt_recip_alphas: jax.Array
    posterior_variance: jax.Array

    @property
    def T(self) -> int:
        return self.betas.shape[0]


def make_schedule(T: int = 100, beta_start: float = 1e-4,
                  beta_end: float = 2e-2, dtype=jnp.float32) -> DiffusionSchedule:
    betas = jnp.linspace(beta_start, beta_end, T, dtype=dtype)
    alphas = 1.0 - betas
    alphas_bar = jnp.cumprod(alphas)
    prev_bar = jnp.concatenate([alphas_bar[:1], alphas_bar[:-1]])
    return DiffusionSchedule(
        betas=betas,
        alphas=alphas,
        alphas_bar=alphas_bar,
        sqrt_alphas_bar=jnp.sqrt(alphas_bar),
        sqrt_one_minus_alphas_bar=jnp.sqrt(1.0 - alphas_bar),
        sqrt_recip_alphas=jnp.sqrt(1.0 / alphas),
        posterior_variance=betas * (1.0 - prev_bar) / (1.0 - alphas_bar),
    )


def sinusoidal_emb(t: jax.Array, dim: int) -> jax.Array:
    """(B,) step indices -> (B, dim) sinusoidal embeddings."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _bcast(coeff, y):
    return coeff.reshape(coeff.shape + (1,) * (y.ndim - 1))


def q_sample(sched: DiffusionSchedule, y0: jax.Array, t_idx: jax.Array,
             key: jax.Array):
    """Forward noising: y_t = sqrt(a_bar)*y0 + sqrt(1-a_bar)*eps.

    y0: (B, ...) target sequences; t_idx: (B,) ints.  Returns (y_t, eps).
    """
    eps = jax.random.normal(key, y0.shape, y0.dtype)
    y_t = (_bcast(sched.sqrt_alphas_bar[t_idx], y0) * y0
           + _bcast(sched.sqrt_one_minus_alphas_bar[t_idx], y0) * eps)
    return y_t, eps


def p_sample_step(sched: DiffusionSchedule, eps_model: Callable, y_t, t_idx,
                  cond, key):
    """One reverse step (posterior mean + noise except at t=0)."""
    eps_hat = eps_model(y_t, t_idx, cond)
    beta = _bcast(sched.betas[t_idx], y_t)
    sra = _bcast(sched.sqrt_recip_alphas[t_idx], y_t)
    somab = _bcast(sched.sqrt_one_minus_alphas_bar[t_idx], y_t)
    mu = sra * (y_t - beta * eps_hat / somab)
    var = jnp.maximum(_bcast(sched.posterior_variance[t_idx], y_t), 1e-20)
    noise = jax.random.normal(key, y_t.shape, y_t.dtype)
    is_last = _bcast((t_idx == 0).astype(y_t.dtype), y_t)
    return mu + (1.0 - is_last) * jnp.sqrt(var) * noise


def p_sample_loop(sched: DiffusionSchedule, eps_model: Callable, shape, cond,
                  key: jax.Array, dtype=jnp.float32, unroll: int = 4):
    """Full reverse chain from N(0, 1) as one scan.

    shape: output shape (B, ...); cond: conditioning pytree broadcast to all
    steps.  Returns y0 samples.  ``unroll`` unrolls the scan body (inference
    only, so no remat trade-off — pure loop-overhead reduction for the
    small per-step denoisers; measured 10.2k -> 12.5k samples/s on v5e at
    unroll=4 for the T=200 ETT forecaster).
    """
    k_init, k_loop = jax.random.split(key)
    y = jax.random.normal(k_init, shape, dtype)
    keys = jax.random.split(k_loop, sched.T)
    t_rev = jnp.arange(sched.T - 1, -1, -1)

    def step(y, inp):
        t, k = inp
        t_idx = jnp.full((shape[0],), t, jnp.int32)
        return p_sample_step(sched, eps_model, y, t_idx, cond, k), None

    y, _ = jax.lax.scan(step, y, (t_rev, keys), unroll=unroll)
    return y


def eps_head_sample_loop(eps_params, cfg: "EpsHeadConfig",
                         sched: DiffusionSchedule, cond, key,
                         dtype=jnp.float32, unroll: int = 4):
    """Fast full reverse chain specialised to the MLP eps-head.

    Algebraic hoisting the generic ``p_sample_loop`` cannot do: the first
    layer acts on ``[y_t, cond, sin-emb(t)]``, and only the ``y_t`` slice
    changes across the chain — so the ``cond`` contribution is computed
    once and the t-embedding contributions for ALL T steps are one (T, E)
    x (E, H) matmul up front.  The per-step first layer shrinks from
    (P+C+E)->H to P->H (~6x fewer FLOPs at the ETT config).  Identical
    math/RNG layout to ``p_sample_loop`` + ``eps_head_apply``.
    """
    P, E = cfg.pred_len, cfg.t_emb_dim
    C = cfg.cond_dim
    (W1, b1), (W2, b2), (W3, b3) = [(l["w"], l["b"]) for l in eps_params]
    W1y, W1c, W1t = W1[:, :P], W1[:, P:P + C], W1[:, P + C:]
    cond_h = cond @ W1c.T + b1                            # (B, H) once
    t_all = sinusoidal_emb(jnp.arange(sched.T), E).astype(dtype)
    temb_h = t_all @ W1t.T                                # (T, H) once
    k_init, k_loop = jax.random.split(key)
    B = cond.shape[0]
    y = jax.random.normal(k_init, (B, P), dtype)
    keys = jax.random.split(k_loop, sched.T)
    t_rev = jnp.arange(sched.T - 1, -1, -1)

    def step(y, inp):
        t, k, th = inp
        h = jax.nn.silu(y @ W1y.T + cond_h + th[None])
        h = jax.nn.silu(h @ W2.T + b2)
        eps_hat = h @ W3.T + b3
        mu = sched.sqrt_recip_alphas[t] * (
            y - sched.betas[t] * eps_hat / sched.sqrt_one_minus_alphas_bar[t])
        var = jnp.maximum(sched.posterior_variance[t], 1e-20)
        noise = jax.random.normal(k, y.shape, y.dtype)
        scale = jnp.where(t == 0, 0.0, jnp.sqrt(var)).astype(y.dtype)
        return mu + scale * noise, None

    y, _ = jax.lax.scan(step, y, (t_rev, keys, temb_h[t_rev]),
                        unroll=unroll)
    return y


class EpsHeadConfig(NamedTuple):
    """MLP epsilon-predictor on [y_t, cond, sin-emb(t)]
    (DiffusionEpsHead, train_kan_fet_ett.py:566-591)."""

    pred_len: int
    cond_dim: int
    hidden: int = 256
    t_emb_dim: int = 128


def eps_head_init(key, cfg: EpsHeadConfig, dtype=jnp.float32):
    from fetode_tpu.nn.mlp import MLPConfig, mlp_init

    sizes = (cfg.pred_len + cfg.cond_dim + cfg.t_emb_dim, cfg.hidden,
             cfg.hidden, cfg.pred_len)
    return mlp_init(key, MLPConfig(sizes, activation="silu"), dtype)


def eps_head_apply(params, cfg: EpsHeadConfig, y_t, t_idx, cond):
    from fetode_tpu.nn.mlp import MLPConfig, mlp_apply

    t_emb = sinusoidal_emb(t_idx, cfg.t_emb_dim).astype(y_t.dtype)
    x = jnp.concatenate([y_t, cond, t_emb], axis=-1)
    sizes = (cfg.pred_len + cfg.cond_dim + cfg.t_emb_dim, cfg.hidden,
             cfg.hidden, cfg.pred_len)
    return mlp_apply(params, MLPConfig(sizes, activation="silu"), x)
