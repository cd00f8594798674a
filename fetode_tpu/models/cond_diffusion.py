"""Conditional DDPM forecasting over full future sequences (B, Ly, D).

Capability parity with ``/root/reference/kan_diffusion_ett.py``: the five
denoiser variants are one spec over two axes —

| reference class (:238-545)  | here: CondDenoiserSpec(encoder, net) |
|-----------------------------|--------------------------------------|
| MLPDenoiser                 | ('conv', 'mlp')                      |
| KANDenoiser                 | ('conv', 'kan')                      |
| KAN_FET_LINEAR_ODE          | ('conv', 'kanfet')                   |
| KAN_NODE                    | ('node', 'kan')                      |
| KAN_FET_ALL_NODE            | ('node', 'kanfet')                   |

with ``PastEncoder`` (conv1d stack, :216-235), ``PastEncoderNeuralODE`` +
``PastODEFunc`` (non-autonomous dz/dt = f(z, x(t)) with batched signal
interpolation, :178-341), ``SinusoidalTimeEmbedding`` (:129-147), and the
sequence-shaped DDPM q_sample / p_sample_loop (:551-609) — all batched,
scan-based and PRNG-explicit here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fetode_tpu.nn.diffusion import sinusoidal_emb
from fetode_tpu.nn.kan import KANConfig, kan_apply, kan_init, kanfet_config, kan_state_init
from fetode_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from fetode_tpu.ops.interp import linear_interp
from fetode_tpu.solvers import odeint_dopri5, odeint_fixed
from fetode_tpu.utils.init import kaiming_uniform


# ------------------------------------------------------- past encoders


class ConvEncoderCfg(NamedTuple):
    d_in: int
    hidden: int = 128
    out_dim: int = 128
    kernel: int = 5


def conv_encoder_init(key, cfg: ConvEncoderCfg, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    shape1 = (cfg.hidden, cfg.d_in, cfg.kernel)
    shape2 = (cfg.hidden, cfg.hidden, cfg.kernel)
    return {
        "conv1_w": kaiming_uniform(k1, shape1, fan_in=cfg.d_in * cfg.kernel,
                                   dtype=dtype),
        "conv1_b": jnp.zeros((cfg.hidden,), dtype),
        "conv2_w": kaiming_uniform(k2, shape2, fan_in=cfg.hidden * cfg.kernel,
                                   dtype=dtype),
        "conv2_b": jnp.zeros((cfg.hidden,), dtype),
        "proj_w": kaiming_uniform(k3, (cfg.out_dim, cfg.hidden), dtype=dtype),
        "proj_b": jnp.zeros((cfg.out_dim,), dtype),
    }


def conv_encoder_apply(params, cfg: ConvEncoderCfg, past):
    """past (B, L, D) -> (B, out_dim): conv1d(k=5) SiLU x2, mean-pool, proj."""
    x = jnp.swapaxes(past, 1, 2)  # (B, D, L)
    pad = cfg.kernel // 2

    def conv(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        return y + b[None, :, None]

    h = jax.nn.silu(conv(x, params["conv1_w"], params["conv1_b"]))
    h = jax.nn.silu(conv(h, params["conv2_w"], params["conv2_b"]))
    h = h.mean(-1)  # adaptive avg pool to 1
    return h @ params["proj_w"].T + params["proj_b"]


class NodeEncoderCfg(NamedTuple):
    d_in: int
    cond_dim: int = 128
    x_proj_dim: int = 128
    ode_hidden: int = 128
    n_eval: int = 5
    solver: str = "dopri5"
    rtol: float = 1e-3
    atol: float = 1e-4
    max_steps: int = 24         # measured 7 accepted / 0 rejected steps at
                                # this tolerance (scan pays every masked
                                # iteration; was 64)
    solver_mode: str = "auto"   # dopri5: scan under AD, while for no-grad eval

    @property
    def field_mlp(self):
        return MLPConfig((self.cond_dim + self.x_proj_dim, self.ode_hidden,
                          self.ode_hidden, self.cond_dim), activation="silu")


def node_encoder_init(key, cfg: NodeEncoderCfg, dtype=jnp.float32):
    kx, kf, kz, kl = jax.random.split(key, 4)
    return {
        "x_proj_w": kaiming_uniform(kx, (cfg.x_proj_dim, cfg.d_in), dtype=dtype),
        "x_proj_b": jnp.zeros((cfg.x_proj_dim,), dtype),
        "field": mlp_init(kf, cfg.field_mlp, dtype),
        "ln_scale": jnp.ones((cfg.cond_dim,), dtype),
        "ln_bias": jnp.zeros((cfg.cond_dim,), dtype),
        "z0_w": kaiming_uniform(kz, (cfg.cond_dim, cfg.x_proj_dim), dtype=dtype),
        "z0_b": jnp.zeros((cfg.cond_dim,), dtype),
    }


def node_encoder_apply(params, cfg: NodeEncoderCfg, past):
    """past (B, L, D) -> (B, cond_dim) via dz/dt = f(LN(z), x(t))."""
    x_seq = past @ params["x_proj_w"].T + params["x_proj_b"]   # (B, L, P)
    L = x_seq.shape[1]
    t_grid = jnp.linspace(0.0, 1.0, L, dtype=past.dtype)
    z0 = x_seq[:, 0] @ params["z0_w"].T + params["z0_b"]

    if cfg.solver == "dopri5" and cfg.solver_mode == "pallas":
        # whole-solve kernel: signal interpolation + field + in-kernel
        # discrete adjoint in one Pallas program (ops/pallas_node_enc.py)
        from fetode_tpu.ops.pallas_node_enc import pallas_node_enc_solve

        return pallas_node_enc_solve(params, cfg, z0, x_seq)

    def rhs(t, z):
        from fetode_tpu.nn.mlp import layer_norm

        x_t = linear_interp(t_grid, x_seq, t)                  # (B, P)
        zn = layer_norm(z, params["ln_scale"], params["ln_bias"])
        return mlp_apply(params["field"], cfg.field_mlp,
                         jnp.concatenate([zn, x_t], axis=-1))

    ts = jnp.linspace(0.0, 1.0, cfg.n_eval, dtype=past.dtype)
    if cfg.solver == "dopri5":
        traj = odeint_dopri5(rhs, z0, ts, rtol=cfg.rtol, atol=cfg.atol,
                             max_steps=cfg.max_steps, mode=cfg.solver_mode)
    else:
        traj = odeint_fixed(rhs, z0, ts, method=cfg.solver)
    return traj[-1]


# ------------------------------------------------------------ denoisers


class CondDenoiserSpec(NamedTuple):
    d_in: int
    pred_len: int
    seq_len: int = 96
    cond_dim: int = 128
    time_dim: int = 128
    hidden: int = 256
    encoder: str = "conv"     # 'conv' | 'node'
    net: str = "mlp"          # 'mlp' | 'kan' | 'kanfet'
    ferro_num_basis: int = 4
    # latent-encoder dopri5 path: "scan" (checkpointed XLA) or "pallas"
    # (whole-solve kernel incl. in-kernel signal interp + adjoint)
    solver_mode: str = "auto"   # dopri5: scan under AD, while for no-grad eval

    @property
    def conv_cfg(self):
        return ConvEncoderCfg(self.d_in, 128, self.cond_dim)

    @property
    def node_cfg(self):
        return NodeEncoderCfg(self.d_in, self.cond_dim,
                              solver_mode=self.solver_mode)

    @property
    def in_dim(self):
        return self.pred_len * self.d_in + self.cond_dim + self.time_dim

    @property
    def out_dim(self):
        return self.pred_len * self.d_in

    @property
    def net_cfg(self):
        sizes = [self.in_dim, self.hidden, self.hidden, self.out_dim]
        if self.net == "kan":
            return KANConfig.make(sizes)
        if self.net == "kanfet":
            return kanfet_config(sizes, ferro_num_basis=self.ferro_num_basis)
        return MLPConfig(tuple(sizes), activation="silu")


def cond_denoiser_init(key, spec: CondDenoiserSpec, dtype=jnp.float32):
    ke, kn = jax.random.split(key)
    enc = (conv_encoder_init(ke, spec.conv_cfg, dtype) if spec.encoder == "conv"
           else node_encoder_init(ke, spec.node_cfg, dtype))
    if spec.net == "mlp":
        net = mlp_init(kn, spec.net_cfg, dtype)
    else:
        net = kan_init(kn, spec.net_cfg, dtype)
    return {"encoder": enc, "net": net}


def cond_denoiser_encode(params, spec: CondDenoiserSpec, past):
    """Past conditioning (B, cond_dim) — constant across diffusion steps,
    so samplers hoist it out of the 250-step reverse chain (the reference
    re-encodes every step, kan_diffusion_ett.py:432-444)."""
    return (conv_encoder_apply(params["encoder"], spec.conv_cfg, past)
            if spec.encoder == "conv"
            else node_encoder_apply(params["encoder"], spec.node_cfg, past))


def cond_denoiser_eps(params, spec: CondDenoiserSpec, x_t, cond, t_idx):
    """eps_hat (B, Ly, D) from noisy future + precomputed conditioning."""
    B = x_t.shape[0]
    temb = sinusoidal_emb(t_idx, spec.time_dim).astype(x_t.dtype)
    h = jnp.concatenate([x_t.reshape(B, -1), cond, temb], axis=-1)
    if spec.net == "mlp":
        eps = mlp_apply(params["net"], spec.net_cfg, h)
    else:
        state = (kan_state_init((B,), spec.net_cfg, x_t.dtype)
                 if spec.net == "kanfet" else None)
        eps, _ = kan_apply(params["net"], spec.net_cfg, h, state)
    return eps.reshape(B, spec.pred_len, spec.d_in)


def cond_denoiser_apply(params, spec: CondDenoiserSpec, x_t, past, t_idx):
    """eps_hat (B, Ly, D) from noisy future + past conditioning + step."""
    cond = cond_denoiser_encode(params, spec, past)
    return cond_denoiser_eps(params, spec, x_t, cond, t_idx)


def cond_denoiser_mlp_sample_loop(params, spec: CondDenoiserSpec, sched,
                                  cond, key, dtype=jnp.float32,
                                  unroll: int = 4):
    """Fast full reverse chain specialised to the ``net='mlp'`` denoiser.

    The same algebraic hoisting as ``nn/diffusion.py:
    eps_head_sample_loop``, applied to the 3-layer conditional denoiser
    (reference sampling re-evaluates the full concat input every step,
    ``kan_diffusion_ett.py:432-444``): the first layer acts on
    ``[y_flat, cond, sin-emb(t)]`` and only the ``y_flat`` slice changes
    across the chain, so the ``cond`` contribution is computed once and
    the t-embedding contributions for ALL T steps are one (T, E) x
    (E, H) matmul up front.  Math and PRNG layout identical to
    ``p_sample_loop`` over ``cond_denoiser_eps`` (parity-tested).  The
    KAN net hoists too — through additivity, see
    :func:`cond_denoiser_kan_sample_loop`; only the KANFET net keeps the
    generic loop (its ferro branch carries cross-step hysteresis state).
    """
    if spec.net != "mlp":
        raise ValueError("cond_denoiser_mlp_sample_loop requires net='mlp'")
    from fetode_tpu.nn.diffusion import sinusoidal_emb as _semb

    P = spec.pred_len * spec.d_in
    C, E = spec.cond_dim, spec.time_dim
    (l1, l2, l3) = params["net"]
    W1, b1 = l1["w"], l1["b"]
    W2, b2 = l2["w"], l2["b"]
    W3, b3 = l3["w"], l3["b"]
    W1y, W1c, W1t = W1[:, :P], W1[:, P:P + C], W1[:, P + C:]
    cond_h = cond @ W1c.T + b1                             # (B, H) once
    t_all = _semb(jnp.arange(sched.T), E).astype(dtype)
    temb_h = t_all @ W1t.T                                 # (T, H) once

    B = cond.shape[0]
    k_init, k_loop = jax.random.split(key)
    y = jax.random.normal(k_init, (B, spec.pred_len, spec.d_in),
                          dtype).reshape(B, P)
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
        noise = jax.random.normal(k, (B, spec.pred_len, spec.d_in),
                                  y.dtype).reshape(B, P)
        scale = jnp.where(t == 0, 0.0, jnp.sqrt(var)).astype(y.dtype)
        return mu + scale * noise, None

    y, _ = jax.lax.scan(step, y, (t_rev, keys, temb_h[t_rev]),
                        unroll=unroll)
    return y.reshape(B, spec.pred_len, spec.d_in)


def _kan_partial(p, c, x, sl):
    """One KANLinear layer restricted to the input dims in slice ``sl``.

    KANLinear is ADDITIVE over input dims — y = Σ_i f_i(x_i) for both the
    silu-base and B-spline terms — so the full layer equals the sum of
    partial applications over a partition of its inputs.  XLA's LICM
    cannot exploit this (the basis is one fused op over the whole
    concat), which is exactly what the KAN chain hoist below uses.
    Plain layers only (no logistic/ferro branch).
    """
    from fetode_tpu.nn.kan import _scaled_spline_weight
    from fetode_tpu.ops.bsplines import bspline_basis

    base = jnp.dot(jax.nn.silu(x), p["base_weight"][:, sl].T,
                   preferred_element_type=x.dtype)
    bases = bspline_basis(x, p["_buffers"]["grid"][sl], c.spline_order)
    sw = _scaled_spline_weight(p, c)[:, sl, :]
    return base + jnp.dot(bases.reshape(x.shape[0], -1),
                          sw.reshape(c.out_features, -1).T,
                          preferred_element_type=x.dtype)


def cond_denoiser_kan_sample_loop(params, spec: CondDenoiserSpec, sched,
                                  cond, key, dtype=jnp.float32,
                                  unroll: int = 4):
    """Fast full reverse chain specialised to the ``net='kan'`` denoiser.

    The first KAN layer acts on ``[y_flat, cond, sin-emb(t)]`` and only
    the ``y_flat`` dims change across the chain.  Because KANLinear is
    additive over input dims (see :func:`_kan_partial`), the cond dims'
    contribution is computed ONCE and the t-embedding dims' contributions
    for ALL T steps are one (T, E)-batched partial up front — the
    per-step first layer shrinks from basis+matmul over P+C+E dims to P
    dims alone.  Exact decomposition (fp reassociation only); math and
    PRNG layout otherwise identical to ``p_sample_loop`` over
    ``cond_denoiser_eps``.  The KANFET net keeps the generic loop (its
    ferro branch carries cross-step hysteresis state).
    """
    if spec.net != "kan":
        raise ValueError("cond_denoiser_kan_sample_loop requires net='kan'")
    from fetode_tpu.nn.diffusion import sinusoidal_emb as _semb
    from fetode_tpu.nn.kan import kan_linear_apply

    cfg = spec.net_cfg
    layers = params["net"]
    l1p, l1c = layers[0], cfg.layers[0]
    P = spec.pred_len * spec.d_in
    C, E = spec.cond_dim, spec.time_dim

    cond_h = _kan_partial(l1p, l1c, cond.astype(dtype),
                          slice(P, P + C))                  # (B, H) once
    t_all = _semb(jnp.arange(sched.T), E).astype(dtype)
    temb_h = _kan_partial(l1p, l1c, t_all, slice(P + C, P + C + E))  # (T, H)

    B = cond.shape[0]
    k_init, k_loop = jax.random.split(key)
    y = jax.random.normal(k_init, (B, spec.pred_len, spec.d_in),
                          dtype).reshape(B, P)
    keys = jax.random.split(k_loop, sched.T)
    t_rev = jnp.arange(sched.T - 1, -1, -1)

    def step(y, inp):
        t, k, th = inp
        h = _kan_partial(l1p, l1c, y, slice(0, P)) + cond_h + th[None]
        for p, c in zip(layers[1:], cfg.layers[1:]):
            h, _ = kan_linear_apply(p, c, h)
        eps_hat = h
        mu = sched.sqrt_recip_alphas[t] * (
            y - sched.betas[t] * eps_hat / sched.sqrt_one_minus_alphas_bar[t])
        var = jnp.maximum(sched.posterior_variance[t], 1e-20)
        noise = jax.random.normal(k, (B, spec.pred_len, spec.d_in),
                                  y.dtype).reshape(B, P)
        scale = jnp.where(t == 0, 0.0, jnp.sqrt(var)).astype(y.dtype)
        return mu + scale * noise, None

    y, _ = jax.lax.scan(step, y, (t_rev, keys, temb_h[t_rev]),
                        unroll=unroll)
    return y.reshape(B, spec.pred_len, spec.d_in)


DENOISER_VARIANTS = {
    # name -> (encoder, net); the reference's five models
    "mlp": ("conv", "mlp"),
    "kan": ("conv", "kan"),
    "kan_fet_linear_ode": ("conv", "kanfet"),
    "kan_node": ("node", "kan"),
    "kan_fet_all_node": ("node", "kanfet"),
}


def make_denoiser_spec(name: str, d_in: int, pred_len: int, seq_len: int = 96,
                       **kw) -> CondDenoiserSpec:
    enc, net = DENOISER_VARIANTS[name]
    return CondDenoiserSpec(d_in=d_in, pred_len=pred_len, seq_len=seq_len,
                            encoder=enc, net=net, **kw)
