"""Forecasting models: latent neural-ODE point forecaster and the
conditional-diffusion forecaster family.

Capability parity (``/root/reference/train_kan_fet_ett.py``; the four
Time-MMD scripts are clones of the same template):

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| ODEDynamics (:136-152)                      | ode_dynamics_*              |
| LatentNeuralODEForecaster (:154-197)        | LatentODEForecaster         |
| LatentODE_DiffusionForecaster (:594-664)    | DiffusionForecaster         |
|                                             |   (encoder='mlp')           |
| KAN_LatentODE_DiffusionForecaster (:667-737)| DiffusionForecaster         |
|                                             |   (encoder='kan')           |
| KAN_FET_LatentODE_DiffusionForecaster       | DiffusionForecaster         |
|   (:822-893, KANRNNEncoder cond)            |   (encoder='kanrnn')        |
| LogisticBasisLinear (:753-776)              | logistic_linear_*           |
| eval_diffusion_mse (:896-919)               | train.forecast_driver       |
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fetode_tpu.nn.diffusion import (
    DiffusionSchedule,
    EpsHeadConfig,
    eps_head_apply,
    eps_head_init,
    make_schedule,
    p_sample_loop,
    q_sample,
)
from fetode_tpu.nn.kan import KANConfig, kan_apply, kan_init
from fetode_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from fetode_tpu.nn.rnn import (
    KANRNNEncoderConfig,
    kan_rnn_encoder_apply,
    kan_rnn_encoder_init,
)
from fetode_tpu.ops.logistic import LogisticParams, logistic_basis, logistic_init
from fetode_tpu.solvers import odeint_dopri5, odeint_fixed
from fetode_tpu.utils.init import kaiming_uniform


# -------------------------------------------------------------- dynamics


class ODEDynamicsConfig(NamedTuple):
    """Time-conditioned latent field f([z, t]) (2-layer tanh MLP)."""

    latent_dim: int
    hidden: int = 128

    @property
    def mlp(self):
        return MLPConfig((self.latent_dim + 1, self.hidden, self.hidden,
                          self.latent_dim), activation="tanh")


def ode_dynamics_init(key, cfg: ODEDynamicsConfig, dtype=jnp.float32):
    return mlp_init(key, cfg.mlp, dtype)


def ode_dynamics_apply(params, cfg: ODEDynamicsConfig, t, z):
    t_in = jnp.broadcast_to(jnp.asarray(t, z.dtype), z.shape[:-1] + (1,))
    return mlp_apply(params, cfg.mlp, jnp.concatenate([z, t_in], axis=-1))


def _solve_latent(params, cfg: ODEDynamicsConfig, z0, t_fut, solver: str,
                  rtol, atol, max_steps, n_substeps, mode):
    if solver == "dopri5" and mode == "pallas":
        # whole-solve kernel + in-kernel discrete adjoint (trajectory
        # output via CONTD5 dense output, ops/pallas_ode_dyn.py)
        from fetode_tpu.ops.pallas_ode_dyn import pallas_ode_dyn_solve

        return pallas_ode_dyn_solve(params, cfg, z0, t_fut, rtol=rtol,
                                    atol=atol, max_steps=max_steps)

    def rhs(t, z):
        return ode_dynamics_apply(params, cfg, t, z)

    if solver == "dopri5":
        return odeint_dopri5(rhs, z0, t_fut, rtol=rtol, atol=atol,
                             max_steps=max_steps, mode=mode)
    return odeint_fixed(rhs, z0, t_fut, method=solver, n_substeps=n_substeps)


# --------------------------------------------------- point forecaster


class LatentODEForecasterSpec(NamedTuple):
    num_features: int
    context_len: int = 96
    pred_len: int = 8
    latent_dim: int = 64
    enc_hidden: int = 128
    dec_hidden: int = 128
    dyn_hidden: int = 128
    solver: str = "dopri5"
    rtol: float = 1e-3
    atol: float = 1e-4
    # Measured ~8 accepted / 0 rejected dopri5 steps over the 8-step
    # horizon at this tolerance (the scan pays every masked iteration;
    # re-validated on real ETTh1: test MSE unchanged at budget 32).
    max_steps: int = 32
    n_substeps: int = 4
    solver_mode: str = "auto"   # dopri5: scan under AD, while for no-grad eval

    @property
    def enc(self):
        return MLPConfig((self.context_len * self.num_features,
                          self.enc_hidden, self.latent_dim), activation="relu")

    @property
    def dec(self):
        return MLPConfig((self.latent_dim, self.dec_hidden, 1),
                         activation="relu")

    @property
    def dyn(self):
        return ODEDynamicsConfig(self.latent_dim, self.dyn_hidden)


def latent_ode_forecaster_init(key, spec: LatentODEForecasterSpec,
                               dtype=jnp.float32):
    ke, kd, ky = jax.random.split(key, 3)
    return {
        "encoder": mlp_init(ke, spec.enc, dtype),
        "dynamics": ode_dynamics_init(kd, spec.dyn, dtype),
        "decoder": mlp_init(ky, spec.dec, dtype),
    }


def latent_ode_forecast(params, spec: LatentODEForecasterSpec, x_ctx,
                        t_fut=None):
    """x_ctx (B, context_len, F) -> y_hat (B, pred_len)."""
    B = x_ctx.shape[0]
    if t_fut is None:
        t_fut = jnp.arange(spec.pred_len, dtype=x_ctx.dtype)
    z0 = mlp_apply(params["encoder"], spec.enc,
                   x_ctx.reshape(B, -1))
    z_traj = _solve_latent(params["dynamics"], spec.dyn, z0, t_fut,
                           spec.solver, spec.rtol, spec.atol, spec.max_steps,
                           spec.n_substeps, spec.solver_mode)  # (T, B, D)
    y = mlp_apply(params["decoder"], spec.dec, z_traj)          # (T, B, 1)
    return jnp.swapaxes(y[..., 0], 0, 1)                        # (B, T)


# ----------------------------------------------- diffusion forecasters


class DiffusionForecasterSpec(NamedTuple):
    num_features: int
    context_len: int = 96
    pred_len: int = 8
    latent_dim: int = 64
    enc_hidden: int = 128
    dyn_hidden: int = 128
    diff_T: int = 100
    diff_hidden: int = 256
    encoder: str = "mlp"        # 'mlp' | 'kan' | 'kanrnn' (the KAN-FET one)
    rnn_hidden: int = 64
    num_basis: int = 10
    solver: str = "dopri5"
    rtol: float = 1e-3
    atol: float = 1e-4
    max_steps: int = 32         # same measured need as the point
                                # forecaster's latent solve (~8 steps)
    n_substeps: int = 4
    solver_mode: str = "auto"   # dopri5: scan under AD, while for no-grad eval

    @property
    def enc_mlp(self):
        return MLPConfig((self.context_len * self.num_features,
                          self.enc_hidden, self.latent_dim), activation="relu")

    @property
    def enc_kan(self):
        return KANConfig.make([self.context_len * self.num_features,
                               self.enc_hidden, self.latent_dim])

    @property
    def enc_rnn(self):
        return KANRNNEncoderConfig(self.num_features, self.rnn_hidden,
                                   self.latent_dim, self.num_basis)

    @property
    def dyn(self):
        return ODEDynamicsConfig(self.latent_dim, self.dyn_hidden)

    @property
    def eps_cfg(self):
        return EpsHeadConfig(pred_len=self.pred_len,
                             cond_dim=self.pred_len * self.latent_dim,
                             hidden=self.diff_hidden)


def diffusion_forecaster_init(key, spec: DiffusionForecasterSpec,
                              dtype=jnp.float32):
    ke, kd, kh = jax.random.split(key, 3)
    if spec.encoder == "mlp":
        enc = mlp_init(ke, spec.enc_mlp, dtype)
    elif spec.encoder == "kan":
        enc = kan_init(ke, spec.enc_kan, dtype)
    elif spec.encoder == "kanrnn":
        enc = kan_rnn_encoder_init(ke, spec.enc_rnn, dtype)
    else:
        raise ValueError(f"unknown encoder {spec.encoder!r}")
    return {
        "encoder": enc,
        "dynamics": ode_dynamics_init(kd, spec.dyn, dtype),
        "eps_head": eps_head_init(kh, spec.eps_cfg, dtype),
    }


def _encode(params, spec: DiffusionForecasterSpec, x_ctx):
    B = x_ctx.shape[0]
    if spec.encoder == "mlp":
        return mlp_apply(params["encoder"], spec.enc_mlp, x_ctx.reshape(B, -1))
    if spec.encoder == "kan":
        # Flatten -> KAN -> ReLU between layers happens inside the stack;
        # the reference interleaves nn.ReLU between two KAN blocks.
        h, _ = kan_apply(params["encoder"][:1], KANConfig(spec.enc_kan.layers[:1]),
                         x_ctx.reshape(B, -1))
        h = jax.nn.relu(h)
        z, _ = kan_apply(params["encoder"][1:], KANConfig(spec.enc_kan.layers[1:]), h)
        return z
    return kan_rnn_encoder_apply(params["encoder"], spec.enc_rnn, x_ctx)


def _cond(params, spec: DiffusionForecasterSpec, x_ctx, t_fut):
    z0 = _encode(params, spec, x_ctx)
    z_traj = _solve_latent(params["dynamics"], spec.dyn, z0, t_fut,
                           spec.solver, spec.rtol, spec.atol, spec.max_steps,
                           spec.n_substeps, spec.solver_mode)  # (T, B, D)
    B = x_ctx.shape[0]
    return jnp.swapaxes(z_traj, 0, 1).reshape(B, -1)            # (B, T*D)


def diffusion_forecaster_loss(params, spec: DiffusionForecasterSpec,
                              sched: DiffusionSchedule, x_ctx, y_fut, key,
                              t_fut=None):
    """Epsilon-prediction MSE (forward_train, train_kan_fet_ett.py:623-641)."""
    if t_fut is None:
        t_fut = jnp.arange(spec.pred_len, dtype=x_ctx.dtype)
    cond = _cond(params, spec, x_ctx, t_fut)
    B = y_fut.shape[0]
    k_t, k_q = jax.random.split(key)
    t_idx = jax.random.randint(k_t, (B,), 0, sched.T)
    y_noisy, eps = q_sample(sched, y_fut, t_idx, k_q)
    eps_hat = eps_head_apply(params["eps_head"], spec.eps_cfg, y_noisy,
                             t_idx, cond)
    return jnp.mean((eps_hat - eps) ** 2)


def diffusion_forecaster_sample(params, spec: DiffusionForecasterSpec,
                                sched: DiffusionSchedule, x_ctx, key,
                                t_fut=None, n_samples: int = 1,
                                unroll: int = 4, sampler: str = "pallas",
                                sampler_kwargs=None):
    """Sample future sequences; (B, P) or (n_samples, B, P).

    ``sampler``: "pallas" = whole-chain kernel (ops/pallas_ddpm.py; the
    folded 10-sample eval measures 374k samples/s at B=1024 on v5e with
    the wide-lane-block grid — benchmarks/run_ddpm_block_sweep.py);
    "scan" = hoisted lax.scan (nn/diffusion.py: eps_head_sample_loop;
    at B=64 single-sample the two are a formal tie).
    ``sampler_kwargs`` pass through to the pallas kernel (e.g.
    ``block_b`` for the gridded lane-block width).
    """
    if t_fut is None:
        t_fut = jnp.arange(spec.pred_len, dtype=x_ctx.dtype)
    cond = _cond(params, spec, x_ctx, t_fut)

    if sampler == "pallas":
        from fetode_tpu.ops.pallas_ddpm import pallas_eps_head_sample

        # n_samples > 1 folds samples into the kernel's batch axis (one
        # launch, gridded over batch blocks) — same per-sample PRNG
        # layout as a lax.map of single-sample kernels
        return pallas_eps_head_sample(params["eps_head"], spec.eps_cfg,
                                      sched, cond, key, n_samples=n_samples,
                                      **(sampler_kwargs or {}))

    def one(k):
        # specialised chain: hoists the cond / t-emb first-layer matmuls
        # out of the 200-step loop (nn/diffusion.py: eps_head_sample_loop)
        from fetode_tpu.nn.diffusion import eps_head_sample_loop

        return eps_head_sample_loop(params["eps_head"], spec.eps_cfg, sched,
                                    cond, k, x_ctx.dtype, unroll=unroll)

    if n_samples == 1:
        return one(key)
    return jax.vmap(one)(jax.random.split(key, n_samples))


# --------------------------------------------------- logistic linear


def logistic_linear_init(key, in_dim: int, out_dim: int, num_basis: int,
                         dtype=jnp.float32):
    kb, kw = jax.random.split(key)
    return {
        "basis": logistic_init(kb, in_dim, num_basis, dtype=dtype)._asdict(),
        "w": kaiming_uniform(kw, (out_dim, in_dim * num_basis), dtype=dtype),
        "b": jnp.zeros((out_dim,), dtype),
    }


def logistic_linear_apply(params, x):
    phi = logistic_basis(LogisticParams(**params["basis"]), x)
    return phi.reshape(*x.shape[:-1], -1) @ params["w"].T + params["b"]
