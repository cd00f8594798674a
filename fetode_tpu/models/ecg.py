"""ECG200 classification models: digital baseline, FEPA-RNN, and the
KAN-FET neural-ODE classifiers (logistic- and ferro-basis families).

Capability parity (every model here is fully batched — the reference's
per-sample ODE loops, forced by stateful module buffers, become vmapped
solves; SURVEY.md §7.2-5):

| reference model                              | here                      |
|----------------------------------------------|---------------------------|
| Digital_RNN (train_ecg.py:71-113)            | nn.digital_rnn            |
| FullyNonlinearKANRNN ferro ("FEPA-RNN",      | nn.ferro_kan_rnn          |
|   train_ecg.py:237-256)                      |                           |
| KanFet_NODE (train_ecg_kan_fet_nn_ode.py:    | KanFetNODE (field='plain')|
|   512-572, No_MLP_KANODEFunc :483-508)       |                           |
| MLPKANODEFunc variant (:423-481)             | KanFetNODE (field='mlp')  |
| KanFet_MLP_NODE ferro (train_ecg.py:         | KanFetMLPNODE             |
|   986-1059, KANFetODEFunc stability armor)   |                           |
| KanFet_MLP_Euler_Rollout                     | KanFetMLPNODE             |
|   (train_ecg_kan_fet_nn_ode.py:670-758)      |   (method='euler'/rk2/rk4,|
|                                              |    final-state integrate) |
| OneODEEncoder / NODE_RNN (input-driven,      | NodeRNN                   |
|   train_noisy_ecg.py:345-471)                |                           |
| ODEIntegratedRNNEncoder (train_ecg.py:       | OdeRnnEncoder             |
|   464-530)                                   |                           |
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from fetode_tpu.nn.kan import KANConfig, kan_apply, kan_init
from fetode_tpu.nn.rnn import (
    FerroKANCellConfig,
    LogisticKANCellConfig,
    ferro_kan_cell_apply,
    ferro_kan_cell_init,
    ferro_kan_cell_state,
    logistic_kan_cell_apply,
    logistic_kan_cell_init,
)
from fetode_tpu.ops.ferro import FerroConfig, FerroParams, ferro_apply, ferro_init, ferro_state_init
from fetode_tpu.ops.interp import linear_interp
from fetode_tpu.ops.logistic import LogisticParams, logistic_basis, logistic_init
from fetode_tpu.solvers import integrate_final, odeint_dopri5, odeint_fixed
from fetode_tpu.utils.init import kaiming_uniform


# ---------------------------------------------------------- feature mixer


def mixer_init(key, dim: int, num_basis: int, dtype=jnp.float32):
    """KANFeatureMixer: x -> sigmoid(logistic basis) flattened (B, D*K)
    (train_ecg_kan_fet_nn_ode.py:408-420)."""
    return logistic_init(key, dim, num_basis, dtype=dtype)._asdict()


def mixer_apply(params, x):
    phi = jax.nn.sigmoid(logistic_basis(LogisticParams(**params), x))
    return phi.reshape(*x.shape[:-1], -1)


# -------------------------------------------------------- KanFet NODE (logistic)


class KanFetNODESpec(NamedTuple):
    T: int = 96
    num_classes: int = 2
    latent_dim: int = 64
    num_basis: int = 10
    ode_hidden: int = 128
    field: str = "plain"        # 'plain' = No_MLP_KANODEFunc; 'mlp' = MLPKANODEFunc
    solver: str = "dopri5"
    rtol: float = 1e-2
    atol: float = 1e-3
    max_steps: int = 16         # ~5 accepted steps measured; see
                                # KanFetMLPNODESpec.max_steps note
    h_bound: float = 1.0
    init_out_std: float = 1e-3
    solver_mode: str = "auto"   # dopri5: scan under AD, while for no-grad eval

    @property
    def kan_cfg(self) -> KANConfig:
        return KANConfig.make([self.latent_dim * self.num_basis,
                               self.ode_hidden, self.ode_hidden])


def kanfet_node_init(key, spec: KanFetNODESpec, dtype=jnp.float32):
    ke, kf, kp, kc, km, kk, ka = jax.random.split(key, 7)
    params = {
        "encoder_w": kaiming_uniform(ke, (spec.latent_dim, spec.T), dtype=dtype),
        "encoder_b": jnp.zeros((spec.latent_dim,), dtype),
        "field_mixer": mixer_init(kf, spec.latent_dim, spec.num_basis, dtype),
        "cls_mixer": mixer_init(km, spec.latent_dim, spec.num_basis, dtype),
        "cls_w": kaiming_uniform(kc, (spec.num_classes,
                                      spec.latent_dim * spec.num_basis),
                                 dtype=dtype),
        "cls_b": jnp.zeros((spec.num_classes,), dtype),
    }
    if spec.field == "plain":
        # small-init projection (B, D*K) -> (B, D)
        params["proj_w"] = jax.random.normal(
            kp, (spec.latent_dim, spec.latent_dim * spec.num_basis), dtype) * 0.01
        params["proj_b"] = jnp.zeros((spec.latent_dim,), dtype)
    else:
        params["ln_scale"] = jnp.ones((spec.latent_dim,), dtype)
        params["ln_bias"] = jnp.zeros((spec.latent_dim,), dtype)
        params["kan"] = kan_init(kk, spec.kan_cfg, dtype)
        params["out_w"] = jax.random.normal(
            kp, (spec.latent_dim, spec.ode_hidden), dtype) * spec.init_out_std
        params["out_b"] = jnp.zeros((spec.latent_dim,), dtype)
        params["log_alpha"] = jnp.asarray(-3.0, dtype)
        params["scale"] = jnp.asarray(1.0, dtype)
    return params


def kanfet_node_field(params, spec: KanFetNODESpec, t, h):
    from fetode_tpu.nn.mlp import layer_norm

    if spec.field == "plain":
        phi = mixer_apply(params["field_mixer"], h)
        return phi @ params["proj_w"].T + params["proj_b"]
    h = layer_norm(h, params["ln_scale"], params["ln_bias"])
    h = spec.h_bound * jnp.tanh(h / spec.h_bound)
    phi = mixer_apply(params["field_mixer"], h)
    z, _ = kan_apply(params["kan"], spec.kan_cfg, phi)
    z = jax.nn.silu(z)
    dh = z @ params["out_w"].T + params["out_b"]
    return params["scale"] * jax.nn.softplus(params["log_alpha"]) * dh


def kanfet_node_apply(params, spec: KanFetNODESpec, x):
    """x (B, T) -> logits (B, num_classes); latent NODE over [0, 1].

    ``solver_mode="pallas"`` routes the latent solve through the
    whole-solve in-kernel discrete adjoint ('plain' field:
    ops/pallas_logistic_node.py; 'mlp' field: ops/pallas_mlp_node.py)."""
    h0 = x @ params["encoder_w"].T + params["encoder_b"]
    ts = jnp.asarray([0.0, 1.0], x.dtype)

    def rhs(t, h):
        return kanfet_node_field(params, spec, t, h)

    if (spec.solver_mode == "pallas" and spec.solver == "dopri5"
            and spec.field == "plain"):
        from fetode_tpu.ops.pallas_logistic_node import (
            pallas_logistic_node_solve,
        )

        hT = pallas_logistic_node_solve(params, h0, spec)
    elif spec.solver_mode == "pallas" and spec.solver == "dopri5":
        from fetode_tpu.ops.pallas_mlp_node import pallas_mlp_node_solve

        hT = pallas_mlp_node_solve(params, h0, spec)
    elif spec.solver == "dopri5":
        mode = "scan" if spec.solver_mode == "pallas" else spec.solver_mode
        traj = odeint_dopri5(rhs, h0, ts, rtol=spec.rtol, atol=spec.atol,
                             max_steps=spec.max_steps, mode=mode)
        hT = jax.tree_util.tree_map(lambda a: a[-1], traj)
    else:
        hT = integrate_final(rhs, h0, 0.0, 1.0, method=spec.solver, n_steps=8)

    feat = mixer_apply(params["cls_mixer"], hT)
    return feat @ params["cls_w"].T + params["cls_b"]


# ------------------------------------------------- KanFet MLP NODE (ferro)


class KanFetMLPNODESpec(NamedTuple):
    T: int = 96
    num_classes: int = 2
    latent_dim: int = 64
    num_basis: int = 10
    ode_hidden: int = 128
    solver: str = "dopri5"      # or euler/rk2/rk4 -> final-state rollout
    rtol: float = 1e-2
    atol: float = 1e-3
    # Measured on real ECG200: the latent solve needs ~5 accepted steps at
    # this tolerance and best test acc is BIT-IDENTICAL at budgets
    # 64/24/16 while the epoch wall drops 2-4x (the scan pays every
    # masked iteration) — 16 keeps 3x headroom over the measured need.
    max_steps: int = 16
    n_steps: int = 8            # fixed-step count for rollout variants
    h_bound: float = 1.0
    dh_clip: float = 50.0
    noise_std: float = 0.0      # >0: NoisyFerroelectricBasis semantics
    solver_mode: str = "auto"   # dopri5: scan under AD, while for no-grad eval
    state_dtype: str = ""       # "" = input dtype; "bfloat16" halves the
                                # hysteresis-state HBM traffic
    pallas_layout: str = "loop"  # "loop" (per-sample fori) or "vec"
                                 # (3-D batch blocks) kernel layout
    gate_impl: str = "sigmoid"   # "tanh": sigma via tanh identity, ~1 ulp —
                                 # the measured +12% VPU form on v5e
                                 # (benchmarks/ferro_ceiling_tpu.json)

    @property
    def fc1_cfg(self):
        return FerroConfig(self.latent_dim, self.ode_hidden, self.num_basis,
                           noise_std=self.noise_std,
                           gate_impl=self.gate_impl)

    @property
    def fc2_cfg(self):
        return FerroConfig(self.ode_hidden, self.latent_dim, self.num_basis,
                           noise_std=self.noise_std,
                           gate_impl=self.gate_impl)


def kanfet_mlp_node_init(key, spec: KanFetMLPNODESpec, dtype=jnp.float32):
    ke, k1, k2, kc = jax.random.split(key, 4)
    return {
        "encoder_w": kaiming_uniform(ke, (spec.latent_dim, spec.T), dtype=dtype),
        "encoder_b": jnp.zeros((spec.latent_dim,), dtype),
        "fc1": ferro_init(k1, spec.fc1_cfg, dtype, coef_scale=0.1)._asdict(),
        "fc2": ferro_init(k2, spec.fc2_cfg, dtype, coef_scale=0.1)._asdict(),
        "cls_w": kaiming_uniform(kc, (spec.num_classes, spec.latent_dim),
                                 dtype=dtype),
        "cls_b": jnp.zeros((spec.num_classes,), dtype),
    }


def kanfet_mlp_node_field(params, spec: KanFetMLPNODESpec, t, h, states,
                          noise_keys=None, per_eval_noise=True,
                          noise_std=None):
    """Two-layer ferro field with the reference's stability armor
    (train_ecg.py:1002-1011): latent tanh bound, non-finite scrub, slope
    clamp.  Hysteresis state is frozen during the solve.

    ``per_eval_noise=False`` freezes the device-noise draw for the whole
    solve: an ADAPTIVE solver's embedded error estimate cannot budget a
    white-noise RHS (measured at the preset spec: noise_std 0.2 turns 5
    accepted dopri5 steps into budget exhaustion and silent truncation —
    the reference's torchdiffeq has no step cap and simply grinds), so
    the dopri5 path uses frozen noise while fixed-step solves keep the
    reference's fresh-per-evaluation semantics."""
    s1, s2 = states
    k1 = k2 = None
    if noise_keys is not None:
        k1, k2 = noise_keys
        if per_eval_noise:
            # Fresh device noise at every RHS evaluation (the reference's
            # randn_like draws per forward call): fold the evaluation
            # time's bit pattern into the per-layer keys.  Draws are
            # distinct across steps; RK stages that evaluate at the SAME
            # time (rk4's two midpoint stages) share a draw — keying by
            # anything finer isn't possible from inside a pure RHS.
            ti = jax.lax.bitcast_convert_type(
                jnp.asarray(t, jnp.float32), jnp.int32)
            k1, k2 = (jax.random.fold_in(k, ti) for k in (k1, k2))
    h = spec.h_bound * jnp.tanh(h / spec.h_bound)
    z, _ = ferro_apply(FerroParams(**params["fc1"]), s1, h, spec.fc1_cfg,
                       noise_key=k1, noise_std=noise_std)
    z = jnp.tanh(z)
    dh, _ = ferro_apply(FerroParams(**params["fc2"]), s2, z, spec.fc2_cfg,
                        noise_key=k2, noise_std=noise_std)
    dh = jnp.nan_to_num(dh, nan=0.0, posinf=1e3, neginf=-1e3)
    return jnp.clip(dh, -spec.dh_clip, spec.dh_clip)


def kanfet_mlp_node_apply(params, spec: KanFetMLPNODESpec, x, *,
                          noise_key=None, noise_std=None, mesh=None):
    """x (B, T) -> logits. One batched solve (no per-sample loop).

    ``solver_mode="pallas"`` routes the latent solve through the
    whole-solve in-kernel discrete adjoint (ops/pallas_ferro_node.py);
    device noise rides into the kernel as frozen per-solve draws with
    the XLA dopri5 path's exact keys and values.  With ``mesh`` the
    kernel runs data-parallel: one per-device kernel on each batch shard
    (``pallas_ferro_node_solve_sharded``; GSPMD cannot partition the
    custom call itself).  The scan path needs no mesh argument — its
    sharding comes entirely from the input placement.

    ``noise_std`` (traced) overrides ``spec.noise_std`` for population
    training (one ``vmap``-ed member per device-noise level).  On the
    kernel path the traced scale rides inside the pre-scaled frozen
    noise operands (ops/pallas_ferro_node.py: ``frozen_solve_noise``),
    so the whole population grid — std-0 members included — runs the
    in-kernel adjoint in one vmapped program; ``noise_key`` is then
    required.
    """
    if noise_std is not None and spec.solver_mode == "pallas" \
            and noise_key is None:
        raise ValueError("traced noise_std on the pallas path requires a "
                         "noise_key (std-0 members ride zero-valued noise "
                         "operands)")
    if spec.gate_impl != "sigmoid" and spec.solver_mode == "pallas":
        raise ValueError("gate_impl='tanh' requires an XLA solve path — the "
                         "whole-solve kernel implements the sigmoid form "
                         "(and is latency-bound, so the VPU gate form does "
                         "not move it)")
    B = x.shape[0]
    h0 = x @ params["encoder_w"].T + params["encoder_b"]
    if (spec.solver_mode == "pallas" and spec.solver == "dopri5"
            and (spec.noise_std == 0.0 or noise_key is not None)):
        if mesh is not None:
            from fetode_tpu.ops.pallas_ferro_node import (
                pallas_ferro_node_solve_sharded,
            )

            if noise_std is not None:
                raise ValueError("traced noise_std + mesh sharding is not "
                                 "wired; population runs shard the member "
                                 "axis instead (train/ecg_driver.py)")
            hT = pallas_ferro_node_solve_sharded(
                params["fc1"], params["fc2"], h0, spec, mesh,
                noise_key=noise_key)
        else:
            from fetode_tpu.ops.pallas_ferro_node import (
                pallas_ferro_node_solve,
            )

            hT = pallas_ferro_node_solve(params["fc1"], params["fc2"], h0,
                                         spec, noise_key=noise_key,
                                         noise_std=noise_std)
        return hT @ params["cls_w"].T + params["cls_b"]
    sdt = jnp.dtype(spec.state_dtype) if spec.state_dtype else x.dtype
    states = (ferro_state_init((B,), spec.fc1_cfg, sdt),
              ferro_state_init((B,), spec.fc2_cfg, sdt))
    nkeys = jax.random.split(noise_key) if noise_key is not None else None
    per_eval = spec.solver != "dopri5"   # see kanfet_mlp_node_field

    def rhs(t, h):
        return kanfet_mlp_node_field(params, spec, t, h, states, nkeys,
                                     per_eval_noise=per_eval,
                                     noise_std=noise_std)

    if spec.solver == "dopri5":
        ts = jnp.asarray([0.0, 1.0], x.dtype)
        mode = "scan" if spec.solver_mode == "pallas" else spec.solver_mode
        traj = odeint_dopri5(rhs, h0, ts, rtol=spec.rtol, atol=spec.atol,
                             max_steps=spec.max_steps, mode=mode)
        hT = traj[-1]
    else:
        hT = integrate_final(rhs, h0, 0.0, 1.0, method=spec.solver,
                             n_steps=spec.n_steps)
    return hT @ params["cls_w"].T + params["cls_b"]


# --------------------------------------------- input-driven NODE encoders


class NodeRNNSpec(NamedTuple):
    """OneODEEncoder + KAN cell + linear head (NODE_RNN,
    train_noisy_ecg.py:345-471).  dh/dt = tanh(ferro([h, x(t)]))*gain+bias."""

    input_size: int = 1
    hidden_size: int = 64
    num_classes: int = 2
    num_basis: int = 10
    solver: str = "rk4"
    n_steps: int = 96
    noise_std: float = 0.0

    @property
    def basis_cfg(self):
        return FerroConfig(self.hidden_size + self.input_size,
                           self.hidden_size, self.num_basis,
                           noise_std=self.noise_std)

    @property
    def cell_cfg(self):
        return FerroKANCellConfig(self.hidden_size, self.hidden_size,
                                  self.num_basis, noise_std=self.noise_std)


def node_rnn_init(key, spec: NodeRNNSpec, dtype=jnp.float32):
    kl, kb, kc, kh = jax.random.split(key, 4)
    return {
        "lift_w": kaiming_uniform(kl, (spec.hidden_size, spec.input_size),
                                  dtype=dtype),
        "lift_b": jnp.zeros((spec.hidden_size,), dtype),
        "basis": ferro_init(kb, spec.basis_cfg, dtype, coef_scale=0.1)._asdict(),
        "gain": jnp.ones((spec.hidden_size,), dtype),
        "bias": jnp.zeros((spec.hidden_size,), dtype),
        "cell": ferro_kan_cell_init(kc, spec.cell_cfg, dtype),
        "head_w": kaiming_uniform(kh, (spec.num_classes, spec.hidden_size),
                                  dtype=dtype),
        "head_b": jnp.zeros((spec.num_classes,), dtype),
    }


def node_rnn_encode(params, spec: NodeRNNSpec, x_seq, *, noise_key=None):
    """Single-sample encoder: x_seq (T, D) -> (H,).  Batched via vmap.

    Device noise is FRESH at every RHS evaluation (the reference's
    ``randn_like`` inside the odefunc draws per-call,
    train_noisy_ecg.py:355-379): the key is folded with the evaluation
    time's bit pattern — distinct across steps; RK stages evaluating at
    the same time (rk4's two midpoint stages) share a draw.  The spec's
    solvers are all fixed-step, where stochastic RHS evaluation is
    well-posed (no embedded error estimate to poison)."""
    T = x_seq.shape[0]
    t_grid = jnp.linspace(0.0, 1.0, T, dtype=x_seq.dtype)
    h0 = x_seq[0] @ params["lift_w"].T + params["lift_b"]
    state = ferro_state_init((), spec.basis_cfg, x_seq.dtype)

    def rhs(t, h):
        x_t = linear_interp(t_grid, x_seq, t)
        hx = jnp.concatenate([h, x_t], axis=-1)
        nk = (jax.random.fold_in(noise_key, jax.lax.bitcast_convert_type(
                  jnp.asarray(t, jnp.float32), jnp.int32))
              if noise_key is not None else None)
        phi, _ = ferro_apply(FerroParams(**params["basis"]), state, hx,
                             spec.basis_cfg, noise_key=nk)
        return jnp.tanh(phi) * params["gain"] + params["bias"]

    return integrate_final(rhs, h0, 0.0, 1.0, method=spec.solver,
                           n_steps=spec.n_steps)


def node_rnn_apply(params, spec: NodeRNNSpec, x, *, noise_key=None):
    """(B, T) or (B, T, D) -> logits; the reference's per-sample loop is a
    vmap over the encoder, then one KAN-cell refinement + head."""
    if x.ndim == 2:
        x = x[..., None]
    B = x.shape[0]
    cell_key = None
    if noise_key is not None:
        # independent device noise per sample (the reference's randn_like on
        # a batched tensor draws per-sample noise); the refinement cell is
        # a noisy device too and gets its own key (batched basis shape
        # already draws per-sample noise there)
        noise_key, cell_key = jax.random.split(noise_key)
        hT = jax.vmap(lambda xb, k: node_rnn_encode(params, spec, xb,
                                                    noise_key=k))(
            x, jax.random.split(noise_key, B))
    else:
        hT = jax.vmap(lambda xb: node_rnn_encode(params, spec, xb))(x)
    h = jnp.zeros((B, spec.hidden_size), x.dtype)
    cstate = ferro_kan_cell_state((B,), spec.cell_cfg, x.dtype)
    h1, _ = ferro_kan_cell_apply(params["cell"], spec.cell_cfg, hT, h, cstate,
                                 noise_key=cell_key)
    return h1 @ params["head_w"].T + params["head_b"]


class OdeRnnEncoderSpec(NamedTuple):
    """ODE-integrated RNN encoder: dh/dt = alpha*(cell(lift(x(t)), h) - h)
    (train_ecg.py:464-530)."""

    input_size: int = 1
    hidden_size: int = 64
    num_basis: int = 10
    alpha: float = 10.0
    solver: str = "rk4"
    n_steps: int = 96

    @property
    def cell_cfg(self):
        return LogisticKANCellConfig(self.hidden_size, self.hidden_size,
                                     self.num_basis)


def ode_rnn_encoder_init(key, spec: OdeRnnEncoderSpec, dtype=jnp.float32):
    kl, kc, k0 = jax.random.split(key, 3)
    return {
        "lift_w": kaiming_uniform(kl, (spec.hidden_size, spec.input_size),
                                  dtype=dtype),
        "lift_b": jnp.zeros((spec.hidden_size,), dtype),
        "h0_w": kaiming_uniform(k0, (spec.hidden_size, spec.input_size),
                                dtype=dtype),
        "h0_b": jnp.zeros((spec.hidden_size,), dtype),
        "cell": logistic_kan_cell_init(kc, spec.cell_cfg, dtype),
    }


def ode_rnn_encode(params, spec: OdeRnnEncoderSpec, x_seq):
    """x_seq (T, D) -> (H,): relaxation toward the cell's discrete update."""
    T = x_seq.shape[0]
    t_grid = jnp.linspace(0.0, 1.0, T, dtype=x_seq.dtype)
    h0 = x_seq[0] @ params["h0_w"].T + params["h0_b"]

    def rhs(t, h):
        x_t = linear_interp(t_grid, x_seq, t)
        z_t = x_t @ params["lift_w"].T + params["lift_b"]
        h_next = logistic_kan_cell_apply(params["cell"], spec.cell_cfg,
                                         z_t[None], h[None])[0]
        return spec.alpha * (h_next - h)

    return integrate_final(rhs, h0, 0.0, 1.0, method=spec.solver,
                           n_steps=spec.n_steps)
