"""Recurrent cells and sequence encoders (KAN-basis and baseline RNNs).

Capability parity:
* logistic-basis ``FullyNonlinearKANCell`` / ``KANClassifier`` /
  ``KANRegressor`` / ``FullyNonlinearKANRNN``
  (``/root/reference/train_kanfet_rnn_predprey.py:119-196``, cloned at
  ``train_kan_fet_ett.py:780-795``);
* ferro-basis cell/classifier/RNN (``/root/reference/train_ecg.py:203-256``);
* ``KANRNNEncoder`` context encoder -> latent z0
  (``train_kan_fet_ett.py:797-818``);
* ``Digital_RNN`` bidirectional tanh baseline (``train_ecg.py:71-113``).

All sequence loops are ``lax.scan`` (one compiled body), hysteresis state
is threaded explicitly per time step — this is where the hysteresis
actually carries memory, and why the explicit-state design is load-bearing.

Faithfulness note: the reference cells concatenate input-features and
hidden-features then TRUNCATE to the first ``hidden_size`` entries
(``train_ecg.py:213-217``), so the surviving slice is dominated by the
input branch; with the ferro cell, cross-step memory flows through the
hysteresis state rather than the tanh recurrence.  We reproduce that
behavior (it is the defined contract) and expose ``mix="sum"`` as the
fixed alternative.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    FerroState,
    ferro_apply,
    ferro_init,
    ferro_state_init,
)
from fetode_tpu.ops.logistic import LogisticParams, logistic_basis, logistic_init
from fetode_tpu.utils.init import kaiming_uniform


# ------------------------------------------------------ logistic KAN cell


class LogisticKANCellConfig(NamedTuple):
    input_size: int
    hidden_size: int
    num_basis: int = 10
    mix: str = "truncate"   # reference behavior | "sum"


def logistic_kan_cell_init(key, cfg: LogisticKANCellConfig, dtype=jnp.float32):
    ki, kh = jax.random.split(key)
    return {
        "input_basis": logistic_init(ki, cfg.input_size, cfg.num_basis,
                                     dtype=dtype)._asdict(),
        "hidden_basis": logistic_init(kh, cfg.hidden_size, cfg.num_basis,
                                      dtype=dtype)._asdict(),
    }


def logistic_kan_cell_apply(params, cfg: LogisticKANCellConfig, x_t, h_prev):
    """sigmoid(concat[phi(x), phi(h)]) truncated to hidden_size."""
    x_phi = logistic_basis(LogisticParams(**params["input_basis"]), x_t)
    h_phi = logistic_basis(LogisticParams(**params["hidden_basis"]), h_prev)
    x_flat = x_phi.reshape(*x_t.shape[:-1], -1)
    h_flat = h_phi.reshape(*h_prev.shape[:-1], -1)
    combined = jnp.concatenate([x_flat, h_flat], axis=-1)
    out = jax.nn.sigmoid(combined)
    if cfg.mix == "truncate":
        return out[..., : cfg.hidden_size]
    # "sum": fold the full feature vector back to hidden_size by summing
    # aligned chunks — keeps every basis feature contributing.
    pad = (-out.shape[-1]) % cfg.hidden_size
    out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
    return out.reshape(*out.shape[:-1], -1, cfg.hidden_size).sum(-2)


class KANHeadConfig(NamedTuple):
    """Logistic-basis linear head (classifier or regressor)."""

    in_dim: int
    out_dim: int
    num_basis: int = 10


def kan_head_init(key, cfg: KANHeadConfig, dtype=jnp.float32):
    kb, kw = jax.random.split(key)
    return {
        "basis": logistic_init(kb, cfg.in_dim, cfg.num_basis, dtype=dtype)._asdict(),
        "output": jax.random.normal(
            kw, (cfg.in_dim * cfg.num_basis, cfg.out_dim), dtype),
    }


def kan_head_apply(params, cfg: KANHeadConfig, x):
    phi = jax.nn.sigmoid(logistic_basis(LogisticParams(**params["basis"]), x))
    return phi.reshape(*x.shape[:-1], -1) @ params["output"]


class LogisticKANRNNConfig(NamedTuple):
    input_size: int = 3
    hidden_size: int = 64
    out_dim: int = 2
    num_basis: int = 10
    mix: str = "truncate"

    @property
    def cell(self):
        return LogisticKANCellConfig(self.input_size, self.hidden_size,
                                     self.num_basis, self.mix)

    @property
    def head(self):
        return KANHeadConfig(self.hidden_size, self.out_dim, self.num_basis)


def logistic_kan_rnn_init(key, cfg: LogisticKANRNNConfig, dtype=jnp.float32):
    kc, kh = jax.random.split(key)
    return {
        "cell": logistic_kan_cell_init(kc, cfg.cell, dtype),
        "head": kan_head_init(kh, cfg.head, dtype),
    }


def logistic_kan_rnn_apply(params, cfg: LogisticKANRNNConfig, x_seq):
    """x_seq (B, T, input_size) -> (B, out_dim); scan over time."""
    B = x_seq.shape[0]
    h0 = jnp.zeros((B, cfg.hidden_size), x_seq.dtype)

    def step(h, x_t):
        h1 = logistic_kan_cell_apply(params["cell"], cfg.cell, x_t, h)
        return h1, None

    hT, _ = jax.lax.scan(step, h0, jnp.swapaxes(x_seq, 0, 1))
    return kan_head_apply(params["head"], cfg.head, hT)


# --------------------------------------------------------- ferro KAN cell


class FerroKANCellConfig(NamedTuple):
    input_size: int
    hidden_size: int
    num_basis: int = 10
    gate_slope: float = 10.0
    alpha: float = 0.8
    noise_std: float = 0.0
    mix: str = "truncate"
    state_dtype: str = ""   # "" = input dtype; "bfloat16" halves the
                            # per-step hysteresis-state carry traffic

    @property
    def input_cfg(self):
        return FerroConfig(self.input_size, self.hidden_size, self.num_basis,
                           self.gate_slope, self.alpha, self.noise_std)

    @property
    def hidden_cfg(self):
        return FerroConfig(self.hidden_size, self.hidden_size, self.num_basis,
                           self.gate_slope, self.alpha, self.noise_std)


class FerroCellState(NamedTuple):
    input_state: FerroState
    hidden_state: FerroState


def ferro_kan_cell_init(key, cfg: FerroKANCellConfig, dtype=jnp.float32):
    ki, kh = jax.random.split(key)
    return {
        "input_basis": ferro_init(ki, cfg.input_cfg, dtype)._asdict(),
        "hidden_basis": ferro_init(kh, cfg.hidden_cfg, dtype)._asdict(),
    }


def ferro_kan_cell_state(batch_shape, cfg: FerroKANCellConfig,
                         dtype=jnp.float32) -> FerroCellState:
    if cfg.state_dtype:
        dtype = jnp.dtype(cfg.state_dtype)
    return FerroCellState(
        input_state=ferro_state_init(batch_shape, cfg.input_cfg, dtype),
        hidden_state=ferro_state_init(batch_shape, cfg.hidden_cfg, dtype),
    )


def ferro_kan_cell_apply(params, cfg: FerroKANCellConfig, x_t, h_prev,
                         state: FerroCellState, *, noise_key=None):
    """tanh(concat[ferro_x(x_t), ferro_h(h)]) truncated to hidden_size.

    Cross-step memory flows through the hysteresis state.
    Returns (h_next, new_state).
    """
    kx = kh = None
    if noise_key is not None:
        kx, kh = jax.random.split(noise_key)
    x_feat, s_in = ferro_apply(FerroParams(**params["input_basis"]),
                               state.input_state, x_t, cfg.input_cfg,
                               noise_key=kx)
    h_feat, s_hid = ferro_apply(FerroParams(**params["hidden_basis"]),
                                state.hidden_state, h_prev, cfg.hidden_cfg,
                                noise_key=kh)
    combined = jnp.concatenate([x_feat, h_feat], axis=-1)
    out = jnp.tanh(combined)
    if cfg.mix == "truncate":
        h1 = out[..., : cfg.hidden_size]
    else:
        h1 = jnp.tanh(x_feat + h_feat)
    return h1, FerroCellState(s_in, s_hid)


class FerroKANRNNConfig(NamedTuple):
    """Ferro-basis sequence classifier (the FEPA-RNN of the ECG scripts)."""

    input_size: int = 1
    hidden_size: int = 64
    num_classes: int = 2
    num_basis: int = 10
    noise_std: float = 0.0
    state_dtype: str = ""

    @property
    def cell(self):
        return FerroKANCellConfig(self.input_size, self.hidden_size,
                                  self.num_basis, noise_std=self.noise_std,
                                  state_dtype=self.state_dtype)

    @property
    def head_cfg(self):
        return FerroConfig(self.hidden_size, self.hidden_size,
                           self.num_basis, noise_std=self.noise_std)


def ferro_kan_rnn_init(key, cfg: FerroKANRNNConfig, dtype=jnp.float32):
    kc, kb, kw = jax.random.split(key, 3)
    return {
        "cell": ferro_kan_cell_init(kc, cfg.cell, dtype),
        "head_basis": ferro_init(kb, cfg.head_cfg, dtype)._asdict(),
        # Trained head (the reference's KANClassifier resamples a random
        # head every forward, train_ecg.py:230 — a bug we do not replicate;
        # divergence documented per SURVEY.md §7.2-6).
        "head_weight": kaiming_uniform(kw, (cfg.num_classes, cfg.hidden_size),
                                       dtype=dtype),
    }


def ferro_kan_rnn_apply(params, cfg: FerroKANRNNConfig, x_seq, *,
                        noise_key=None):
    """x_seq (B, T) or (B, T, input_size) -> logits (B, num_classes).

    Hysteresis state is fresh per call (reset-per-sequence semantics,
    the reference's ``reset_stateful_ferro_buffers``, train_ecg.py:371-378).
    """
    if x_seq.ndim == 2:
        x_seq = x_seq[..., None]
    B, T, _ = x_seq.shape
    h0 = jnp.zeros((B, cfg.hidden_size), x_seq.dtype)
    s0 = ferro_kan_cell_state((B,), cfg.cell, x_seq.dtype)
    head_key = None
    if noise_key is not None:
        noise_key, head_key = jax.random.split(noise_key)
    keys = (jax.random.split(noise_key, T) if noise_key is not None
            else jnp.zeros((T, 2), jnp.uint32))

    def step(carry, inp):
        h, s = carry
        x_t, k = inp
        nk = k if noise_key is not None else None
        h1, s1 = ferro_kan_cell_apply(params["cell"], cfg.cell, x_t, h, s,
                                      noise_key=nk)
        return (h1, s1), None

    (hT, sT), _ = jax.lax.scan(step, (h0, s0),
                               (jnp.swapaxes(x_seq, 0, 1), keys))

    # The head basis is a noisy device too (train_noisy_ecg.py swaps ALL
    # bases for NoisyFerroelectricBasis) — it gets its own key split.
    head_state = ferro_state_init((B,), cfg.head_cfg, x_seq.dtype)
    feat, _ = ferro_apply(FerroParams(**params["head_basis"]), head_state,
                          hT, cfg.head_cfg, noise_key=head_key)
    return jnp.tanh(feat) @ params["head_weight"].T


# ------------------------------------------------------ KAN-RNN encoder


class KANRNNEncoderConfig(NamedTuple):
    num_features: int
    hidden_size: int
    latent_dim: int
    num_basis: int = 10

    @property
    def cell(self):
        return LogisticKANCellConfig(self.num_features, self.hidden_size,
                                     self.num_basis)


def kan_rnn_encoder_init(key, cfg: KANRNNEncoderConfig, dtype=jnp.float32):
    kc, kw, kb = jax.random.split(key, 3)
    return {
        "cell": logistic_kan_cell_init(kc, cfg.cell, dtype),
        "to_latent_w": kaiming_uniform(kw, (cfg.latent_dim, cfg.hidden_size),
                                       dtype=dtype),
        "to_latent_b": jnp.zeros((cfg.latent_dim,), dtype),
    }


def kan_rnn_encoder_apply(params, cfg: KANRNNEncoderConfig, x_ctx):
    """(B, T, F) context -> (B, latent) initial latent state z0.

    The reference's Python loop over 96 context steps
    (train_kan_fet_ett.py:809-818, its self-reported hotspot) is one scan.
    """
    B = x_ctx.shape[0]
    h0 = jnp.zeros((B, cfg.hidden_size), x_ctx.dtype)

    def step(h, x_t):
        return logistic_kan_cell_apply(params["cell"], cfg.cell, x_t, h), None

    hT, _ = jax.lax.scan(step, h0, jnp.swapaxes(x_ctx, 0, 1))
    return hT @ params["to_latent_w"].T + params["to_latent_b"]


# ---------------------------------------------------------- digital RNN


class DigitalRNNConfig(NamedTuple):
    """Plain tanh RNN classifier baseline (bidirectional), the reference's
    ``Digital_RNN`` (cuDNN nn.RNN) re-expressed as two scans."""

    input_size: int = 1
    hidden_size: int = 64
    num_classes: int = 2
    bidirectional: bool = True


def digital_rnn_init(key, cfg: DigitalRNNConfig, dtype=jnp.float32):
    def cell_params(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "w_ih": kaiming_uniform(k1, (cfg.hidden_size, cfg.input_size), dtype=dtype),
            "w_hh": kaiming_uniform(k2, (cfg.hidden_size, cfg.hidden_size), dtype=dtype),
            "b": jnp.zeros((cfg.hidden_size,), dtype),
        }

    kf, kb, kh = jax.random.split(key, 3)
    dirs = 2 if cfg.bidirectional else 1
    params = {"fwd": cell_params(kf)}
    if cfg.bidirectional:
        params["bwd"] = cell_params(kb)
    params["head_w"] = kaiming_uniform(kh, (cfg.num_classes,
                                            dirs * cfg.hidden_size), dtype=dtype)
    params["head_b"] = jnp.zeros((cfg.num_classes,), dtype)
    return params


def digital_rnn_apply(params, cfg: DigitalRNNConfig, x_seq):
    """(B, T) or (B, T, F) -> logits (B, num_classes)."""
    if x_seq.ndim == 2:
        x_seq = x_seq[..., None]
    B = x_seq.shape[0]
    xs = jnp.swapaxes(x_seq, 0, 1)

    def run(cell, xs):
        def step(h, x_t):
            h1 = jnp.tanh(x_t @ cell["w_ih"].T + h @ cell["w_hh"].T + cell["b"])
            return h1, None
        h0 = jnp.zeros((B, cfg.hidden_size), x_seq.dtype)
        hT, _ = jax.lax.scan(step, h0, xs)
        return hT

    feats = [run(params["fwd"], xs)]
    if cfg.bidirectional:
        feats.append(run(params["bwd"], xs[::-1]))
    h = jnp.concatenate(feats, axis=-1)
    return h @ params["head_w"].T + params["head_b"]
