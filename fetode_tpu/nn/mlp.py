"""Plain MLP blocks: generic stacks and the residual bottleneck head.

Parity: ``ResidualBottleneckMLPHead`` (y + MLP(y), GELU bottleneck,
``/root/reference/train_kanfet_mlp_node_predprey.py:192-203``) and the
assorted 2-layer tanh/ReLU MLPs used as ODE dynamics / encoders /
denoisers across the ETT and diffusion scripts.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from fetode_tpu.utils.init import kaiming_uniform

_ACTS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


class MLPConfig(NamedTuple):
    sizes: Tuple[int, ...]          # (in, hidden..., out)
    activation: str = "tanh"
    final_activation: str = "identity"
    out_scale: float = 1.0          # small-init trick for ODE fields


def mlp_init(key, cfg: MLPConfig, dtype=jnp.float32):
    keys = jax.random.split(key, len(cfg.sizes) - 1)
    layers = []
    for i, (k, din, dout) in enumerate(zip(keys, cfg.sizes, cfg.sizes[1:])):
        w = kaiming_uniform(k, (dout, din), dtype=dtype)
        if i == len(cfg.sizes) - 2:
            w = w * cfg.out_scale
        layers.append({"w": w, "b": jnp.zeros((dout,), dtype)})
    return layers


def mlp_apply(params, cfg: MLPConfig, x):
    act = _ACTS[cfg.activation]
    for i, layer in enumerate(params):
        x = x @ layer["w"].T + layer["b"]
        if i < len(params) - 1:
            x = act(x)
    return _ACTS[cfg.final_activation](x)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """Plain layer norm over the last axis (shared by the ODE fields that
    normalise their latent state before basis evaluation)."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


class ResidualHeadConfig(NamedTuple):
    """y + W2 GELU(W1 y): 2 -> bottleneck -> 2 refinement head."""

    dim: int = 2
    bottleneck: int = 32


def residual_head_init(key, cfg: ResidualHeadConfig, dtype=jnp.float32):
    return mlp_init(key, MLPConfig((cfg.dim, cfg.bottleneck, cfg.dim),
                                   activation="gelu"), dtype)


def residual_head_apply(params, cfg: ResidualHeadConfig, y):
    return y + mlp_apply(params, MLPConfig((cfg.dim, cfg.bottleneck, cfg.dim),
                                           activation="gelu"), y)
