"""Weight initialisers.

`kaiming_uniform` follows the fan-in leaky-ReLU convention the reference's
layers rely on for their init scale (``nn.init.kaiming_uniform_`` with
``a = sqrt(5) * scale`` — ``efficientkan.py:92-115``): gain =
sqrt(2 / (1 + a^2)), bound = sqrt(3) * gain / sqrt(fan_in).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, a: float = math.sqrt(5), fan_in: int | None = None,
                    dtype=jnp.float32) -> jax.Array:
    if fan_in is None:
        fan_in = shape[-1] if len(shape) >= 2 else shape[0]
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform(key, shape, lo: float, hi: float, dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, shape, dtype, lo, hi)
