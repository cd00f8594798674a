"""Attention masks (vendored-kit parity).

The reference carries ``TriangularCausalMask`` / ``ProbMask``
(``data/utils/masking.py:3-24``) as part of its vendored Informer kit —
dead code there (no attention model exists).  Provided here as jnp
functions for completeness.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangular_causal_mask(B: int, L: int) -> jnp.ndarray:
    """(B, 1, L, L) boolean mask, True above the diagonal (disallowed)."""
    m = jnp.triu(jnp.ones((L, L), bool), k=1)
    return jnp.broadcast_to(m, (B, 1, L, L))


def prob_mask(B: int, H: int, L: int, index, scores) -> jnp.ndarray:
    """ProbSparse attention mask: for each selected query (index), mask
    future keys; returns a boolean mask shaped like ``scores``."""
    full = jnp.triu(jnp.ones((L, scores.shape[-1]), bool), k=1)
    full = jnp.broadcast_to(full, (B, H, L, scores.shape[-1]))
    b_ix = jnp.arange(B)[:, None, None]
    h_ix = jnp.arange(H)[None, :, None]
    return full[b_ix, h_ix, index]
