"""Attention-mask kit (parity with ``data/utils/masking.py`` of the
reference — ``TriangularCausalMask`` :3-10 and ``ProbMask`` :13-24 of the
vendored Informer data kit).

The reference never uses these (no attention model exists in either
repo), but they are part of its shipped component inventory; here they
are pure functions returning boolean arrays (True = masked position,
matching the reference convention of ``triu(ones, diagonal=1)``), usable
directly under ``jit`` with ``jnp.where(mask, -inf, scores)``.

TPU notes: masks are built with ``broadcasted_iota`` comparisons rather
than materialised ``triu`` matrices — XLA fuses the comparison into the
consumer, so an (L, L) causal mask never touches HBM on its own.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def causal_mask(B: int, L: int, dtype=jnp.bool_):
    """(B, 1, L, L) strict upper-triangular mask: position (q, k) is True
    (disallowed) when k > q.  Reference: TriangularCausalMask
    (masking.py:3-10)."""
    q = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    k = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return jnp.broadcast_to((k > q).astype(dtype), (B, 1, L, L))


def prob_mask(index, scores, L: int):
    """ProbSparse-attention mask (reference ProbMask, masking.py:13-24).

    ``index`` (B, H, n_top) holds each head's selected query rows;
    ``scores`` is (B, H, n_top, L_k).  Returns a boolean mask of
    ``scores.shape`` that is the causal (strict upper-triangular, L x L_k)
    row of each selected query — True where the key position lies in that
    query's future.
    """
    B, H, n_top, L_k = scores.shape
    # row q of the (L, L_k) strict-upper-triangular matrix, gathered at
    # the selected query indices: mask[b,h,i,k] = k > index[b,h,i]
    k = lax.broadcasted_iota(jnp.int32, (B, H, n_top, L_k), 3)
    del L  # shape bookkeeping only: rows are generated, not gathered
    return k > index[..., None].astype(jnp.int32)


def apply_mask(scores, mask, fill=-jnp.inf):
    """scores with masked positions filled (the reference's downstream
    ``masked_fill_`` usage pattern in Informer)."""
    return jnp.where(mask, jnp.asarray(fill, scores.dtype), scores)
