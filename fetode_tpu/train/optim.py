"""Optimiser construction with non-trainable-buffer masking.

The reference trains with Adam/AdamW + grad-clip 1.0 throughout
(e.g. ``train_kanfet_node_predprey.py:171``, ``train_kan_fet_ett.py:300``);
we build the same from optax and mask out ``_buffers`` leaves (knot grids)
by convention.
"""

from __future__ import annotations

import optax

from fetode_tpu.utils.trees import trainable_mask


def make_optimizer(
    lr,
    *,
    kind: str = "adam",
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
    params=None,
):
    """``lr`` may be a float or an optax schedule (e.g.
    ``train.tools.cosine_schedule`` — the CosineAnnealing the reference's
    ECG scripts use)."""
    if kind == "adam":
        core = optax.adam(lr)
    elif kind == "adamw":
        core = optax.adamw(lr, weight_decay=weight_decay)
    elif kind == "sgd":
        core = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimiser {kind!r}")

    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(core)
    tx = optax.chain(*chain)

    if params is not None:
        tx = optax.masked(tx, trainable_mask(params))
    return tx
