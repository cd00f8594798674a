"""Shared epoch batching: shuffled, stacked (n_batches, B, ...) arrays.

One implementation behind every driver's minibatch epoch (previously
triplicated across the ECG / forecast / conditional-diffusion drivers).
Uses the native shuffle when built; short last batches are padded by
wrap-around (classic drop_last=False semantics) or dropped.
"""

from __future__ import annotations

import numpy as np


def epoch_batches(*arrays, batch_size: int, seed: int = 0,
                  drop_last: bool = True):
    """Shuffle consistently and stack each array into (n_batches, B, ...).

    ``batch_size`` is clamped to the dataset size (short splits train on one
    smaller batch instead of crashing).  Returns a tuple aligned with
    ``arrays``.
    """
    from fetode_tpu.data import native

    n = len(arrays[0])
    batch_size = min(batch_size, n)
    idx = native.shuffled_indices(n, seed)
    nb = n // batch_size if drop_last else -(-n // batch_size)
    nb = max(nb, 1)

    out = []
    for a in arrays:
        batches = []
        for i in range(nb):
            sel = idx[i * batch_size:(i + 1) * batch_size]
            if len(sel) < batch_size:          # wrap-around pad
                sel = np.concatenate([sel, idx[: batch_size - len(sel)]])
            batches.append(a[sel])
        out.append(np.stack(batches))
    return tuple(out)
