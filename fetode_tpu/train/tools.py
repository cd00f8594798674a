"""Training utilities: early stopping, LR schedules, attribute-dict.

Parity with the reference's vendored kit (``data/utils/tools.py:4-76``:
``StandardScaler`` — see ``data.timeseries.Standardizer`` — plus
``EarlyStopping``, ``adjust_learning_rate``, ``dotdict``) and the cosine
annealing used by the ECG scripts (``train_ecg.py:155,395``), expressed
through optax schedules.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import optax


class EarlyStopping:
    """Stop when the validation metric hasn't improved for ``patience``
    epochs; tracks the best value."""

    def __init__(self, patience: int = 7, min_delta: float = 0.0,
                 mode: str = "min"):
        self.patience = patience
        self.min_delta = min_delta
        self.sign = 1.0 if mode == "min" else -1.0
        self.best = np.inf
        self.counter = 0
        self.should_stop = False

    def step(self, metric: float) -> bool:
        """Returns True if this metric is a new best."""
        value = self.sign * float(metric)
        if value < self.best - self.min_delta:
            self.best = value
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.should_stop = True
        return False


def exponential_decay_schedule(lr: float, decay: float = 0.5,
                               every: int = 1):
    """The reference's ``adjust_learning_rate`` type1 policy
    (lr * 0.5^epoch) as an optax schedule over epoch indices."""
    return lambda epoch: lr * (decay ** (epoch // every))


def cosine_schedule(lr: float, total_steps: int, min_scale: float = 0.0):
    """CosineAnnealingLR equivalent."""
    return optax.cosine_decay_schedule(lr, total_steps, alpha=min_scale)


class dotdict(dict):
    """Attribute-style dict (``data/utils/tools.py`` parity)."""

    __getattr__ = dict.get
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__
