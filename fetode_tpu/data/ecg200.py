"""ECG200 time-series classification data.

Capability parity with ``ECG200Dataset`` / ``load_ecg200`` /
``_encode_labels_consistently`` (``/root/reference/train_ecg.py:26-68``,
cloned in the other ECG scripts): whitespace rows with the class label in
column 0, labels remapped consistently to ``0..C-1`` across splits, each
96-point series z-normalised per row.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from fetode_tpu.data.paths import locate


def _parse(path: str) -> Tuple[np.ndarray, np.ndarray]:
    raw = np.loadtxt(path)
    labels = raw[:, 0]
    series = raw[:, 1:].astype(np.float32)
    return series, labels


def _znorm_rows(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    from fetode_tpu.data import native

    return native.znorm_rows(x, eps)  # C++ when built, numpy fallback inside


def load_ecg200(train_path: str | None = None, test_path: str | None = None,
                normalize: bool = True):
    """Returns ``(x_train, y_train, x_test, y_test)`` as numpy arrays,
    labels encoded 0..C-1 consistently across both splits."""
    train_path = train_path or locate("ECG200_TRAIN.txt")
    test_path = test_path or locate("ECG200_TEST.txt")
    if train_path is None or test_path is None:
        raise FileNotFoundError(
            "ECG200 files not found; set FETODE_DATA_DIR or pass paths "
            "(tests can use synthetic_ecg200)")
    xtr, ltr = _parse(train_path)
    xte, lte = _parse(test_path)

    classes = np.unique(np.concatenate([ltr, lte]))
    remap = {c: i for i, c in enumerate(classes)}
    ytr = np.asarray([remap[c] for c in ltr], np.int32)
    yte = np.asarray([remap[c] for c in lte], np.int32)

    if normalize:
        xtr, xte = _znorm_rows(xtr), _znorm_rows(xte)
    return xtr, ytr, xte, yte


def synthetic_ecg200(seed: int = 0, n_train: int = 64, n_test: int = 32,
                     T: int = 96):
    """Deterministic stand-in with the same shapes/label contract: class 0 =
    smooth beat (gaussian bump), class 1 = beat with a sharp notch."""
    rng = np.random.default_rng(seed)

    def make(n):
        t = np.linspace(0, 1, T)
        y = (np.arange(n) % 2).astype(np.int32)   # balanced classes
        rng.shuffle(y)
        bump = np.exp(-((t - 0.4) ** 2) / 0.01)
        notch = -1.5 * np.exp(-((t - 0.6) ** 2) / 0.005)
        x = bump[None, :] + y[:, None] * notch[None, :]
        x = x + rng.normal(0, 0.1, (n, T))
        return _znorm_rows(x.astype(np.float32)), y

    xtr, ytr = make(n_train)
    xte, yte = make(n_test)
    return xtr, ytr, xte, yte


def batch_iterator(x, y, batch_size: int, *, seed: int = 0, drop_last: bool = True):
    """Pre-shuffled full-epoch batch tensor: (n_batches, B, ...) arrays ready
    for a `lax.scan` minibatch epoch (no Python-side DataLoader workers)."""
    from fetode_tpu.data.batching import epoch_batches

    return epoch_batches(x, y, batch_size=batch_size, seed=seed,
                         drop_last=drop_last)
