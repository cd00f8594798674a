"""Time-series loading, scaling, splitting and windowing.

Capability parity:
* ``load_ett_csv`` (``/root/reference/train_kan_fet_ett.py:85-102``),
  ``load_energy_csv`` (``train_kan_fet_mmd.py:250-270``),
  ``load_climate_csv`` (``train_kan_fet_mmd_climate.py:253-302``);
* ``standardize_fit/apply`` (``train_kan_fet_ett.py:36-41``);
* ``split_time_series`` + ``EnergyWindowDataset``
  (``train_kan_fet_ett.py:107-131,270-300``).

TPU-native: windows materialise as dense stacked arrays once on the host
(numpy strides), then the whole epoch streams through jitted scans — no
per-item Dataset/DataLoader machinery.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from fetode_tpu.data.paths import locate


class Standardizer(NamedTuple):
    mu: np.ndarray
    sd: np.ndarray

    def apply(self, x):
        return (x - self.mu) / self.sd

    def invert(self, x):
        return x * self.sd + self.mu


def standardize_fit(x: np.ndarray, eps: float = 1e-8) -> Standardizer:
    """Train-split-only statistics (leakage-safe)."""
    return Standardizer(mu=x.mean(0, keepdims=True),
                        sd=x.std(0, keepdims=True) + eps)


def load_ett_csv(csv_path: Optional[str] = None, target_col: str = "OT",
                 name: str = "ETTh1"):
    """ETT csv -> (X (N,F) numeric features incl. target, y (N,) target)."""
    import pandas as pd

    csv_path = csv_path or locate(f"ETT/{name}.csv")
    if csv_path is None:
        raise FileNotFoundError(f"{name}.csv not found; set FETODE_DATA_DIR")
    df = pd.read_csv(csv_path)
    numeric = df.select_dtypes(include=[np.number])
    if target_col not in numeric.columns:
        raise ValueError(f"target {target_col!r} not numeric; have "
                         f"{list(numeric.columns)}")
    return numeric.values.astype(np.float32), \
        numeric[target_col].values.astype(np.float32), df


def load_timemmd_csv(csv_path: str, target_col: str,
                     date_col: Optional[str] = None,
                     drop_cols: Tuple[str, ...] = (),
                     area_filter: Optional[Tuple[str, str]] = None):
    """Time-MMD numeric csv loader (Energy/Climate).

    Mirrors the Energy loader and the Climate variant's extras (date
    parsing, AreaOfInterest filtering, id-column drops)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    if area_filter is not None:
        col, val = area_filter
        if col in df.columns:
            df = df[df[col] == val].copy()
    if date_col and date_col in df.columns:
        df[date_col] = pd.to_datetime(df[date_col], errors="coerce")
        df = df.sort_values(date_col)
    for c in drop_cols:
        if c in df.columns:
            df = df.drop(columns=c)
    numeric = df.select_dtypes(include=[np.number]).dropna(axis=1, how="all")
    numeric = numeric.ffill().bfill()
    if target_col not in numeric.columns:
        raise ValueError(f"target {target_col!r} not in numeric columns "
                         f"{list(numeric.columns)}")
    return numeric.values.astype(np.float32), \
        numeric[target_col].values.astype(np.float32), df


def split_time_series(n: int, train_frac: float = 0.7, val_frac: float = 0.1):
    """Chronological index splits (train_kan_fet_ett.py:270-285)."""
    n_train = int(n * train_frac)
    n_val = int(n * val_frac)
    return slice(0, n_train), slice(n_train, n_train + n_val), \
        slice(n_train + n_val, n)


def make_windows(X: np.ndarray, y: np.ndarray, context_len: int,
                 pred_len: int):
    """All sliding windows as dense arrays:
    returns x_ctx (M, context_len, F) and y_fut (M, pred_len).

    Window assembly runs in the native C++ runtime when built
    (``fetode_tpu.data.native``; numpy fallback inside)."""
    from fetode_tpu.data import native

    n = len(X)
    m = n - (context_len + pred_len) + 1
    if m <= 0:
        raise ValueError("series shorter than context_len + pred_len")
    starts = np.arange(m, dtype=np.int64)
    x_ctx = native.window_gather(X, starts, context_len)
    y_fut = native.window_gather(y[:, None], starts + context_len,
                                 pred_len)[..., 0]
    return x_ctx, y_fut


def window_batches(x_ctx: np.ndarray, y_fut: np.ndarray, batch_size: int,
                   *, seed: int = 0, drop_last: bool = True):
    """(n_batches, B, ...) stacked shuffled minibatches for a scan epoch."""
    from fetode_tpu.data.batching import epoch_batches

    return epoch_batches(x_ctx, y_fut, batch_size=batch_size, seed=seed,
                         drop_last=drop_last)


def synthetic_series(seed: int = 0, n: int = 400, n_features: int = 4):
    """Deterministic multiscale sinusoid + trend stand-in for ETT/MMD."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32)
    feats = []
    for f in range(n_features):
        period = 24.0 * (f + 1)
        feats.append(np.sin(2 * np.pi * t / period + f)
                     + 0.05 * rng.standard_normal(n))
    X = np.stack(feats, 1).astype(np.float32)
    y = (X.sum(1) + 0.002 * t).astype(np.float32)
    X = np.concatenate([X, y[:, None]], axis=1)
    return X, y
