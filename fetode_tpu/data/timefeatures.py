"""Calendar time features for forecasting conditioning.

Capability parity with ``data/utils/timefeatures.py`` of the reference
(8 TimeFeature classes + the two timeenc modes used by the Informer-style
datasets): timeenc=0 emits raw calendar integers per frequency; timeenc=1
emits [-0.5, 0.5]-scaled features from the frequency string.  Implemented
as plain functions over a DatetimeIndex — no class hierarchy needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SCALED = {
    "second": lambda ix: ix.second / 59.0 - 0.5,
    "minute": lambda ix: ix.minute / 59.0 - 0.5,
    "hour": lambda ix: ix.hour / 23.0 - 0.5,
    "dayofweek": lambda ix: ix.dayofweek / 6.0 - 0.5,
    "day": lambda ix: (ix.day - 1) / 30.0 - 0.5,
    "dayofyear": lambda ix: (ix.dayofyear - 1) / 365.0 - 0.5,
    "month": lambda ix: (ix.month - 1) / 11.0 - 0.5,
    "weekofyear": lambda ix: (pd.Index(ix.isocalendar().week).astype(int) - 1)
    / 52.0 - 0.5,
}

# features per frequency granularity (coarse -> fine), matching the
# reference's freq map
_FREQ_FEATURES = {
    "y": [],
    "m": ["month"],
    "w": ["day", "weekofyear"],
    "d": ["dayofweek", "day", "dayofyear"],
    "b": ["dayofweek", "day", "dayofyear"],
    "h": ["hour", "dayofweek", "day", "dayofyear"],
    "t": ["minute", "hour", "dayofweek", "day", "dayofyear"],
    "s": ["second", "minute", "hour", "dayofweek", "day", "dayofyear"],
}

_RAW_BY_FREQ = {
    "h": ["month", "day", "weekday", "hour"],
    "t": ["month", "day", "weekday", "hour", "minute15"],
}


def time_features(dates, timeenc: int = 0, freq: str = "h") -> np.ndarray:
    """dates: DataFrame with a 'date' column, or a DatetimeIndex.

    Returns (N, F) float features.
    """
    if isinstance(dates, pd.DataFrame):
        index = pd.DatetimeIndex(pd.to_datetime(dates["date"].values))
    else:
        index = pd.DatetimeIndex(dates)

    key = freq.lower()[-1] if freq else "h"
    if timeenc == 0:
        cols = _RAW_BY_FREQ.get(key, _RAW_BY_FREQ["h"])
        out = []
        for c in cols:
            if c == "month":
                out.append(index.month)
            elif c == "day":
                out.append(index.day)
            elif c == "weekday":
                out.append(index.weekday)
            elif c == "hour":
                out.append(index.hour)
            elif c == "minute15":
                out.append(index.minute // 15)
        return np.stack([np.asarray(o, np.float32) for o in out], axis=1)

    feats = _FREQ_FEATURES.get(key, _FREQ_FEATURES["h"])
    return np.stack([np.asarray(_SCALED[f](index), np.float32) for f in feats],
                    axis=1)
