"""Informer-style forecasting datasets (ETT hour/minute, custom, predict).

Capability parity with ``data/data_loader.py`` of the reference:
* ``Dataset_ETT_hour`` (:15-99): fixed month borders 12/4/4 x 24,
  train-fit scaling, (seq_x, seq_y = label+pred overlap, time marks);
* ``Dataset_ETT_minute`` (:101-185): same x4 (15-min sampling);
* ``Dataset_Custom`` (:188-285): 70/10/20 ratio splits;
* ``Dataset_Pred`` (:287-379): inference window at the series tail.

TPU-native: instead of per-item ``__getitem__``, each split materialises
dense window arrays once (numpy fancy indexing) ready for scan epochs.
Attention masks of the reference's vendored kit (``data/utils/masking.py``)
live in ``fetode_tpu/data/masking.py`` (dead code in the reference — no
attention model — but part of its shipped inventory; reproduced as pure
iota-comparison mask functions).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from fetode_tpu.data.paths import locate
from fetode_tpu.data.timefeatures import time_features
from fetode_tpu.data.timeseries import standardize_fit


class WindowSplit(NamedTuple):
    """Dense window arrays for one split."""

    seq_x: np.ndarray        # (M, seq_len, F)
    seq_y: np.ndarray        # (M, label_len + pred_len, Fy)
    seq_x_mark: np.ndarray   # (M, seq_len, T)
    seq_y_mark: np.ndarray   # (M, label_len + pred_len, T)


_ETT_HOUR_BORDERS = ([0, 12 * 30 * 24, 12 * 30 * 24 + 4 * 30 * 24],
                     [12 * 30 * 24, 12 * 30 * 24 + 4 * 30 * 24,
                      12 * 30 * 24 + 8 * 30 * 24])
_ETT_MIN_BORDERS = ([0, 12 * 30 * 24 * 4, (12 * 30 * 24 + 4 * 30 * 24) * 4],
                    [12 * 30 * 24 * 4, (12 * 30 * 24 + 4 * 30 * 24) * 4,
                     (12 * 30 * 24 + 8 * 30 * 24) * 4])


def _windows(data_x, data_y, marks, seq_len, label_len, pred_len):
    m = len(data_x) - seq_len - pred_len + 1
    if m <= 0:
        raise ValueError("split shorter than seq_len + pred_len")
    s = np.arange(m)[:, None]
    xi = s + np.arange(seq_len)[None, :]
    yi = s + seq_len - label_len + np.arange(label_len + pred_len)[None, :]
    return WindowSplit(
        seq_x=data_x[xi].astype(np.float32),
        seq_y=data_y[yi].astype(np.float32),
        seq_x_mark=marks[xi].astype(np.float32),
        seq_y_mark=marks[yi].astype(np.float32),
    )


def _select_features(df, features: str, target: str):
    if features in ("M", "MS"):
        return df[df.columns[1:]]
    return df[[target]]


def _load_df(data_path: str, root_path: Optional[str]):
    import pandas as pd

    path = None
    if root_path is not None:
        import os
        path = os.path.join(root_path, data_path)
        if not os.path.exists(path):
            path = None
    if path is None:
        path = locate(data_path)
    if path is None:
        raise FileNotFoundError(f"{data_path} not found; set FETODE_DATA_DIR")
    return pd.read_csv(path)


def _build(df_raw, borders, flag, seq_len, label_len, pred_len, features,
           target, scale, timeenc, freq):
    import pandas as pd

    type_map = {"train": 0, "val": 1, "test": 2}
    i = type_map[flag]
    b1s = [borders[0][0], borders[0][1] - seq_len, borders[0][2] - seq_len]
    b2s = borders[1]
    b1, b2 = b1s[i], b2s[i]

    df_data = _select_features(df_raw, features, target)
    if scale:
        scaler = standardize_fit(df_data.values[b1s[0]:b2s[0]].astype(np.float32))
        data = scaler.apply(df_data.values.astype(np.float32))
    else:
        scaler = None
        data = df_data.values.astype(np.float32)

    stamp = df_raw[["date"]][b1:b2].copy()
    stamp["date"] = pd.to_datetime(stamp["date"])
    marks = time_features(stamp, timeenc=timeenc, freq=freq)

    win = _windows(data[b1:b2], data[b1:b2], marks, seq_len, label_len,
                   pred_len)
    return win, scaler


def dataset_ett_hour(flag="train", size=None, features="S",
                     data_path="ETT/ETTh1.csv", target="OT", scale=True,
                     timeenc=0, freq="h", root_path=None):
    seq_len, label_len, pred_len = size or (24 * 4 * 4, 24 * 4, 24 * 4)
    df = _load_df(data_path, root_path)
    return _build(df, _ETT_HOUR_BORDERS, flag, seq_len, label_len, pred_len,
                  features, target, scale, timeenc, freq)


def dataset_ett_minute(flag="train", size=None, features="S",
                       data_path="ETT/ETTm1.csv", target="OT", scale=True,
                       timeenc=0, freq="t", root_path=None):
    seq_len, label_len, pred_len = size or (24 * 4 * 4, 24 * 4, 24 * 4)
    df = _load_df(data_path, root_path)
    return _build(df, _ETT_MIN_BORDERS, flag, seq_len, label_len, pred_len,
                  features, target, scale, timeenc, freq)


def dataset_custom(flag="train", size=None, features="S", data_path=None,
                   target="OT", scale=True, timeenc=0, freq="h",
                   root_path=None, df_raw=None,
                   ratios=(0.7, 0.1)):
    """70/10/20 chronological ratio split over an arbitrary csv/frame."""
    seq_len, label_len, pred_len = size or (24 * 4 * 4, 24 * 4, 24 * 4)
    if df_raw is None:
        df = _load_df(data_path, root_path)
    else:
        df = df_raw
    n = len(df)
    n_train = int(n * ratios[0])
    n_val = int(n * ratios[1])
    borders = ([0, n_train, n_train + n_val],
               [n_train, n_train + n_val, n])
    return _build(df, borders, flag, seq_len, label_len, pred_len, features,
                  target, scale, timeenc, freq)


def dataset_pred(size=None, features="S", data_path="ETT/ETTh1.csv",
                 target="OT", scale=True, timeenc=0, freq="h",
                 root_path=None, df_raw=None):
    """Single inference window at the tail of the series (Dataset_Pred):
    returns (seq_x (1, L, F), seq_x_mark, future marks for pred_len)."""
    import pandas as pd

    seq_len, label_len, pred_len = size or (24 * 4 * 4, 24 * 4, 24 * 4)
    df = df_raw if df_raw is not None else _load_df(data_path, root_path)
    df_data = _select_features(df, features, target)
    data = df_data.values.astype(np.float32)
    scaler = None
    if scale:
        scaler = standardize_fit(data)
        data = scaler.apply(data)

    stamp = df[["date"]].copy()
    stamp["date"] = pd.to_datetime(stamp["date"])
    last = stamp["date"].iloc[-1]
    future = pd.date_range(last, periods=pred_len + 1,
                           freq=freq.lower() if freq != "t" else "15min")[1:]
    all_dates = pd.DatetimeIndex(list(stamp["date"].iloc[-seq_len:]) +
                                 list(future))
    marks = time_features(all_dates, timeenc=timeenc, freq=freq)

    seq_x = data[-seq_len:][None]
    seq_x_mark = marks[:seq_len][None]
    seq_y_mark = marks[seq_len - label_len:][None]
    return seq_x, seq_x_mark, seq_y_mark, scaler
