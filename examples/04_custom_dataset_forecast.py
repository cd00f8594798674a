"""Your own time series through the forecast driver.

The ETT/Time-MMD trainers are thin presets over one generic surface:
`train_point_forecaster(spec, X, y, run)` takes any numeric feature
matrix X (n, F) and target series y (n,) — chronological split,
train-only standardisation, dense sliding windows, jitted epoch, best-
val snapshot, and test MSE all come from the driver.  This example
feeds a CSV (or a synthetic stand-in when absent) and trains a latent
NODE point forecaster; swap `train_diffusion_forecaster` for the DDPM
variants on the same (X, y).

Run:  python examples/04_custom_dataset_forecast.py [my_data.csv]
      (CSV: numeric columns; last column is the forecast target)
"""

import sys

import numpy as np

from fetode_tpu.models.forecasting import LatentODEForecasterSpec
from fetode_tpu.train.forecast_driver import (ForecastRun,
                                              train_point_forecaster)

if len(sys.argv) > 1:
    import pandas as pd

    df = pd.read_csv(sys.argv[1]).select_dtypes("number")
    X = df.to_numpy(np.float32)
    y = X[:, -1]
else:
    print("no CSV given; synthesising a 3-feature series")
    t = np.arange(600, dtype=np.float32)
    rng = np.random.default_rng(0)
    X = np.stack([np.sin(2 * np.pi * t / p) + 0.05 * rng.standard_normal(
        len(t)) for p in (24.0, 48.0, 96.0)], axis=1).astype(np.float32)
    y = X @ np.asarray([0.5, 0.3, 0.2], np.float32)

run = ForecastRun(context_len=24, pred_len=4, batch_size=32, epochs=5,
                  lr=1e-3, log_every=1)
spec = LatentODEForecasterSpec(num_features=X.shape[1],
                               context_len=run.context_len,
                               pred_len=run.pred_len, latent_dim=16)
params, hist = train_point_forecaster(spec, X, y, run)
print(f"best-val test MSE (standardised): {hist['test_mse']:.4f}")
print(f"final de-standardised forecast:   {hist['final_forecast']}")
assert np.isfinite(hist["test_mse"])
