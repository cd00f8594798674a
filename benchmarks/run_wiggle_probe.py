"""Confirm the collocation-overfit ("wiggle") hypothesis.

dense_anchor_diag measured: anchored-grid MSE 0.002 vs offset test-grid
MSE 0.044 with ZERO train/eval solver gap — the trained trajectory
threads its collocation times while deviating in between.  Direct test:
evaluate the stage-1 model INSIDE the fit window on (a) the 35 training
times, (b) a 10x-dense grid offset from them.  A >10x MSE gap confirms
sub-grid wiggle; comparable MSEs refute it.

Writes benchmarks/wiggle_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from fetode_tpu.models.predprey import (
    PredPreyTask,
    generate_data,
    lotka_volterra_field,
    predict,
)
from fetode_tpu.solvers import odeint_dopri5
from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey


def main():
    task = PredPreyTask()
    ts, ts_learn, truth = generate_data(task)
    x0 = jnp.asarray([task.x0, task.y0], jnp.float32)

    run1 = PredPreyRun(epochs=10_000)
    p1, h1 = train_predprey(run1, log=None)

    eval_spec = run1.spec._replace(max_steps=8 * run1.spec.max_steps,
                                   solver_mode="while")

    # (a) at the 35 training times
    pred_w = predict(p1, eval_spec, x0, ts_learn)
    mse_train_times = float(jnp.mean((pred_w - truth[: task.n_train]) ** 2))

    # (b) on a 10x-dense in-window grid (excluding the training times)
    n_dense = (task.n_train - 1) * 10 + 1
    t_dense = jnp.linspace(0.0, task.tf_learn, n_dense)
    dense_truth = odeint_dopri5(lotka_volterra_field(task),
                                jnp.asarray([task.x0, task.y0], jnp.float64),
                                t_dense.astype(jnp.float64), rtol=1e-12,
                                atol=1e-14, max_steps=8192, mode="while")
    pred_d = predict(p1, eval_spec, x0, t_dense.astype(jnp.float32))
    err_d = np.mean((np.asarray(pred_d, np.float64)
                     - np.asarray(dense_truth)) ** 2, axis=1)
    on_grid = np.zeros(n_dense, bool)
    on_grid[::10] = True                         # training times
    out = {
        "stage1_final_train": h1["train"][-1],
        "window_mse_at_train_times": mse_train_times,
        "window_mse_dense_all": float(err_d.mean()),
        "window_mse_dense_off_grid": float(err_d[~on_grid].mean()),
        "window_mse_dense_on_grid": float(err_d[on_grid].mean()),
        "max_offgrid_err": float(err_d[~on_grid].max()),
        "final_test_extrap": h1["test"][-1],
    }
    print(json.dumps(out, indent=1))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "wiggle_probe.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
