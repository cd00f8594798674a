"""Model-free measurement of the flagship extrapolation floor's root
cause: the reference's fit-window time-base mismatch.

The reference samples its ground truth on t = linspace(0, tf, N_t)
(spacing 14/139 = 0.10072) and takes the first 35 samples as train
targets (soln_arr_train = soln_arr[:35] — sampled at times up to
3.4245), but hands the solver t_learn = linspace(0, 3.5, 35) (spacing
0.10294): train_kanfet_node_predprey.py:50,153,155.  Training therefore
teaches a 2.24%-slow clock, and the extrapolation test (true time base)
has a hard floor no amount of fitting can cross — every anchored /
regularized / densified configuration in
benchmarks/predprey_flagship_ablation.json plateaued at ~0.037.

This script measures that floor WITHOUT any model: it builds the
spline-densified anchor targets exactly as the driver does (log-space
cubic spline of the 35 window samples, times shifted by j periods) and
scores them against a tight (rtol 1e-12) solve of the true system at
those times, under both time bases.

Measured (this machine, float64):

    reference  window 1..3: 3.69e-2, 3.64e-2, 3.59e-2   <- the floor
    consistent window 1..3: 1.90e-6, 7.53e-6, 1.69e-5   <- period-est err

Writes benchmarks/time_base_probe.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline

from fetode_tpu.models.predprey import (
    PredPreyTask,
    generate_data,
    lotka_volterra_field,
)
from fetode_tpu.solvers import odeint_dopri5
from fetode_tpu.train.predprey_driver import _estimate_period


def main():
    task = PredPreyTask()
    ts, ts_learn, truth = generate_data(task, jnp.float64)
    t_all = np.asarray(ts, np.float64)
    tgt = np.asarray(truth[: task.n_train], np.float64)
    f = lotka_volterra_field(task)
    y0 = jnp.asarray([task.x0, task.y0], jnp.float64)
    T = _estimate_period(task, jnp.float64)

    out = {"t_period_est": float(T)}
    for base, t_fit in (("reference", np.asarray(ts_learn, np.float64)),
                        ("consistent", t_all[: task.n_train])):
        cs = CubicSpline(t_fit, np.log(tgt), axis=0)
        n_dense = (t_fit.shape[0] - 1) * 4 + 1
        t_dense = np.linspace(t_fit[0], t_fit[-1], n_dense)
        tg_dense = np.exp(cs(t_dense))
        row = {}
        for j in (1, 2, 3):
            t_solve = jnp.asarray(np.concatenate([[0.0], t_dense + j * T]))
            sol = np.asarray(odeint_dopri5(
                f, y0, t_solve, rtol=1e-12, atol=1e-14,
                max_steps=65536, mode="while"))[1:]
            row[str(j)] = float(np.mean((tg_dense - sol) ** 2))
        out[base] = row
    print(json.dumps(out, indent=1))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "time_base_probe.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
