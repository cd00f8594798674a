"""Diagnose the stage-2 extrapolation floor: train the two-stage flagship
(pallas adjoint), then decompose the final model's test error:
per-point error curve vs truth, periodic-return error at k=1..4, and
self-periodicity of the learned orbit."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fetode_tpu.models.predprey import PredPreyNODE, generate_data, predict  # noqa: E402
from fetode_tpu.train.predprey_driver import (  # noqa: E402
    PredPreyRun,
    _estimate_period,
    train_predprey,
)


def main():
    spec = PredPreyNODE.kanfet(max_steps=256)._replace(solver_mode="pallas")
    run1 = PredPreyRun(epochs=10_000, spec=spec)
    p1, h1 = train_predprey(run1, log=None)
    run2 = PredPreyRun(epochs=5_000, lr=5e-4, spec=spec,
                       phase_anchor_periods=2, init_params=p1)
    p2, h2 = train_predprey(run2, log=None)

    task = run2.task
    ts, ts_learn, truth = generate_data(task)
    x0 = jnp.asarray([task.x0, task.y0])
    ev = spec._replace(max_steps=4 * spec.max_steps, solver_mode="while")
    T = _estimate_period(task, jnp.float32)

    pred = predict(p2, ev, x0, ts)
    err = np.asarray(jnp.sum((pred - truth) ** 2, axis=1))
    n = task.n_train
    out = {
        "final_train": h2["train"][-1],
        "final_test_extrap": float(err[n:].mean()),
        "err_by_cycle": {},
        "periodic_return_mse": {},
        "self_periodicity_mse": {},
        "T_hat": float(T),
    }
    # error grouped by cycle index
    tgrid = np.asarray(ts)
    for k in range(1, 5):
        m = (tgrid > k * T) & (tgrid <= min((k + 1) * T, 14.0)) & (tgrid > 3.5)
        if m.any():
            out["err_by_cycle"][str(k)] = float(err[m].mean())
    # periodic return: solve out to ts_learn + k*T, compare to window
    target = truth[:n]
    for k in range(1, 5):
        grid = jnp.concatenate([jnp.zeros((1,)), ts_learn + k * T])
        pk = predict(p2, ev._replace(max_steps=16 * spec.max_steps), x0, grid)
        out["periodic_return_mse"][str(k)] = float(
            jnp.mean((pk[1:] - target) ** 2))
    # self-periodicity: pred at t vs pred at t+T on the dense grid
    dense = jnp.linspace(0.0, 14.0, 561)
    pd = predict(p2, ev._replace(max_steps=16 * spec.max_steps), x0, dense)
    pdn = np.asarray(pd)
    shift = int(round(float(T) / (14.0 / 560)))
    self_err = ((pdn[shift:] - pdn[:-shift]) ** 2).sum(axis=1)
    out["self_periodicity_mse"]["mean"] = float(self_err.mean())
    # phase-lag estimate per test point: distance to truth at shifted time
    # (crude: best matching time offset on a local window)
    print(json.dumps(out, indent=1))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "predprey_extrap_diag.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    # per-point error curve (test range) for eyeballing
    print("err curve (t, err):",
          [(round(float(t), 2), round(float(e), 4))
           for t, e in zip(tgrid[n::5], err[n::5])])


if __name__ == "__main__":
    main()
