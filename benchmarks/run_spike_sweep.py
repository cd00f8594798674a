"""Spike-overshoot sweep: the two-stage flagship's residual extrapolation
error (~0.039) lives entirely at sub-sample spike phases the 35-point
window never constrains (benchmarks/predprey_extrap_diag.json).  Test
whether smoothness priors tame the unconstrained overshoot:
KAN regularization on stage 2, live grid refit, denser spline grid.

Usage: python benchmarks/run_spike_sweep.py [cfg ...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fetode_tpu.models.predprey import PredPreyNODE  # noqa: E402
from fetode_tpu.train.predprey_driver import (  # noqa: E402
    PredPreyRun,
    train_predprey,
)


def two_stage(spec, r1kw=None, r2kw=None, epochs1=10_000, epochs2=5_000):
    run1 = PredPreyRun(epochs=epochs1, spec=spec, **(r1kw or {}))
    p1, h1 = train_predprey(run1, log=None)
    run2 = PredPreyRun(epochs=epochs2, lr=5e-4, spec=spec,
                       phase_anchor_periods=2, init_params=p1,
                       **(r2kw or {}))
    p2, h2 = train_predprey(run2, log=None)
    return {
        "stage2_final_train_anchored": h2["train"][-1],
        "final_test_extrap": h2["test"][-1],
        "min_test_extrap_stage2": min(h2["test"]),
        "wall_seconds": h1["wall_seconds"] + h2["wall_seconds"],
    }


def main():
    base = PredPreyNODE.kanfet(max_steps=256)._replace(solver_mode="pallas")
    CONFIGS = {
        # smoothness pressure on the spline/ferro coefficients in stage 2
        "reg2_1e5": (base, None, {"reg_lambda": 1e-5}),
        "reg2_1e4": (base, None, {"reg_lambda": 1e-4}),
        # refit spline grids to the states the trajectory actually visits
        # (resolves the spike region; efficientkan.py:184-221 capability)
        "gridrefit": (base, {"grid_update_every": 20}, None),
        # denser spline grid from the start
        "grid10": (PredPreyNODE.kanfet(grid_size=10, max_steps=256)._replace(
            solver_mode="pallas"), None, None),
    }
    names = sys.argv[1:] or list(CONFIGS)
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "predprey_spike_sweep.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    for name in names:
        spec, r1, r2 = CONFIGS[name]
        results[name] = two_stage(spec, r1, r2)
        print(name, json.dumps(results[name]), flush=True)
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
