"""Stage-2 extrapolation-floor probe: is the anchored-loss floor
(~1.2e-3, which sets final extrapolation ~0.037-0.039) optimization-
limited (longer stage 2 fixes it) or capacity-limited (a wider KANFET
fixes it)?  Run:  python benchmarks/run_stage2_probe.py [long] [wide]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from fetode_tpu.models.predprey import PredPreyNODE  # noqa: E402
from fetode_tpu.train.predprey_driver import (  # noqa: E402
    PredPreyRun,
    train_predprey,
)


def probe(tag, spec, epochs2, select_k=3):
    run1 = PredPreyRun(epochs=10_000, spec=spec)
    p1, h1 = train_predprey(run1, log=None)
    run2 = PredPreyRun(epochs=epochs2, lr=5e-4, spec=spec,
                       phase_anchor_periods=2, init_params=p1,
                       select_anchor_k=select_k)
    p2, h2 = train_predprey(run2, log=None)
    out = {
        "tag": tag,
        "epochs2": epochs2,
        "stage1_final_train": h1["train"][-1],
        "stage2_final_train_anchored": h2["train"][-1],
        "final_test_extrap": h2["test"][-1],
        "min_test_extrap_stage2": min(h2["test"]),
        "wall_seconds": h1["wall_seconds"] + h2["wall_seconds"],
        "test_curve": h2["test"][::5],
        "sel_curve": h2.get("sel", [])[::5],
        "train_curve": h2["train"][::5],
    }
    print(tag, json.dumps({k: out[k] for k in
                           ("stage2_final_train_anchored",
                            "final_test_extrap", "min_test_extrap_stage2",
                            "wall_seconds")}), flush=True)
    return out


def main():
    which = sys.argv[1:] or ["long", "wide"]
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "predprey_stage2_probe.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    base = PredPreyNODE.kanfet(max_steps=256)._replace(solver_mode="pallas")
    if "long" in which:
        results["long_stage2_30k"] = probe("long_stage2_30k", base, 30_000)
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)
    if "wide" in which:
        wide = PredPreyNODE.kanfet(layers_hidden=(2, 16, 2),
                                   max_steps=256)._replace(
            solver_mode="pallas")
        results["wide_2_16_2"] = probe("wide_2_16_2", wide, 10_000)
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
