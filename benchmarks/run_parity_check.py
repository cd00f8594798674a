"""Accuracy-parity anchor: fetode_tpu vs the torch reference AT THE SAME
EPOCH COUNTS.

The torch loop (benchmarks/reference_cpu.py, the faithful re-creation of
train_kanfet_node_predprey.py) was run for 200 epochs on this machine's
CPU with its per-epoch train MSE and periodic extrapolation test MSE
recorded in benchmarks/reference_curve.jsonl. This script trains
fetode_tpu under the identical protocol (same task, model size, solver
tolerances, optimiser, bare Adam 2e-3 — stability extras disabled) and
writes the side-by-side curve to benchmarks/parity_epoch200.json.

Usage: python benchmarks/run_parity_check.py
"""

from __future__ import annotations

import json
import os

from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey


def main():
    here = os.path.dirname(__file__)
    # Reference protocol exactly: bare Adam 2e-3, no clip/decay (the torch
    # loop has neither), eval per 10 epochs.
    run = PredPreyRun(epochs=200, epochs_per_call=10, grad_clip=0.0,
                      cosine_decay=False)
    params, hist = train_predprey(run, log=None)

    torch_curve = []
    curve_path = os.path.join(here, "reference_curve.jsonl")
    if os.path.exists(curve_path):
        with open(curve_path) as fh:
            torch_curve = [json.loads(l) for l in fh if l.strip()]

    torch_by_epoch = {r["epoch"]: r for r in torch_curve}
    rows = []
    for i, ep in enumerate(hist["epoch"]):
        row = {"epoch": ep,
               "fetode_train_mse": hist["train"][i],
               "fetode_test_mse_extrap": hist["test"][i]}
        if ep in torch_by_epoch:
            row["torch_train_mse"] = torch_by_epoch[ep]["train_mse"]
            if "test_mse_extrap" in torch_by_epoch[ep]:
                row["torch_test_mse_extrap"] = torch_by_epoch[ep]["test_mse_extrap"]
        rows.append(row)

    out = {
        "protocol": "KANFET[2,10,2] grid5, dopri5 rtol1e-7 atol1e-9, bare "
                    "Adam 2e-3, 35-pt window fit, extrap test on pts 35..140",
        "fetode_wall_seconds_200_epochs": hist["wall_seconds"],
        "torch_sec_per_epoch": 26.37,
        "curve": rows,
    }
    with open(os.path.join(here, "parity_epoch200.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: out[k] for k in ("fetode_wall_seconds_200_epochs",)}))
    for r in rows[::4]:
        print(r)


if __name__ == "__main__":
    main()
