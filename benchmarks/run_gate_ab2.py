"""Warm-AOT gate_impl A/B on the ECG ferro model (order-sensitive).

Run twice with the variant order flipped: the sign flips with the order,
i.e. the latency-bound model path does not respond to the gate form
(BASELINE.md ferro model-level transfer row).
"""
import dataclasses, json, sys, time
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from fetode_tpu.data.ecg200 import load_ecg200
from fetode_tpu.models import ecg as M
from fetode_tpu.serve import config_hash
from fetode_tpu.train.ecg_driver import ECGRun, train_ecg_model

data = load_ecg200()
T = data[0].shape[1]
res = {}
for gi in ("tanh", "sigmoid"):
    spec = M.KanFetMLPNODESpec(T=T, gate_impl=gi, solver_mode="scan")
    run = ECGRun(epochs=20, batch_size=8, epochs_per_call=10, log_every=1000,
                 aot_cache="/root/repo/runs/aot_cache",
                 aot_tag=config_hash(spec, "gate_ab", 20, 10))
    init_fn = lambda k, s=spec: M.kanfet_mlp_node_init(k, s)
    apply_fn = lambda p, x, key, s=spec: M.kanfet_mlp_node_apply(p, s, x)
    walls = []
    for w in range(4):                 # call 0 compiles+stores; 1+ cache-hit
        t0 = time.perf_counter()
        _, h = train_ecg_model(init_fn, apply_fn, data, run, log=None)
        walls.append(20 / (time.perf_counter() - t0))
    res[gi] = {"warm_windows_ep_per_s": walls[1:],
               "median": float(np.median(walls[1:]))}
print(json.dumps(res, indent=1))
