"""Measure the mlp-field KanFetNODE whole-solve adjoint kernel
(ops/pallas_mlp_node.py) against the checkpointed-scan XLA path on the
real TPU chip, using bench.py's ECG training protocol (full ECG200-sized
epochs, batch 8, 10-epoch blocks per dispatch).

Writes benchmarks/ecg_mlp_kernel_tpu.json.  Run on a machine with a live
TPU; results are recorded in BASELINE.md alongside the 'plain'-field row
(490 epochs/s pallas vs 159 scan).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    disarm = bench._device_init_watchdog(
        float(os.environ.get("BENCH_DEVICE_TIMEOUT", "300")))
    import jax

    jax.devices()
    disarm()

    out = {}
    for mode in ("pallas", "scan"):
        eps = bench.bench_ecg_logistic(solver_mode=mode, field="mlp")
        out[f"mlp_{mode}_epochs_per_sec"] = round(eps, 2)
        print(f"mlp {mode}: {eps:.2f} epochs/s", flush=True)
    out["speedup"] = round(out["mlp_pallas_epochs_per_sec"]
                           / out["mlp_scan_epochs_per_sec"], 2)
    path = os.path.join(os.path.dirname(__file__),
                        "ecg_mlp_kernel_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
