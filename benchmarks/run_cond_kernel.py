"""Measure the cond-diffusion node-encoder whole-solve kernel
(ops/pallas_node_enc.py) against the checkpointed-scan XLA path on the
real TPU chip, using bench.py's conditional-diffusion training protocol
(KAN_NODE denoiser at the reference preset — seq 96, pred 24, T=250,
batch 64, kan_diffusion_ett.py:870-906).

Writes benchmarks/cond_kernel_tpu.json.
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
        stats, _ = bench.bench_cond_diffusion(solver_mode=mode)
        out[f"kan_node_{mode}"] = stats
        print(f"kan_node {mode}: {stats}", flush=True)
    out["speedup_median"] = round(out["kan_node_pallas"]["median"]
                                  / out["kan_node_scan"]["median"], 2)
    path = os.path.join(os.path.dirname(__file__), "cond_kernel_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
