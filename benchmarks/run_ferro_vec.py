"""A/B the ferro-NODE whole-solve kernel layouts on the real chip.

"loop" = per-sample fori_loop over (out, in*K) blocks (the original
layout); "vec" = batch-vectorized 3-D (B, out, in*K) blocks (one VPU
chain over all samples, lane-reduction contraction).  Motive: halving
the loop backward's transcendental work did not move its throughput
(BASELINE.md ferro row), pointing at the B-iteration serialization.

Usage: python benchmarks/run_ferro_vec.py
Writes benchmarks/ferro_vec_tpu.json.
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
    for layout in ("vec", "loop"):
        eps = bench.bench_ecg_ferro(solver_mode="pallas",
                                    pallas_layout=layout)
        out[f"ferro_pallas_{layout}_epochs_per_sec"] = round(eps, 2)
        print(f"ferro pallas {layout}: {eps:.2f} epochs/s", flush=True)
    out["scan_epochs_per_sec"] = round(bench.bench_ecg_ferro(), 2)
    print(f"ferro scan: {out['scan_epochs_per_sec']:.2f} epochs/s",
          flush=True)
    out["vec_vs_loop"] = round(out["ferro_pallas_vec_epochs_per_sec"]
                               / out["ferro_pallas_loop_epochs_per_sec"], 2)
    path = os.path.join(os.path.dirname(__file__), "ferro_vec_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
