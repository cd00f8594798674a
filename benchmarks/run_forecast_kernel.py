"""Measure the forecasting latent-ODE whole-solve kernel
(ops/pallas_ode_dyn.py) against the checkpointed-scan XLA path on the
real TPU chip, using bench.py's ETT point-forecaster protocol (context
96, pred 8, latent 64, batch 64, 8 minibatches/epoch — the reference
preset, train_kan_fet_ett.py:1341-1351).

Writes benchmarks/forecast_kernel_tpu.json.  Run on a machine with a
live TPU; results feed the BASELINE.md forecast row.
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
        stats, _ = bench.bench_forecast(solver_mode=mode)
        out[f"point_{mode}"] = stats
        print(f"point {mode}: {stats}", flush=True)
    out["speedup_median"] = round(out["point_pallas"]["median"]
                                  / out["point_scan"]["median"], 2)
    path = os.path.join(os.path.dirname(__file__),
                        "forecast_kernel_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
