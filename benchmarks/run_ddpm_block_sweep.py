"""DDPM folded-sampler lane-block sweep: bb = 128 vs 256 vs 512.

The feature-major whole-chain kernel (``ops/pallas_ddpm.py:
_make_kernel_fm``) runs the T=200-step reverse chain once per batch
block; round 3 capped blocks at 128 lanes.  Wider blocks amortise the
serial step loop over wider MXU matmuls at the cost of a larger
double-buffered (T*P, bb) VMEM noise block (guarded in
``pallas_eps_head_sample``).  This script measures the folded
10-sample eval (the production path, ``kan_diffusion_ett.py:1133``) at
the bench shapes and at B=1024, and writes
``benchmarks/ddpm_block_sweep_tpu.json``.

Usage: python benchmarks/run_ddpm_block_sweep.py [n_windows]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.models.forecasting import (DiffusionForecasterSpec,
                                           diffusion_forecaster_init,
                                           diffusion_forecaster_sample)
from fetode_tpu.nn.diffusion import make_schedule


def _windows(fn, n=5):
    vals = [fn() for _ in range(n)]
    return {"median": float(np.median(vals)), "min": float(min(vals)),
            "max": float(max(vals)), "windows": vals}


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spec = DiffusionForecasterSpec(num_features=7, context_len=96,
                                   pred_len=24, diff_T=200)
    sched = make_schedule(spec.diff_T)
    key = jax.random.PRNGKey(0)
    params = diffusion_forecaster_init(key, spec)

    out = {"cases": []}
    ref_out = {}
    for B, n_samples in ((64, 10), (1024, 1), (1024, 10)):
        x_ctx = jax.random.normal(key, (B, spec.context_len,
                                        spec.num_features))
        for block_b in (128, 256, 512):
            @functools.partial(jax.jit, static_argnames=())
            def sample(p, xc, k, _bb=block_b, _ns=n_samples):
                return diffusion_forecaster_sample(
                    p, spec, sched, xc, k, sampler="pallas",
                    n_samples=_ns, sampler_kwargs={"block_b": _bb})

            try:
                for i in range(5):
                    y = sample(params, x_ctx, jax.random.fold_in(key, i))
                    jax.block_until_ready(y)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                out["cases"].append({"B": B, "n_samples": n_samples,
                                     "block_b": block_b,
                                     "error": repr(exc)[:400]})
                continue

            # Same draw across block sizes -> outputs must agree closely
            # (identical math, different fp reduction tiling only).
            yref = np.asarray(sample(params, x_ctx, jax.random.fold_in(
                key, 999)))
            rk = (B, n_samples)
            dev = (float(np.abs(yref - ref_out[rk]).max())
                   if rk in ref_out else 0.0)
            ref_out.setdefault(rk, yref)

            n_rep = max(2, 2048 // (B * n_samples)) * 2

            def window(_s=sample, _x=x_ctx, _n=n_rep, _B=B, _ns=n_samples):
                t0 = time.perf_counter()
                for i in range(_n):
                    y = _s(params, _x, jax.random.fold_in(key, i))
                jax.block_until_ready(y)
                return _n * _ns * _B / (time.perf_counter() - t0)

            stats = _windows(window, n_windows)
            out["cases"].append({"B": B, "n_samples": n_samples,
                                 "block_b": block_b,
                                 "samples_per_sec": stats,
                                 "max_dev_vs_bb128": dev})
            print(json.dumps(out["cases"][-1]), flush=True)

    path = os.path.join(os.path.dirname(__file__),
                        "ddpm_block_sweep_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
