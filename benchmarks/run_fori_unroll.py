"""Measure ``fori_loop(..., unroll=k)`` inside the DDPM chain kernels.

The whole-chain Pallas sampler (ops/pallas_ddpm.py) runs its 200-step
denoise loop with Mosaic's default unroll=1.  Mosaic's scan lowering
supports ONLY unroll=1 or a full unroll (``NotImplementedError: Only
unroll=num_steps=200 and unroll=1 supported`` — measured on-chip), so
this compares those two points for both layouts — the row-major
single-sample kernel (B=64) and the feature-major gridded kernel
(10-sample fold).

Usage: python benchmarks/run_fori_unroll.py
Writes benchmarks/ddpm_unroll_tpu.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    bench._enable_compile_cache()
    disarm = bench._device_init_watchdog(
        float(os.environ.get("BENCH_DEVICE_TIMEOUT", "300")))
    import jax
    import jax.numpy as jnp

    jax.devices()
    disarm()

    from fetode_tpu.models.forecasting import (
        DiffusionForecasterSpec,
        diffusion_forecaster_init,
    )
    from fetode_tpu.nn.diffusion import make_schedule
    from fetode_tpu.ops.pallas_ddpm import pallas_eps_head_sample

    spec = DiffusionForecasterSpec(num_features=7, context_len=96,
                                   pred_len=24, diff_T=200)
    sched = make_schedule(spec.diff_T)
    key = jax.random.PRNGKey(0)
    params = diffusion_forecaster_init(key, spec)
    B = 64
    # cond as the sampler sees it: encoder output flattened (B, p*D)
    from fetode_tpu.models.forecasting import _cond

    x_ctx = jax.random.normal(key, (B, spec.context_len, spec.num_features))
    t_fut = jnp.arange(spec.pred_len, dtype=x_ctx.dtype)
    cond = jax.jit(lambda p, x: _cond(p, spec, x, t_fut))(params, x_ctx)

    def timed(n_samples, unroll):
        @jax.jit
        def sample(k):
            return pallas_eps_head_sample(params["eps_head"], spec.eps_cfg,
                                          sched, cond, k,
                                          n_samples=n_samples, unroll=unroll)

        for i in range(4):
            bench._sync(sample(jax.random.fold_in(key, 100 + i)).ravel()[0])
        n_rep = 15
        t0 = time.perf_counter()
        for i in range(n_rep):
            out = sample(jax.random.fold_in(key, i))
        bench._sync(out.ravel()[0])
        return n_rep * n_samples * B / (time.perf_counter() - t0)

    out = {}
    for n_samples, tag in ((1, "rowmajor_b64"), (10, "featmajor_10x64")):
        for unroll in (1, spec.diff_T):
            t_c = time.perf_counter()
            sps = timed(n_samples, unroll)
            out[f"{tag}_unroll{unroll}_samples_per_sec"] = round(sps, 1)
            out[f"{tag}_unroll{unroll}_first_call_sec"] = round(
                time.perf_counter() - t_c, 1)
            print(f"{tag} unroll={unroll}: {sps:,.1f} samples/s", flush=True)

    path = os.path.join(os.path.dirname(__file__), "ddpm_unroll_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
