"""A/B the Kuramoto rollout kernel's step-loop forms on the real chip.

The round-4 decomposition (``run_kuramoto_decomp.py``) showed the rollout
kernel is ~86% of MNIST inference time, far from both rooflines — the
cost is inside the per-step neighbour-sum + sin/cos loop.  Variants:

- nsum_impl: "shift" (zero-pad + slice concatenates, the round-3 form)
  vs "roll" (``pltpu.roll`` sublane rotations + boundary masks);
- unroll: ``fori_loop`` vs Python-unrolled steps.

Forward-only at B=1024 (the inference row).  Writes
``benchmarks/kuramoto_rollout_ab_tpu.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    float(jax.device_get(jnp.sum(x)))


def _windows(fn, *args, reps=5, windows=5):
    _sync(fn(*args))
    _sync(fn(*args))
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        vals.append(reps / (time.perf_counter() - t0))
    vals = np.asarray(vals)
    return {"median": float(np.median(vals)), "min": float(vals.min()),
            "max": float(vals.max())}


def main():
    from fetode_tpu.ops.pallas_kuramoto import make_kuramoto_rollout

    H = W = 28
    steps, dt = 10, 0.15
    B = 1024
    key = jax.random.PRNGKey(0)
    omega = jax.random.normal(key, (H, W))
    kc = jnp.float32(0.8)
    theta0 = jax.random.normal(jax.random.fold_in(key, 1), (B, H * W))

    rows = {}
    ref = None
    for impl in ("shift", "roll"):
        for unroll in (False, True):
            name = f"{impl}_unroll{int(unroll)}"
            fn = jax.jit(make_kuramoto_rollout(H, W, steps, dt,
                                               nsum_impl=impl, unroll=unroll))
            out = fn(omega, kc, theta0)
            if ref is None:
                ref = jax.device_get(out)
            else:
                np.testing.assert_allclose(jax.device_get(out), ref,
                                           atol=2e-4, rtol=2e-4)
            st = _windows(fn, omega, kc, theta0)
            rows[name] = {k: v * B for k, v in st.items()}   # img/s
            print(f"[{name}] {rows[name]['median']:.0f} img/s "
                  f"[{rows[name]['min']:.0f}, {rows[name]['max']:.0f}]",
                  flush=True)

    out = {"B": B, "steps": steps, "rows": rows}
    path = os.path.join(os.path.dirname(__file__),
                        "kuramoto_rollout_ab_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v["median"] for k, v in rows.items()}))


if __name__ == "__main__":
    main()
