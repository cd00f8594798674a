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

    def _measure(name, **kw):
        nonlocal ref
        fn = jax.jit(make_kuramoto_rollout(H, W, steps, dt, **kw))
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
        return rows[name]["median"]

    # phase 1: step-loop forms at the round-3 block width
    best, best_kw = -1.0, {}
    for impl in ("shift", "roll"):
        for unroll in (False, True):
            kw = {"nsum_impl": impl, "unroll": unroll}
            med = _measure(f"{impl}_unroll{int(unroll)}", **kw)
            if med > best:
                best, best_kw = med, kw

    # phase 2: lane-block width on the phase-1 winner (wider blocks
    # amortise the serial step loop; VMEM guard in make_kuramoto_rollout)
    for bb in (256, 512):
        _measure(f"winner_bb{bb}", block_b=bb, **best_kw)

    # phase 3: training-step (value+grad) at 128 vs the widest block —
    # the backward's replay scratch is the VMEM cost of going wide
    gsum = {}
    for bb in (128, 512):
        roll = make_kuramoto_rollout(H, W, steps, dt, block_b=bb, **best_kw)
        gfn = jax.jit(jax.grad(lambda om, kk, th: jnp.sum(
            roll(om, kk, th) ** 2), argnums=(0, 1, 2)))
        g = gfn(omega, kc, theta0)
        gsum[bb] = jax.device_get(g[0])
        if bb != 128:
            np.testing.assert_allclose(gsum[bb], gsum[128], atol=2e-3,
                                       rtol=2e-3)
        st = _windows(lambda *a: gfn(*a)[0], omega, kc, theta0)
        rows[f"grad_bb{bb}"] = {k: v * B for k, v in st.items()}
        print(f"[grad_bb{bb}] {rows[f'grad_bb{bb}']['median']:.0f} img/s",
              flush=True)

    out = {"B": B, "steps": steps, "winner": best_kw, "rows": rows}
    path = os.path.join(os.path.dirname(__file__),
                        "kuramoto_rollout_ab_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v["median"] for k, v in rows.items()}))


if __name__ == "__main__":
    main()
