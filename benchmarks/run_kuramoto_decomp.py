"""Decompose the MNIST-Kuramoto inference bound: rollout vs head vs HBM.

Round 3 explained the forward gap (pallas rollout only 1.14x vs train's
1.53x) as "the KANLinear head's basis materialisation dominates inference
HBM traffic" and round 4 built the fused rollout+head kernel
(``ops/pallas_kuramoto.py: pallas_kuramoto_logits``) to eliminate that
traffic.  This probe measures, at B=1024 on the real chip:

1. rollout-only forward (pallas kernel, features returned),
2. unfused classifier (rollout kernel + XLA KANLinear head),
3. fused classifier (one kernel),
4. the scan/XLA baseline,

plus the per-image transcendental count of each stage, so the observed
bound can be NAMED (VPU transcendental rate vs HBM bytes) instead of
asserted.  Writes ``benchmarks/kuramoto_decomp_tpu.json``.
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
    out = fn(*args)
    _sync(out)
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
    from fetode_tpu.models.kuramoto import (KuramotoSpec, kuramoto_features,
                                            kuramoto_init, kuramoto_kan_apply)

    B = 1024
    spec = KuramotoSpec()
    key = jax.random.PRNGKey(0)
    params = kuramoto_init(key, spec)
    x = jax.random.uniform(key, (B, spec.H, spec.W), jnp.float32)

    paths = {
        "rollout_only_pallas": jax.jit(lambda p, xb: kuramoto_features(
            p, spec._replace(rollout="pallas"), xb)),
        "unfused_pallas": jax.jit(lambda p, xb: kuramoto_kan_apply(
            p, spec._replace(rollout="pallas"), xb)),
        "fused": jax.jit(lambda p, xb: kuramoto_kan_apply(
            p, spec._replace(rollout="pallas_fused"), xb)),
        "scan_xla": jax.jit(lambda p, xb: kuramoto_kan_apply(
            p, spec._replace(rollout="scan"), xb)),
    }
    rows = {}
    for name, fn in paths.items():
        st = _windows(fn, params, x)
        rows[name] = {k: v * B for k, v in st.items()}   # img/s
        print(f"[{name}] {rows[name]['median']:.0f} img/s "
              f"[{rows[name]['min']:.0f}, {rows[name]['max']:.0f}]",
              flush=True)

    # Per-image transcendental counts (the VPU floor components):
    HW = spec.H * spec.W
    cfg = spec.head_cfg
    counts = {
        # rollout: sin+cos of theta per site per step (+ final feature
        # sin/cos pair)
        "rollout_sincos": 2 * HW * (spec.steps + 1),
        # head: SiLU sigmoid per feature + logistic branch sigmoids
        "head_sigmoid": 2 * HW * (1 + cfg.logistic_num_basis),
    }
    out = {
        "B": B,
        "throughput_img_per_sec": rows,
        "transcendental_per_image": counts,
        "note": ("combine with benchmarks/ferro_ceiling_tpu.json "
                 "transcendental_rates to compute the VPU floor; "
                 "rollout-only vs unfused vs fused differences isolate "
                 "the head's true cost"),
    }
    path = os.path.join(os.path.dirname(__file__), "kuramoto_decomp_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v["median"] for k, v in rows.items()}))


if __name__ == "__main__":
    main()
