"""A/B: XLA-fused jnp ferro op vs the Pallas fused kernel (v2).

Round-4 follow-up to the measured ceiling (``run_ferro_ceiling.py``): the
XLA path's 1090 us/op sits ~4x above both the transcendental floor
(141 us) and the cost-model HBM floor (251 us) — the gap is
fusion-boundary materialisation of the rank-4 intermediates.  The v2
kernel (``ops/pallas_ferro.py``) attacks it with (a) sigmoid-via-tanh
gates (v5e tanh 3.4 T elem/s vs logistic 0.38 T — measured), (b) optional
bfloat16 branch-state streams, (c) tunable batch tile.

Writes ``benchmarks/ferro_kernel_ab_tpu.json`` with median [min, max]
windows per variant and the implied achieved bandwidth on the true state
traffic (branch in + branch out).
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


def _sync(x):
    float(jax.device_get(jnp.sum(x)))


def _windows(fn, reps=30, windows=5):
    _sync(fn()[0])
    _sync(fn()[0])
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _sync(out[0])
        vals.append(reps / (time.perf_counter() - t0))
    vals = np.asarray(vals)
    return {"median": float(np.median(vals)), "min": float(vals.min()),
            "max": float(vals.max())}


def main():
    from fetode_tpu.ops.ferro import (FerroConfig, ferro_apply, ferro_init,
                                      ferro_state_init)
    from fetode_tpu.ops.pallas_ferro import _fused_fwd_impl

    cfg = FerroConfig(64, 128, 12)
    B = 256
    key = jax.random.PRNGKey(0)
    params = ferro_init(key, cfg)
    x = jax.random.normal(key, (B, 64), jnp.float32)

    rows = {}
    state_f32 = ferro_state_init((B,), cfg)
    state_bf16 = ferro_state_init((B,), cfg, dtype=jnp.bfloat16)
    # bf16 prev_x keeps dtype via state; x stays f32 (compute dtype)
    state_bf16 = state_bf16._replace(prev_x=state_bf16.prev_x.astype(jnp.float32))

    jnp_f = jax.jit(lambda p, s, xb: ferro_apply(p, s, xb, cfg))
    rows["xla_jnp_f32"] = _windows(lambda: jnp_f(params, state_f32, x))
    print("xla_jnp_f32", rows["xla_jnp_f32"], flush=True)

    for tb in (8, 16, 32):
        kf = jax.jit(functools.partial(_fused_fwd_impl, cfg=cfg, block_b=tb))
        try:
            rows[f"pallas_v2_f32_tb{tb}"] = _windows(
                lambda: kf(params, state_f32, x))
        except Exception as e:                       # noqa: BLE001
            rows[f"pallas_v2_f32_tb{tb}"] = {"error": str(e)[:200]}
        print(f"pallas_v2_f32_tb{tb}", rows[f"pallas_v2_f32_tb{tb}"],
              flush=True)

    for tb in (16, 32):
        kf = jax.jit(functools.partial(_fused_fwd_impl, cfg=cfg, block_b=tb))
        try:
            rows[f"pallas_v2_bf16_tb{tb}"] = _windows(
                lambda: kf(params, state_bf16, x))
        except Exception as e:                       # noqa: BLE001
            rows[f"pallas_v2_bf16_tb{tb}"] = {"error": str(e)[:200]}
        print(f"pallas_v2_bf16_tb{tb}", rows[f"pallas_v2_bf16_tb{tb}"],
              flush=True)

    # True state traffic (branch in + branch out), the kernel's dominant
    # stream: (B, in, out, K) elements each way.
    n_state = B * cfg.in_dim * cfg.out_dim * cfg.num_basis
    for name, st in rows.items():
        if "median" in st:
            byt = n_state * (2 if "bf16" in name else 4) * 2
            st["state_traffic_gbps"] = round(byt * st["median"] / 1e9, 1)

    out = {"B": B, "shape": [cfg.in_dim, cfg.out_dim, cfg.num_basis],
           "rows": rows}
    path = os.path.join(os.path.dirname(__file__), "ferro_kernel_ab_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({k: v.get("median") for k, v in rows.items()}))


if __name__ == "__main__":
    main()
