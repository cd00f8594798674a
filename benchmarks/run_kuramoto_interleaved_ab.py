"""Interleaved Kuramoto step-loop A/B (shift vs roll vs unroll).

10 interleaved rounds cancel session drift; all forms tie within 1.3%
(BASELINE.md Kuramoto rollout A/B row).
"""
import json, sys, time
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from fetode_tpu.ops.pallas_kuramoto import make_kuramoto_rollout

H = W = 28; steps, dt = 10, 0.15; B = 1024
key = jax.random.PRNGKey(0)
omega = jax.random.normal(key, (H, W)); kc = jnp.float32(0.8)
theta0 = jax.random.normal(jax.random.fold_in(key, 1), (B, H * W))

def sync(x): float(jax.device_get(jnp.sum(x)))

fns = {}
for name, kw in (("shift_f", dict(nsum_impl="shift", unroll=False)),
                 ("roll_f",  dict(nsum_impl="roll",  unroll=False)),
                 ("shift_u", dict(nsum_impl="shift", unroll=True))):
    f = jax.jit(make_kuramoto_rollout(H, W, steps, dt, **kw))
    sync(f(omega, kc, theta0)); sync(f(omega, kc, theta0))
    fns[name] = f

vals = {k: [] for k in fns}
for w in range(10):                       # interleaved windows
    for name, f in fns.items():
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(omega, kc, theta0)
        sync(out)
        vals[name].append(5 * B / (time.perf_counter() - t0))
res = {k: {"median": float(np.median(v)), "min": float(min(v)),
           "max": float(max(v))} for k, v in vals.items()}
print(json.dumps(res, indent=1))
