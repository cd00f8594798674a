"""Hoisted vs generic chain for the net='mlp' conditional denoiser.

Interleaved windows; measured a TIE (XLA LICM already lifts the linear
first-layer contributions) -> cond_mlp_hoist_ab_tpu.json.
"""
import json, sys, time
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from fetode_tpu.models.cond_diffusion import (make_denoiser_spec,
                                              cond_denoiser_init,
                                              cond_denoiser_encode,
                                              cond_denoiser_eps,
                                              cond_denoiser_mlp_sample_loop)
from fetode_tpu.nn.diffusion import make_schedule, p_sample_loop

spec = make_denoiser_spec("mlp", d_in=7, pred_len=24, seq_len=96)
sched = make_schedule(250)
key = jax.random.PRNGKey(0)
params = cond_denoiser_init(key, spec)
B, S = 64, 10
past = jax.random.normal(key, (B, spec.seq_len, spec.d_in), jnp.float32)

def sync(v): float(jax.device_get(jnp.sum(v)))

@jax.jit
def generic(p, x, k):        # round-3 path: hoisted ENCODE, generic chain
    cond = cond_denoiser_encode(p, spec, x)
    def one(kk):
        return p_sample_loop(sched,
                             lambda y, t, c: cond_denoiser_eps(p, spec, y, c, t),
                             (B, spec.pred_len, spec.d_in), cond, kk,
                             jnp.float32)
    return jax.vmap(one)(jax.random.split(k, S))

@jax.jit
def hoisted(p, x, k):        # round-4: + hoisted first layer in the chain
    cond = cond_denoiser_encode(p, spec, x)
    def one(kk):
        return cond_denoiser_mlp_sample_loop(p, spec, sched, cond, kk,
                                             jnp.float32)
    return jax.vmap(one)(jax.random.split(k, S))

fns = {"generic": generic, "hoisted": hoisted}
for f in fns.values():
    sync(f(params, past, key)); sync(f(params, past, key))
# parity on-chip
np.testing.assert_allclose(np.asarray(generic(params, past, key)),
                           np.asarray(hoisted(params, past, key)),
                           rtol=3e-2, atol=3e-2)  # 250-step fp drift
vals = {n: [] for n in fns}
for w in range(6):                 # interleaved
    for n, f in fns.items():
        t0 = time.perf_counter()
        for i in range(3):
            y = f(params, past, jax.random.fold_in(key, i))
        sync(y)
        vals[n].append(3 * S * B / (time.perf_counter() - t0))
res = {n: {"median": float(np.median(v)), "min": float(min(v)),
           "max": float(max(v))} for n, v in vals.items()}
res["speedup"] = res["hoisted"]["median"] / res["generic"]["median"]
print(json.dumps(res, indent=1))
with open(os.path.join(os.path.dirname(__file__), "cond_mlp_hoist_ab_tpu.json"), "w") as fh:
    json.dump({"B": B, "n_samples": S, "T": 250, "denoiser": "mlp", **res},
              fh, indent=2)
