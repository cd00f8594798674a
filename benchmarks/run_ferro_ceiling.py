"""What actually bounds the XLA ferro-basis op? A measured answer.

Round-3's roofline put the XLA-fused ferro op at 167 GB/s = 20.4% of v5e
HBM peak yet called it "bandwidth-bound with ~5x headroom" — self-
contradictory (the round-3 verdict, item 2): if 5x HBM headroom exists,
HBM is not the binding resource.  The hypothesis is VPU transcendental
throughput: per (B, in, out, K) element the basis evaluates 2 sigmoids +
1 tanh (``ops/ferro.py:136-147``; the reference's formulas,
``ferro_class.py:380-414``).

This script measures, on the real chip:

1. **The VPU transcendental rate** — elementwise chains of k tanh /
   sigmoid / exp applications fused into one kernel over an HBM-resident
   array; the slope of time vs k isolates the per-element op cost from
   the memory pass.  A multiply-add chain is the dense-VPU control.
2. **The ferro op itself** at the documented claim shape (B=256, in=64,
   out=128, K=12) — measured seconds/op vs the time its transcendental
   count alone would take at the measured rate, and vs its HBM bytes at
   peak bandwidth.

Writes ``benchmarks/ferro_ceiling_tpu.json`` with the rates, the
decomposition, and the verdict string used by BASELINE.md's ferro-op row.
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
    # Force a host transfer: block_until_ready returns early under the
    # axon tunnel (see bench.py).
    float(jax.device_get(jnp.sum(x)))


def _time_window(fn, *args, reps=8):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _median_windows(fn, *args, reps=8, windows=5):
    return float(np.median([_time_window(fn, *args, reps=reps)
                            for _ in range(windows)]))


OPS = {
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "exp": jnp.exp,
    "fma": lambda y: y * 1.000001 + 0.0001,   # dense-VPU control
}


def transcendental_rates(shape=(4096, 2048), ks=(8, 32, 64), dtypes=("float32", "bfloat16")):
    """Per-op element rates via the chain-slope method.

    One jitted kernel applies the op k times to every element (XLA fuses
    the chain: one HBM read + one write + k VPU ops per element).  The
    slope d(time)/dk per element is the op's reciprocal throughput,
    independent of the memory-pass constant.
    """
    n_elem = int(np.prod(shape))
    results = {}
    for dtype in dtypes:
        x = jax.random.uniform(jax.random.PRNGKey(0), shape,
                               jnp.dtype(dtype), 0.1, 0.9)
        for name, op in OPS.items():
            times = {}
            for k in ks:
                @jax.jit
                def chain(y, _k=k, _op=op):
                    for _ in range(_k):
                        y = _op(y)
                    return y
                times[k] = _median_windows(chain, x)
            # least-squares slope of time vs k
            karr = np.asarray(list(times))
            tarr = np.asarray([times[k] for k in karr])
            slope = float(np.polyfit(karr, tarr, 1)[0])
            rate = n_elem / slope if slope > 0 else float("inf")
            results[f"{name}_{dtype}"] = {
                "times_per_k": {str(k): t for k, t in times.items()},
                "sec_per_apply": slope,
                "elements_per_sec": rate,
            }
            print(f"[{name} {dtype}] {rate/1e9:.1f} G elem/s "
                  f"(slope {slope*1e6:.1f} us/apply over {n_elem/1e6:.0f}M)",
                  flush=True)
    return results


def ferro_op_decomposition(rates):
    from fetode_tpu.diag.roofline import device_peaks, xla_cost
    from fetode_tpu.ops.ferro import (FerroConfig, ferro_apply, ferro_init,
                                      ferro_state_init)

    cfg = FerroConfig(64, 128, 12)
    B = 256
    key = jax.random.PRNGKey(0)
    params = ferro_init(key, cfg)
    state = ferro_state_init((B,), cfg)
    x = jax.random.normal(key, (B, 64), jnp.float32)
    f = jax.jit(lambda p, s, xb: ferro_apply(p, s, xb, cfg))

    measured = _median_windows(lambda: f(params, state, x)[0], reps=30)

    n_elem = B * cfg.in_dim * cfg.out_dim * cfg.num_basis
    # ops/ferro.py per (B,in,out,K) element: sigmoid(crossed_pos),
    # sigmoid(crossed_neg), tanh(basis); sigmoid(moving_up) is (B,in).
    n_trans = {"tanh": 1 * n_elem, "sigmoid": 2 * n_elem + B * cfg.in_dim}
    t_trans = sum(n / rates[f"{op}_float32"]["elements_per_sec"]
                  for op, n in n_trans.items())

    cost = xla_cost(f, params, state, x)
    peaks = device_peaks()
    t_hbm = cost["bytes"] / peaks["peak_hbm_Bps"] if peaks else None

    frac_trans = t_trans / measured
    frac_hbm = (t_hbm / measured) if t_hbm else None
    binding = ("vpu-transcendental" if frac_trans >= (frac_hbm or 0)
               else "hbm-bandwidth")
    verdict = (
        f"measured {measured*1e6:.0f} us/op; transcendental floor "
        f"{t_trans*1e6:.0f} us ({100*frac_trans:.0f}% of measured), HBM floor "
        f"{t_hbm*1e6:.0f} us ({100*frac_hbm:.0f}%) -> binding resource: "
        f"{binding}")
    print(verdict, flush=True)
    return {
        "shape": {"B": B, "in": cfg.in_dim, "out": cfg.out_dim,
                  "K": cfg.num_basis},
        "measured_sec_per_op": measured,
        "ops_per_sec": 1.0 / measured,
        "transcendental_counts": n_trans,
        "transcendental_floor_sec": t_trans,
        "hbm_bytes": cost["bytes"],
        "hbm_floor_sec": t_hbm,
        "fraction_transcendental": frac_trans,
        "fraction_hbm": frac_hbm,
        "binding": binding,
        "verdict": verdict,
    }


def main():
    rates = transcendental_rates()
    decomp = ferro_op_decomposition(rates)
    out = {"device": str(jax.devices()[0].device_kind),
           "transcendental_rates": rates,
           "ferro_op": decomp}
    path = os.path.join(os.path.dirname(__file__), "ferro_ceiling_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps({"binding": decomp["binding"],
                      "verdict": decomp["verdict"]}))


if __name__ == "__main__":
    main()
