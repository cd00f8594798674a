"""Localize the ECG ferro pallas row's cross-run throughput swing.

BASELINE.md records 19.99 / 51.85 epochs/s for the SAME kernel code in
two processes an hour apart while the scan row read a bit-stable 10.12
in both.  This probe compiles the pallas training block ONCE and times
many consecutive windows in one process, then does the same for the
scan path:

* flat windows within a process + swing across processes -> per-process
  conditions (compile artifact quality, tunnel RPC latency at dispatch);
* drifting windows within a process -> time-varying interference
  (shared chip / relay contention).

Usage: python benchmarks/run_swing_probe.py [n_windows]
Appends one line per invocation to benchmarks/swing_probe_tpu.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def windows(mode, n_windows):
    import jax
    import jax.numpy as jnp
    import optax

    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.loop import (
        init_state,
        make_minibatch_epochs_scanner,
    )
    from fetode_tpu.train.optim import make_optimizer

    spec = M.KanFetMLPNODESpec(T=96, solver_mode=mode)
    key = jax.random.PRNGKey(0)
    params = M.kanfet_mlp_node_init(key, spec)
    x = jax.random.normal(key, (96, 96), jnp.float32)
    y = jax.random.bernoulli(key, 0.5, (96,)).astype(jnp.int32)
    batches = (x.reshape(12, 8, 96), y.reshape(12, 8))

    def loss_fn(p, k, xb, yb):
        logits = M.kanfet_mlp_node_apply(p, spec, xb)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    tx = make_optimizer(1e-3, kind="adamw", weight_decay=1e-4,
                        grad_clip=1.0, params=params)
    state = init_state(params, tx)
    E = 10
    epoch_fn = make_minibatch_epochs_scanner(loss_fn, tx, keyed=True)
    eb = tuple(jnp.repeat(a[None], E, 0) for a in batches)

    t_c = time.perf_counter()
    state, losses = epoch_fn(state, key, eb)
    bench._sync(losses[-1, -1])
    compile_s = time.perf_counter() - t_c

    eps = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, jax.random.fold_in(key, w), eb)
        bench._sync(losses[-1, -1])
        eps.append(round(E / (time.perf_counter() - t0), 2))
    return compile_s, eps


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bench._enable_compile_cache()
    disarm = bench._device_init_watchdog(
        float(os.environ.get("BENCH_DEVICE_TIMEOUT", "300")))
    import jax

    jax.devices()
    disarm()

    rec = {"ts": time.time(), "pid": os.getpid()}
    for mode in ("pallas", "scan"):
        compile_s, eps = windows(mode, n_windows)
        rec[f"{mode}_compile_s"] = round(compile_s, 1)
        rec[f"{mode}_window_epochs_per_sec"] = eps
        print(f"{mode}: compile {compile_s:.1f}s windows {eps}", flush=True)

    path = os.path.join(os.path.dirname(__file__), "swing_probe_tpu.jsonl")
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
