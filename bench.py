"""Benchmark: predprey KAN-FET NODE training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "epochs/sec", "vs_baseline": N}

value        = full training epochs/sec (dopri5 solve + backprop + Adam,
               the north-star config: KANFET[2,10,2] grid 5, rtol 1e-7,
               atol 1e-9, 35-point trajectory fit — BASELINE.md).
vs_baseline  = speedup over the faithful PyTorch-CPU reference loop
               (benchmarks/reference_cpu.py; sec/epoch recorded in
               benchmarks/baseline_cpu.json).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fetode_tpu.models.predprey import (
        PredPreyNODE,
        PredPreyTask,
        generate_data,
        predprey_init,
        trajectory_loss,
    )
    from fetode_tpu.train.loop import init_state, make_epoch_scanner
    from fetode_tpu.train.optim import make_optimizer

    task = PredPreyTask()
    spec = PredPreyNODE.kanfet(max_steps=256)  # north-star flagship config
    ts, ts_learn, truth = generate_data(task)
    target = truth[: task.n_train]
    x0 = jnp.asarray([task.x0, task.y0], jnp.float32)

    params = predprey_init(jax.random.PRNGKey(0), spec)
    tx = make_optimizer(2e-3, kind="adam", params=params)
    state = init_state(params, tx)

    def loss_fn(p, x0_, ts_, tgt):
        return trajectory_loss(p, spec, x0_, ts_, tgt)

    # Long per-call epoch scans amortise the ~100 ms tunnel round-trip so
    # the number reflects device throughput.
    epochs_per_call = 200
    scanner = make_epoch_scanner(loss_fn, tx, epochs_per_call)

    # Warm up / compile.  NOTE: block on a host transfer, not just
    # block_until_ready — the axon tunnel reports readiness early.
    state, losses = scanner(state, x0, ts_learn, target)
    float(jax.device_get(losses)[-1])

    # Timed region.
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, losses = scanner(state, x0, ts_learn, target)
    final_loss = float(jax.device_get(losses)[-1])
    wall = time.perf_counter() - t0
    epochs_per_sec = n_calls * epochs_per_call / wall

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_cpu.json")
    baseline_sec_per_epoch = None
    if os.path.exists(base_path):
        with open(base_path) as fh:
            baseline_sec_per_epoch = json.load(fh)["sec_per_epoch"]

    # Batched-trajectory inference throughput: vmap over initial conditions
    # (the TPU-native upgrade the reference's stateful buffers forbid).
    from fetode_tpu.models.predprey import predict as pp_predict

    n_traj = 512
    x0s = jax.random.uniform(jax.random.PRNGKey(1), (n_traj, 2), jnp.float32,
                             0.5, 2.0)
    infer_spec = spec._replace(max_steps=512)

    @jax.jit
    def solve_batch(p, x0s):
        return jax.vmap(lambda x0: pp_predict(p, infer_spec, x0, ts))(x0s)

    out = solve_batch(state.params, x0s)
    float(jax.device_get(out)[0, 0, 0])          # compile + sync
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = solve_batch(state.params, x0s)
    float(jax.device_get(out)[0, 0, 0])
    traj_per_sec = n_rep * n_traj / (time.perf_counter() - t0)

    extra = {
        "final_train_loss": final_loss,
        "trajectories_per_sec_per_chip": round(traj_per_sec, 1),
        "baseline_cpu_sec_per_epoch": baseline_sec_per_epoch,
        "device": str(jax.devices()[0]),
    }
    # Convergence/parity evidence from the recorded full 10k-epoch run
    # (benchmarks/predprey_10k_run.json, produced on this chip).
    run_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "predprey_10k_run.json")
    if os.path.exists(run_path):
        with open(run_path) as fh:
            rec = json.load(fh)
        extra["full_run_final_train_mse"] = rec["train"][-1]
        extra["full_run_best_test_mse"] = min(rec["test"])

    result = {
        "metric": "predprey KANFET-NODE training throughput (dopri5 rtol1e-7, full epoch incl. grad+Adam)",
        "value": round(epochs_per_sec, 3),
        "unit": "epochs/sec",
        "vs_baseline": (round(epochs_per_sec * baseline_sec_per_epoch, 2)
                        if baseline_sec_per_epoch else None),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
