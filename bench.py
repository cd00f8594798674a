"""Benchmark: fetode_tpu training/sampling throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "epochs/sec", "vs_baseline": N}

value        = full training epochs/sec on the north-star workload
               (predprey KANFET[2,10,2] grid 5, dopri5 rtol 1e-7 atol 1e-9,
               35-point trajectory fit, solve + backprop + Adam).
vs_baseline  = speedup over the faithful PyTorch-CPU reference loop
               (benchmarks/reference_cpu.py; sec/epoch recorded in
               benchmarks/baseline_cpu.json).

extra        = the broader measured table (BASELINE.md): batched-trajectory
               inference and training, the ECG ferro model (f32 vs bf16
               hysteresis state), and DDPM forecast sampling (the
               reference's self-reported hotspots, train_kan_fet_ett.py:1154
               and kan_diffusion_ett.py:749).
"""

from __future__ import annotations

import json
import os
import sys
import time

_T0 = time.perf_counter()
# Wall-clock budget: the headline predprey bench always runs; each extra
# stage is skipped (value null) once the deadline passes, so the driver
# always gets its JSON line even under a tight harness timeout.
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE", "480"))


def _elapsed() -> float:
    return time.perf_counter() - _T0


def _stage(name, fn, *args, **kwargs):
    """Run one extra bench stage under the global deadline; stderr logs."""
    if _elapsed() > _DEADLINE_S:
        print(f"[bench {_elapsed():7.1f}s] SKIP {name} (past deadline)",
              file=sys.stderr, flush=True)
        return None
    print(f"[bench {_elapsed():7.1f}s] start {name}", file=sys.stderr,
          flush=True)
    out = fn(*args, **kwargs)
    print(f"[bench {_elapsed():7.1f}s] done  {name}", file=sys.stderr,
          flush=True)
    return out


def _device_init_watchdog(timeout_s: float):
    """Fail fast if backend init hangs (e.g. a dead axon TPU tunnel —
    observed to block ``jax.devices()`` indefinitely).  Deliberately
    dependency-free (threading only): importing fetode_tpu BEFORE the
    guard is armed would run the package import chain unguarded —
    exactly the window this watchdog exists to cover.  timeout_s <= 0
    disables.  The CLI's equivalent lives in
    fetode_tpu/utils/debug.py: device_init_watchdog."""
    import threading

    if timeout_s <= 0:
        return lambda: None
    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(f"[bench] FATAL: device init exceeded {timeout_s:.0f}s "
                  "(TPU tunnel down?) — aborting instead of hanging",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def _enable_compile_cache():
    """Persistent compilation cache: compile time dominates the bench
    (~350 s of the ~550 s cold run); cached reruns skip it entirely."""
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _sync(x):
    """Force a host transfer before reading the clock — block_until_ready
    returns early through the axon tunnel."""
    import jax
    import numpy as np
    return float(np.asarray(jax.device_get(x)).ravel()[0])


def bench_predprey():
    import jax
    import jax.numpy as jnp

    from fetode_tpu.models.predprey import (
        PredPreyNODE,
        PredPreyTask,
        generate_data,
        predprey_init,
        trajectory_loss,
    )
    from fetode_tpu.models.predprey import predict as pp_predict
    from fetode_tpu.train.loop import init_state, make_epoch_scanner
    from fetode_tpu.train.optim import make_optimizer

    task = PredPreyTask()
    # North-star flagship config.  Training mode: "pallas" = the
    # whole-solve kernel with in-kernel discrete adjoint
    # (ops/pallas_adjoint.py) — measured 7x the checkpointed-scan
    # throughput at identical convergence; scan is timed alongside.
    spec_scan = PredPreyNODE.kanfet(max_steps=256)
    spec_pal = spec_scan._replace(solver_mode="pallas")
    ts, ts_learn, truth = generate_data(task)
    target = truth[: task.n_train]
    x0 = jnp.asarray([task.x0, task.y0], jnp.float32)

    def time_training(spec, epochs_per_call, n_calls):
        params = predprey_init(jax.random.PRNGKey(0), spec)
        tx = make_optimizer(2e-3, kind="adam", params=params)
        state = init_state(params, tx)

        def loss_fn(p, x0_, ts_, tgt):
            return trajectory_loss(p, spec, x0_, ts_, tgt)

        # Long per-call epoch scans amortise the ~100 ms tunnel
        # round-trip so the number reflects device throughput.
        scanner = make_epoch_scanner(loss_fn, tx, epochs_per_call)
        state, losses = scanner(state, x0, ts_learn, target)   # compile
        _sync(losses[-1])
        # Second warm call: the FIRST post-compile invocation of a pallas
        # program carries a ~1 s one-time load cost (measured:
        # benchmarks/swing_probe_tpu.jsonl — window 0 reads 9 ep/s, every
        # later window 44-48, in-process and cross-process alike).
        state, losses = scanner(state, x0, ts_learn, target)
        _sync(losses[-1])
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, losses = scanner(state, x0, ts_learn, target)
        final_loss = _sync(losses[-1])
        eps = n_calls * epochs_per_call / (time.perf_counter() - t0)
        return eps, final_loss, state

    scan_eps, _, _ = time_training(spec_scan, 200, 3)
    epochs_per_sec, final_loss, state = time_training(spec_pal, 200, 6)
    spec = spec_scan

    # Batched-trajectory inference throughput: vmap over initial conditions
    # (the TPU-native upgrade the reference's stateful buffers forbid).
    n_traj = 512
    x0s = jax.random.uniform(jax.random.PRNGKey(1), (n_traj, 2), jnp.float32,
                             0.5, 2.0)
    infer_spec = spec._replace(max_steps=512)

    @jax.jit
    def solve_batch(p, x0s):
        return jax.vmap(lambda x0: pp_predict(p, infer_spec, x0, ts))(x0s)

    out = solve_batch(state.params, x0s)
    _sync(out[0, 0, 0])
    n_rep = 5
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = solve_batch(state.params, x0s)
    _sync(out[0, 0, 0])
    traj_per_sec = n_rep * n_traj / (time.perf_counter() - t0)

    # Whole-solve Pallas kernel (ops/pallas_node.py): the entire adaptive
    # dopri5 integration in ONE kernel, per-lane step control.  Measured
    # winner in the moderate-batch regime (B<=512).
    from fetode_tpu.ops.pallas_node import pallas_kanfet_solve

    @jax.jit
    def solve_pallas(p, x0s):
        return pallas_kanfet_solve(p, infer_spec.kan, x0s, ts,
                                   rtol=infer_spec.rtol,
                                   atol=infer_spec.atol, max_steps=512)

    for _ in range(3):
        _sync(solve_pallas(state.params, x0s)[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = solve_pallas(state.params, x0s)
    _sync(out[0, 0, 0])
    pallas_traj_per_sec = n_rep * n_traj / (time.perf_counter() - t0)
    return (epochs_per_sec, scan_eps, final_loss, traj_per_sec,
            pallas_traj_per_sec)


def bench_traj_training():
    """Batched-trajectory TRAINING throughput (population of initial
    conditions, full grad+Adam step) — the SURVEY §2.5(b) deliverable.
    Times only the jitted epoch scans (data generation and compile
    excluded)."""
    import jax
    import jax.numpy as jnp

    from fetode_tpu.models.predprey import predprey_init, trajectory_loss
    from fetode_tpu.train.loop import init_state, make_epoch_scanner
    from fetode_tpu.train.optim import make_optimizer
    from fetode_tpu.train.traj_driver import TrajParallelRun, make_batched_data

    run = TrajParallelRun(n_traj=256, epochs=60, epochs_per_call=20,
                          cosine_decay=False)
    ts_learn, x0s, targets = make_batched_data(run)

    def time_mode(spec):
        params = predprey_init(jax.random.PRNGKey(0), spec)
        tx = make_optimizer(run.lr, kind="adam", grad_clip=run.grad_clip,
                            params=params)
        state = init_state(params, tx)

        if spec.solver_mode == "pallas":
            from fetode_tpu.ops.pallas_adjoint import pallas_kanfet_solve_train

            def loss_fn(p, x0s_, targets_):
                pred = pallas_kanfet_solve_train(
                    p, spec.kan, x0s_, ts_learn, rtol=spec.rtol,
                    atol=spec.atol, max_steps=spec.max_steps)
                return jnp.mean((pred - targets_) ** 2)
        else:
            def loss_fn(p, x0s_, targets_):
                return jnp.mean(jax.vmap(
                    lambda x0, tgt: trajectory_loss(p, spec, x0, ts_learn, tgt)
                )(x0s_, targets_))

        scanner = make_epoch_scanner(loss_fn, tx, run.epochs_per_call)
        state, losses = scanner(state, x0s, targets)       # compile
        _sync(losses[-1])
        state, losses = scanner(state, x0s, targets)       # first-load warm
        _sync(losses[-1])
        n_calls = run.epochs // run.epochs_per_call
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, losses = scanner(state, x0s, targets)
        _sync(losses[-1])
        return run.n_traj * run.epochs / (time.perf_counter() - t0)

    return (time_mode(run.spec._replace(solver_mode="pallas")),
            time_mode(run.spec))


def bench_ecg_ferro(state_dtype="", solver_mode="scan", pallas_layout="loop"):
    """ECG ferro MLP-NODE training epochs/sec (full ECG200-sized epoch:
    100 samples, batch 8, dopri5 latent solve + grad + AdamW).

    ``solver_mode="pallas"``: whole-solve in-kernel discrete adjoint
    (ops/pallas_ferro_node.py); ``pallas_layout="vec"`` selects the
    batch-vectorized kernel layout."""
    import jax
    import jax.numpy as jnp

    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.loop import init_state
    from fetode_tpu.train.optim import make_optimizer

    spec = M.KanFetMLPNODESpec(T=96, state_dtype=state_dtype,
                               solver_mode=solver_mode,
                               pallas_layout=pallas_layout)
    key = jax.random.PRNGKey(0)
    params = M.kanfet_mlp_node_init(key, spec)
    x = jax.random.normal(key, (96, 96), jnp.float32)   # 12 batches of 8
    y = jax.random.bernoulli(key, 0.5, (96,)).astype(jnp.int32)
    batches = (x.reshape(12, 8, 96), y.reshape(12, 8))

    import optax

    def loss_fn(p, k, xb, yb):
        logits = M.kanfet_mlp_node_apply(p, spec, xb)
        return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

    tx = make_optimizer(1e-3, kind="adamw", weight_decay=1e-4, grad_clip=1.0,
                        params=params)
    state = init_state(params, tx)
    # 10-epoch blocks per dispatch (make_minibatch_epochs_scanner):
    # per-epoch dispatches made this bench tunnel-latency-bound
    # (cross-session swings of ~2x at identical code).
    from fetode_tpu.train.loop import make_minibatch_epochs_scanner
    E = 10
    epoch_fn = make_minibatch_epochs_scanner(loss_fn, tx, keyed=True)
    eb = tuple(jnp.repeat(a[None], E, 0) for a in batches)

    state, losses = epoch_fn(state, key, eb)   # compile
    _sync(losses[-1, -1])
    # First post-compile invocation pays a one-time program-load cost
    # (~0.9 s measured on the pallas path — the source of the recorded
    # 20-vs-52 ep/s cross-run swing; benchmarks/swing_probe_tpu.jsonl).
    # Warm it out, then time steady state.
    state, losses = epoch_fn(state, jax.random.fold_in(key, 99), eb)
    _sync(losses[-1, -1])
    n_calls = 3
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = epoch_fn(state, jax.random.fold_in(key, i), eb)
    _sync(losses[-1, -1])
    return n_calls * E / (time.perf_counter() - t0)


def bench_ecg_logistic(solver_mode="scan", field="plain"):
    """ECG KanFetNODE training epochs/sec — same protocol as
    bench_ecg_ferro; "pallas" = whole-solve in-kernel adjoint
    (ops/pallas_logistic_node.py for field='plain',
    ops/pallas_mlp_node.py for field='mlp')."""
    import jax
    import jax.numpy as jnp
    import optax

    from fetode_tpu.models import ecg as M
    from fetode_tpu.train.loop import init_state
    from fetode_tpu.train.optim import make_optimizer

    spec = M.KanFetNODESpec(T=96, solver_mode=solver_mode, field=field)
    key = jax.random.PRNGKey(0)
    params = M.kanfet_node_init(key, spec)
    x = jax.random.normal(key, (96, 96), jnp.float32)
    y = jax.random.bernoulli(key, 0.5, (96,)).astype(jnp.int32)
    batches = (x.reshape(12, 8, 96), y.reshape(12, 8))

    def loss_fn(p, k, xb, yb):
        logits = M.kanfet_node_apply(p, spec, xb)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    tx = make_optimizer(1e-3, kind="adamw", weight_decay=1e-4,
                        grad_clip=1.0, params=params)
    state = init_state(params, tx)
    from fetode_tpu.train.loop import make_minibatch_epochs_scanner
    E = 10
    epoch_fn = make_minibatch_epochs_scanner(loss_fn, tx, keyed=True)
    eb = tuple(jnp.repeat(a[None], E, 0) for a in batches)
    state, losses = epoch_fn(state, key, eb)
    _sync(losses[-1, -1])
    state, losses = epoch_fn(state, jax.random.fold_in(key, 99), eb)
    _sync(losses[-1, -1])   # first-load warm (see bench_ecg_ferro)
    n_calls = 3
    t0 = time.perf_counter()
    for i in range(n_calls):
        state, losses = epoch_fn(state, jax.random.fold_in(key, i), eb)
    _sync(losses[-1, -1])
    return n_calls * E / (time.perf_counter() - t0)


def bench_diffusion_sampling():
    """DDPM forecast sampling (200 sequential denoise steps — the
    reference's self-reported pain point, kan_diffusion_ett.py:749)."""
    import jax
    import jax.numpy as jnp

    from fetode_tpu.models.forecasting import (
        DiffusionForecasterSpec,
        diffusion_forecaster_init,
        diffusion_forecaster_sample,
    )
    from fetode_tpu.nn.diffusion import make_schedule

    spec = DiffusionForecasterSpec(num_features=7, context_len=96,
                                   pred_len=24, diff_T=200)
    sched = make_schedule(spec.diff_T)
    key = jax.random.PRNGKey(0)
    params = diffusion_forecaster_init(key, spec)
    B = 64
    x_ctx = jax.random.normal(key, (B, spec.context_len, spec.num_features))

    def timed(sampler, n_samples=1):
        @jax.jit
        def sample(p, x_ctx, k):
            return diffusion_forecaster_sample(p, spec, sched, x_ctx, k,
                                               sampler=sampler,
                                               n_samples=n_samples)

        # Warm thoroughly: past the first compiled call, dispatch/tunnel
        # costs keep dropping for a few invocations — time steady state.
        for i in range(5):
            _sync(sample(params, x_ctx,
                         jax.random.fold_in(key, 100 + i)).ravel()[0])
        n_rep = 15
        t0 = time.perf_counter()
        for i in range(n_rep):
            out = sample(params, x_ctx, jax.random.fold_in(key, i))
        _sync(out.ravel()[0])
        return n_rep * n_samples * B / (time.perf_counter() - t0)

    # n_samples=10 folds the reference's 10-sample eval averaging
    # (kan_diffusion_ett.py:1133) into one gridded kernel launch
    return timed("pallas"), timed("scan"), timed("pallas", n_samples=10)


def _round(x, nd):
    return None if x is None else round(x, nd)


def main() -> None:
    _enable_compile_cache()
    import jax

    disarm = _device_init_watchdog(
        float(os.environ.get("BENCH_DEVICE_TIMEOUT", "300")))
    jax.devices()
    disarm()

    (epochs_per_sec, scan_eps, final_loss, traj_per_sec,
     pallas_traj_per_sec) = _stage("predprey headline", bench_predprey)

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_cpu.json")
    baseline_sec_per_epoch = None
    if os.path.exists(base_path):
        with open(base_path) as fh:
            baseline_sec_per_epoch = json.load(fh)["sec_per_epoch"]

    # Stage order: the many cheap model-zoo rows (~25 s each) run before
    # the one expensive traj-training stage (~175 s of compiles), so a
    # deadline truncation nulls ONE row instead of four (the r02 full
    # pass lost ferro-bf16/logistic/diffusion that way).
    extra = {
        "final_train_loss": final_loss,
        "scan_mode_epochs_per_sec": round(scan_eps, 2),
        "trajectories_per_sec_per_chip": round(traj_per_sec, 1),
        "pallas_whole_solve_traj_per_sec": round(pallas_traj_per_sec, 1),
        "ecg_ferro_pallas_epochs_per_sec": _round(
            _stage("ecg ferro pallas",
                   bench_ecg_ferro, solver_mode="pallas"), 2),
        "ecg_ferro_epochs_per_sec": _round(
            _stage("ecg ferro scan", bench_ecg_ferro), 2),
        "ecg_ferro_bf16state_epochs_per_sec": _round(
            _stage("ecg ferro bf16", bench_ecg_ferro, "bfloat16"), 2),
        "ecg_logistic_node_pallas_epochs_per_sec": _round(
            _stage("ecg logistic pallas",
                   bench_ecg_logistic, solver_mode="pallas"), 2),
        "ecg_logistic_node_epochs_per_sec": _round(
            _stage("ecg logistic scan", bench_ecg_logistic), 2),
        "diffusion_samples_per_sec": None,      # filled below
        "baseline_cpu_sec_per_epoch": baseline_sec_per_epoch,
        "device": str(jax.devices()[0]),
    }
    diff = _stage("diffusion sampling", bench_diffusion_sampling)
    if diff is not None:
        extra["diffusion_samples_per_sec"] = round(diff[0], 1)
        extra["diffusion_scan_samples_per_sec"] = round(diff[1], 1)
        extra["diffusion_folded10_samples_per_sec"] = round(diff[2], 1)
    traj_train = _stage("traj training", bench_traj_training) or (None, None)
    extra["traj_training_traj_epochs_per_sec"] = _round(traj_train[0], 1)
    extra["traj_training_scan_traj_epochs_per_sec"] = _round(traj_train[1], 1)
    # Convergence/parity evidence from the recorded full 10k-epoch run
    # (benchmarks/predprey_10k_run.json, produced on this chip).
    run_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "predprey_10k_run.json")
    if os.path.exists(run_path):
        with open(run_path) as fh:
            rec = json.load(fh)
        extra["full_run_final_train_mse"] = rec.get("final_train")
        extra["full_run_final_test_extrap_mse"] = rec.get("final_test_extrap")
        extra["full_run_best_test_mse"] = rec.get("min_test_extrap")

    result = {
        "metric": "predprey KANFET-NODE training throughput (dopri5 rtol1e-7, full epoch incl. grad+Adam; in-kernel discrete-adjoint path)",
        "value": round(epochs_per_sec, 3),
        "unit": "epochs/sec",
        "vs_baseline": (round(epochs_per_sec * baseline_sec_per_epoch, 2)
                        if baseline_sec_per_epoch else None),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
