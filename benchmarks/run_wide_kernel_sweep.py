"""Wide-kernel dispatch boundary sweep (VERDICT r2 item 7).

The adjoint whole-solve kernel has two layouts:

* **sublane** (`ops/pallas_adjoint.py`): ferro arrays flattened to
  (N, B) — fastest at small N, but N pads sublanes and the VMEM
  footprint grows linearly in N, so large stacks cannot compile.
* **lane-major wide** (`ops/pallas_kanfet_wide.py`): ferro arrays kept
  (rows, lanes) — scales to N = 32k+, slower at small N.

`models/predprey.py: predict()` auto-dispatches on
``max(in*out*K) > WIDE_DISPATCH_FERRO_N``.  Round 2 set that threshold
at 4096 from two endpoints only; this sweep measures BOTH layouts (and
the checkpointed-scan baseline) across ferro-N in [160 .. 32k] on the
flagship single-trajectory training step (dopri5 rtol 1e-7 atol 1e-9,
max_steps 256, Adam), so the threshold is the measured crossover.

Each row is the median of >=3 independently timed windows with the
[min, max] range recorded (the round-2 dispersion rule); compile
failures (sublane VMEM exhaustion on big stacks) are recorded as
``"compile_error"`` rather than dropped.

Usage: python benchmarks/run_wide_kernel_sweep.py [--epochs-per-call 20]
Writes benchmarks/wide_kernel_tpu.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

K = 8  # flagship ferro_num_basis

# layers_hidden stacks, ordered by ferro-N = max(in*out)*K.
STACKS = [
    (2, 10, 2),        # N = 160   (flagship)
    (2, 32, 2),        # N = 512
    (2, 64, 2),        # N = 1024
    (2, 128, 2),       # N = 2048
    (2, 16, 16, 2),    # N = 2048  (square mid stack)
    (2, 24, 24, 2),    # N = 4608  (straddles the old 4096 threshold)
    (2, 32, 32, 2),    # N = 8192
    (2, 64, 64, 2),    # N = 32768 (sublane layout cannot compile)
]


def ferro_n(stack):
    return max(a * b for a, b in zip(stack, stack[1:])) * K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-per-call", type=int, default=20)
    ap.add_argument("--n-calls", type=int, default=3)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from fetode_tpu.models.predprey import (PredPreyNODE, PredPreyTask,
                                            generate_data, predprey_init,
                                            trajectory_loss)
    from fetode_tpu.train.loop import init_state, make_epoch_scanner
    from fetode_tpu.train.optim import make_optimizer

    task = PredPreyTask()
    _, ts_learn, truth = generate_data(task)
    target = truth[: task.n_train]
    x0 = jnp.asarray([task.x0, task.y0], jnp.float32)

    def time_mode(spec, loss_fn):
        """Median epochs/s over >=3 windows; (stats, extras) where
        extras carries the scanner/state for roofline accounting."""
        params = predprey_init(jax.random.PRNGKey(0), spec)
        tx = make_optimizer(2e-3, kind="adam", params=params)
        state = init_state(params, tx)
        scanner = make_epoch_scanner(loss_fn, tx, args.epochs_per_call)
        t0 = time.perf_counter()
        state, losses = scanner(state, x0, ts_learn, target)   # compile
        losses[-1].block_until_ready()
        compile_s = time.perf_counter() - t0
        state, losses = scanner(state, x0, ts_learn, target)   # 1st-load warm
        losses[-1].block_until_ready()
        box = {"s": state, "loss": None}

        def window():
            s = box["s"]
            t0 = time.perf_counter()
            for _ in range(args.n_calls):
                s, losses = scanner(s, x0, ts_learn, target)
            box["loss"] = float(losses[-1].block_until_ready())
            box["s"] = s
            return (args.n_calls * args.epochs_per_call
                    / (time.perf_counter() - t0))

        vals = sorted(window() for _ in range(max(3, args.windows)))
        return ({"epochs_per_s": round(vals[len(vals) // 2], 2),
                 "min": round(vals[0], 2), "max": round(vals[-1], 2),
                 "compile_s": round(compile_s, 1),
                 "loss_after": box["loss"],
                 "finite": bool(jnp.isfinite(box["loss"]))},
                {"scanner": scanner, "state": box["s"]})

    def kernel_work_per_epoch(spec, state):
        """Analytic FLOPs/bytes per training epoch for the whole-solve
        adjoint kernels (Mosaic interiors are opaque to XLA's cost
        model) — the same accounting bench.py uses for the flagship
        pallas row: realized dopri5 attempts at the trained params
        (while-mode solver stats) x 6 fresh RHS evals/step (FSAL) x 3
        (forward + in-kernel adjoint replay, which re-evaluates the
        field and its VJP on the frozen mesh), with per-RHS FLOPs from
        XLA's cost model of one field eval; HBM bytes = params + grads
        + trajectory I/O (solver state is VMEM-resident)."""
        from fetode_tpu.diag.roofline import xla_cost
        from fetode_tpu.models.predprey import predict as pp_predict
        from fetode_tpu.nn.kan import kan_apply, kan_state_init

        pspec = spec._replace(solver_mode="while")
        _, st = pp_predict(state.params, pspec, x0, ts_learn,
                           full_output=True)
        steps = float(st.n_accepted + st.n_rejected)
        fstate = kan_state_init((), spec.kan, jnp.float32)
        rhs = jax.jit(lambda p, z: kan_apply(p, spec.kan, z, fstate)[0])
        rc = xla_cost(rhs, state.params, x0)
        pbytes = float(sum(
            int(jnp.size(l)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(state.params)))
        flops = steps * 6 * rc["flops"] * 3
        bytes_ = 2 * pbytes + 4 * task.n_train * 2 * 3
        return flops, bytes_, int(steps)

    from fetode_tpu.diag.roofline import roofline_row, xla_cost

    results = {}
    for stack in STACKS:
        n = ferro_n(stack)
        key = "x".join(map(str, stack))
        spec = PredPreyNODE.kanfet(layers_hidden=stack, ferro_num_basis=K,
                                   max_steps=256)
        row = {"ferro_n": n}
        print(f"[{key}] ferro_n={n}", flush=True)

        # checkpointed-scan baseline (the XLA path)
        def scan_loss(p, x0_, ts_, tgt, spec=spec):
            return trajectory_loss(p, spec, x0_, ts_, tgt)

        for name, make_loss in (
            ("scan", lambda spec=spec: scan_loss),
            ("sublane", lambda spec=spec: _sublane_loss(spec)),
            ("wide", lambda spec=spec: _wide_loss(spec)),
        ):
            try:
                row[name], extras = time_mode(spec, make_loss())
                print(f"  {name}: {row[name]['epochs_per_s']} ep/s "
                      f"[{row[name]['min']}, {row[name]['max']}]",
                      flush=True)
            except Exception as e:                          # noqa: BLE001
                row[name] = {"compile_error":
                             f"{type(e).__name__}: {str(e)[:300]}"}
                print(f"  {name}: FAILED {type(e).__name__}", flush=True)
                continue
            # Roofline accounting (VERDICT r4 item 4): exact XLA cost for
            # the scan program; documented analytic estimate for the
            # Mosaic whole-solve kernels.
            try:
                if name == "scan":
                    c = xla_cost(extras["scanner"], extras["state"], x0,
                                 ts_learn, target)
                    rl = roofline_row(c["flops"] / args.epochs_per_call,
                                      c["bytes"] / args.epochs_per_call,
                                      row[name]["epochs_per_s"])
                else:
                    fl, by, steps = kernel_work_per_epoch(
                        spec, extras["state"])
                    rl = roofline_row(
                        fl, by, row[name]["epochs_per_s"],
                        flop_source=(f"analytic: {steps} realized dopri5 "
                                     "attempts x 6 RHS x 3 (fwd + adjoint "
                                     "replay); RHS FLOPs from XLA cost "
                                     "model; bytes = params + grads + "
                                     "trajectory I/O"))
                row[name]["roofline"] = rl
                print(f"    roofline[{name}]: "
                      f"{rl.get('pct_peak_flops')}% FLOP peak, "
                      f"{rl.get('pct_peak_hbm')}% HBM peak -> "
                      f"{rl['bound']}", flush=True)
            except Exception as e:                          # noqa: BLE001
                row[name]["roofline"] = {
                    "error": f"{type(e).__name__}: {str(e)[:300]}"}
                print(f"    roofline[{name}] failed: {type(e).__name__}",
                      flush=True)
        results[key] = row

    # Crossover: smallest ferro_n at which the wide layout matches or
    # beats the sublane layout (or the sublane layout fails to compile).
    crossover = None
    for key in sorted(results, key=lambda k: results[k]["ferro_n"]):
        row = results[key]
        sub, wide = row.get("sublane", {}), row.get("wide", {})
        sub_eps = sub.get("epochs_per_s")
        wide_eps = wide.get("epochs_per_s")
        wide_wins = (sub_eps is None and wide_eps is not None) or (
            sub_eps is not None and wide_eps is not None
            and wide_eps >= sub_eps)
        if wide_wins and crossover is None:
            crossover = row["ferro_n"]
        elif not wide_wins:
            crossover = None      # demand a *stable* win from here up
    out = {
        "protocol": {"task": "flagship single-trajectory predprey train "
                             "step (dopri5 rtol 1e-7 atol 1e-9 max_steps "
                             "256, Adam 2e-3)",
                     "epochs_per_call": args.epochs_per_call,
                     "windows": f">= {max(3, args.windows)} (median + "
                                "[min,max])",
                     "ferro_num_basis": K},
        "sweep": results,
        "crossover_ferro_n": crossover,
        "note": "dispatch threshold WIDE_DISPATCH_FERRO_N in "
                "models/predprey.py is set from crossover_ferro_n: the "
                "smallest ferro-N from which the wide layout wins (or the "
                "sublane layout cannot compile) at every larger size.",
    }
    path = os.path.join(ROOT, "benchmarks", "wide_kernel_tpu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"crossover_ferro_n = {crossover}; wrote {path}", flush=True)


def _sublane_loss(spec):
    import jax.numpy as jnp

    from fetode_tpu.ops.pallas_adjoint import pallas_kanfet_solve_train

    def loss_fn(p, x0_, ts_, tgt):
        pred = pallas_kanfet_solve_train(
            p, spec.kan, x0_[None], ts_, rtol=spec.rtol, atol=spec.atol,
            max_steps=spec.max_steps)[0]
        return jnp.mean((pred - tgt) ** 2)

    return loss_fn


def _wide_loss(spec):
    import jax.numpy as jnp

    from fetode_tpu.ops.pallas_kanfet_wide import (
        pallas_kanfet_wide_solve_train,
    )

    def loss_fn(p, x0_, ts_, tgt):
        pred = pallas_kanfet_wide_solve_train(
            p, spec.kan, x0_[None], ts_, rtol=spec.rtol, atol=spec.atol,
            max_steps=spec.max_steps)[0]
        return jnp.mean((pred - tgt) ** 2)

    return loss_fn


if __name__ == "__main__":
    main()
