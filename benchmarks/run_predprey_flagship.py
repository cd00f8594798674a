"""Flagship predprey 10k-epoch runs: stability + step-budget ablation.

Reruns the north-star configuration (train_kanfet_node_predprey.py: KANFET
[2,10,2], dopri5, Adam 2e-3, 10k epochs) under the round-2 driver knobs and
records, per config: final train MSE, FINAL-epoch extrapolation test MSE
(the stable-extrapolation criterion — not just a best snapshot), best-crit
snapshot test MSE, wall seconds, epochs/sec, and the step-budget history.

Usage: python benchmarks/run_predprey_flagship.py [config ...]
  configs: baseline reg reg_val schedule flagship (default: all)
Writes benchmarks/predprey_flagship_ablation.json (and updates
benchmarks/predprey_10k_run.json from the 'flagship' config).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fetode_tpu.models.predprey import PredPreyTask, generate_data, predict
from fetode_tpu.train.predprey_driver import PredPreyRun, train_predprey

CONFIGS = {
    "baseline": dict(),
    "reg": dict(reg_lambda=1e-4),
    "reg3": dict(reg_lambda=1e-3),
    "reg_val": dict(reg_lambda=1e-4, val_points=5),
    "schedule": dict(step_budget_schedule=True),
    "flagship": dict(reg_lambda=1e-4, step_budget_schedule=True),
    "anchor": dict(phase_anchor_periods=2),
    "anchor3": dict(phase_anchor_periods=3),
    # 17 segments of 3 points solved in parallel: sequential depth per
    # epoch drops ~8.5x (seg budget 60 vs 256 full-window scan)
    "shooting": dict(shooting_points=3),
}


def _extrap_mse(params, spec):
    task = PredPreyTask()
    ts, _, truth = generate_data(task)
    eval_spec = spec._replace(max_steps=4 * spec.max_steps,
                              solver_mode="while")
    pred = predict(params, eval_spec, jnp.asarray([task.x0, task.y0]), ts)
    return float(jnp.mean((pred[task.n_train:] - truth[task.n_train:]) ** 2))


def run_two_stage(epochs1=10_000, epochs2=5_000, anchor_k=2, select_k=0,
                  solver_mode="scan", dense_anchor=0, stage2_scan=False,
                  jitter=False, consistent=False, tag=None):
    """Two-stage flagship: (1) plain 35-point window fit (the reference's
    exact objective), then (2) periodicity-anchored fine-tune at lower lr —
    the window is already fit, stage 2 only has to correct the learned
    orbit's period (the extrapolation-error driver).

    ``select_k`` > 0 snapshots the stage-2 model by HELD-OUT anchored loss
    at k=select_k (train-data-implied; see PredPreyRun.select_anchor_k) —
    the measured fix for the anchored run's oscillating extrapolation
    (final-model 0.039 vs transient 0.005 without it)."""
    spec = None
    if solver_mode != "scan":
        from fetode_tpu.models.predprey import PredPreyNODE
        spec = PredPreyNODE.kanfet(max_steps=256)._replace(
            solver_mode=solver_mode)
    run1 = PredPreyRun(epochs=epochs1, spec=spec,
                       consistent_time_base=consistent)
    p1, h1 = train_predprey(run1, log=None)
    spec2 = None if (spec is None or stage2_scan) else spec
    cycles = tuple(range(1, anchor_k + 1)) if dense_anchor else ()
    run2 = PredPreyRun(epochs=epochs2, lr=5e-4, spec=spec2,
                       phase_anchor_periods=0 if cycles else anchor_k,
                       anchor_cycles=cycles, init_params=p1,
                       select_anchor_k=select_k, dense_anchor=dense_anchor,
                       jitter_anchor=jitter, consistent_time_base=consistent)
    p2, h2 = train_predprey(run2, log=None)
    out = {
        "anchor_k": anchor_k,
        "select_k": select_k,
        "dense_anchor": dense_anchor,
        "solver_mode": solver_mode,
        "stage1_final_train": h1["train"][-1],
        "stage1_final_test_extrap": h1["test"][-1],
        "stage2_final_train_anchored": h2["train"][-1],
        "final_test_extrap": h2["test"][-1],
        "selected_test_extrap": _extrap_mse(p2, run2.spec),
        "min_test_extrap_stage2": min(h2["test"]),
        "wall_seconds": h1["wall_seconds"] + h2["wall_seconds"],
        "epochs": [epochs1, epochs2],
    }
    print(tag or f"two_stage_k{anchor_k}", json.dumps(out))
    return out


def run_traj_config(n_traj=64, epochs=10_000):
    """Trajectory-population training (the TPU-native capability the
    reference's mutable buffers forbid): learn the field from n_traj
    initial conditions in a neighbourhood of the canonical x0=(1,1)
    (included in the population), then test FINAL-model extrapolation on
    the canonical trajectory."""
    from fetode_tpu.train.traj_driver import TrajParallelRun, train_traj_parallel

    run = TrajParallelRun(n_traj=n_traj, epochs=epochs, epochs_per_call=200,
                          x0_low=0.75, x0_high=1.5)
    params, hist = train_traj_parallel(run, log=None)
    task = run.task
    ts, _, truth = generate_data(task)
    eval_spec = run.spec._replace(max_steps=4 * run.spec.max_steps,
                                  solver_mode="while")
    pred = predict(params, eval_spec, jnp.asarray([task.x0, task.y0]), ts)
    final_test = float(jnp.mean((pred[task.n_train:] - truth[task.n_train:]) ** 2))
    window_mse = float(jnp.mean((pred[: task.n_train] - truth[: task.n_train]) ** 2))
    out = {
        "final_train_population": hist["train"][-1],
        "final_window_mse_canonical": window_mse,
        "final_test_extrap": final_test,
        "wall_seconds": hist["wall_seconds"],
        "epochs_per_sec": hist["epochs_per_sec"],
        "traj_epochs_per_sec": hist["traj_epochs_per_sec"],
        "n_traj": n_traj,
        "epochs": epochs,
    }
    print("traj", json.dumps(out))
    return out


def run_config(name, kw, epochs=10_000):
    run = PredPreyRun(epochs=epochs, **kw)
    params, hist = train_predprey(run, log=None)

    # Best-params extrapolation MSE under the tight eval solver.
    task = run.task
    ts, _, truth = generate_data(task)
    eval_spec = run.spec._replace(max_steps=4 * run.spec.max_steps,
                                  solver_mode="while")
    pred = predict(params, eval_spec, jnp.asarray([task.x0, task.y0]), ts)
    best_test = float(jnp.mean((pred[task.n_train:] - truth[task.n_train:]) ** 2))

    out = {
        "final_train": hist["train"][-1],
        "final_test_extrap": hist["test"][-1],
        "best_snapshot_test_extrap": best_test,
        "min_test_extrap": min(hist["test"]),
        "wall_seconds": hist["wall_seconds"],
        "epochs_per_sec": hist["epochs_per_sec"],
        "budgets": sorted(set(hist["budget"])),
        "budget_curve": {str(e): b for e, b in
                         zip(hist["epoch"], hist["budget"])
                         if b != hist["budget"][0] or e <= hist["epoch"][0]},
        "epochs": epochs,
        "knobs": {k: (v if isinstance(v, (int, float, bool, str, list,
                                          tuple, type(None))) else repr(v))
                  for k, v in kw.items()},
        "test_curve": {str(e): t for e, t in
                       zip(hist["epoch"][::10], hist["test"][::10])},
    }
    print(name, json.dumps({k: out[k] for k in
                            ("final_train", "final_test_extrap",
                             "best_snapshot_test_extrap", "epochs_per_sec",
                             "budgets")}))
    return out


def main():
    names = sys.argv[1:] or list(CONFIGS)
    here = os.path.dirname(__file__)
    path = os.path.join(here, "predprey_flagship_ablation.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)
    for name in names:
        if name == "traj":
            results[name] = run_traj_config()
        elif name == "two_stage":
            results[name] = run_two_stage()
        elif name == "two_stage_k3":
            results[name] = run_two_stage(anchor_k=3)
        elif name == "two_stage_selected":
            results[name] = run_two_stage(select_k=3, solver_mode="pallas",
                                          tag="two_stage_selected")
        elif name == "consistent_plain":
            # THE flagship quality run: the reference's exact objective
            # (10k epochs, plain window fit, no anchoring) on the
            # consistent time base — fit at the times the 35 targets were
            # actually sampled (see PredPreyRun.consistent_time_base; the
            # reference's skewed t_learn grid is what held extrapolation
            # at 0.037+).  Measured: final extrapolation 1.2e-5.
            from fetode_tpu.models.predprey import PredPreyNODE
            spec = PredPreyNODE.kanfet(max_steps=256)._replace(
                solver_mode="pallas")
            results[name] = run_config(name, dict(
                spec=spec, consistent_time_base=True))
        elif name == "consistent_seeds":
            # Seed-stability of the flagship quality run: same config as
            # consistent_plain at three other seeds.
            from fetode_tpu.models.predprey import PredPreyNODE
            spec = PredPreyNODE.kanfet(max_steps=256)._replace(
                solver_mode="pallas")
            results[name] = {
                f"seed{s}": run_config(f"consistent_seed{s}", dict(
                    spec=spec, consistent_time_base=True, seed=s))
                for s in (1, 2, 3)}
        elif name == "two_stage_consistent":
            # Consistent fit-window time base (the measured root cause of
            # the 0.037 floor: the reference hands the solver times 2.2%
            # slower than the times its targets were sampled at — see
            # PredPreyRun.consistent_time_base).  Same two-stage anchored
            # recipe as two_stage_dense, clock fixed.
            results[name] = run_two_stage(anchor_k=3, dense_anchor=4,
                                          solver_mode="pallas",
                                          stage2_scan=True, consistent=True,
                                          tag="two_stage_consistent")
        elif name == "two_stage_jitter":
            # Stochastic collocation: dense spline targets at FRESH
            # jittered times every call — the measured fix for
            # collocation overfitting (dense_anchor_diag.json: fixed-grid
            # anchored MSE 0.002 vs offset-grid 0.044).
            results[name] = run_two_stage(anchor_k=3, dense_anchor=4,
                                          solver_mode="pallas",
                                          stage2_scan=True, jitter=True,
                                          tag="two_stage_jitter")
        elif name == "two_stage_dense":
            # Stage 1: plain window fit on the in-kernel adjoint path.
            # Stage 2: spline-densified (4x) window anchored at cycles
            # 0..3 — dense targets constrain the sub-sample spike phase
            # every sampled objective leaves free (scan mode: the dense
            # grid has 545 output times).
            results[name] = run_two_stage(anchor_k=3, dense_anchor=4,
                                          solver_mode="pallas",
                                          stage2_scan=True,
                                          tag="two_stage_dense")
        else:
            results[name] = run_config(name, CONFIGS[name])
        with open(path, "w") as fh:
            json.dump(results, fh, indent=2)
    # The flagship quality run recorded for bench/BASELINE: the two-stage
    # recipe (plain reference-objective 10k fit -> periodicity-anchored
    # fine-tune) if present, else the plain baseline.
    best_name = next((n for n in ("consistent_plain", "two_stage_consistent",
                                  "two_stage_selected", "two_stage",
                                  "two_stage_k3", "baseline")
                      if n in results), None)
    if best_name:
        r = results[best_name]
        flat = {
            "config": best_name,
            "final_train": r.get("stage1_final_train", r.get("final_train")),
            "final_test_extrap": r.get("final_test_extrap"),
            "selected_test_extrap": r.get("selected_test_extrap"),
            "min_test_extrap": r.get("min_test_extrap_stage2",
                                     r.get("min_test_extrap")),
            "wall_seconds": r.get("wall_seconds"),
        }
        with open(os.path.join(here, "predprey_10k_run.json"), "w") as fh:
            json.dump(flat, fh, indent=2)


if __name__ == "__main__":
    main()
