"""End-to-end predator-prey trainer (the north-star run).

Mirrors the reference's published configuration
(``train_kanfet_node_predprey.py:20-27``: lr 2e-3, Adam, 10k epochs,
KANFET [2,10,2] grid 5, dopri5) as a scan-of-epochs jit, plus three
things the reference's loop lacks:

* **KAN regularization** (``reg_lambda``): the L1+entropy penalty of
  ``efficientkan.py:254-270`` applied to the training loss — tames the
  field outside the data window so the *final* model extrapolates stably
  instead of only snapshot-selected intermediates.
* **Validation-window best-model selection** (``val_points``): the last
  ``val_points`` points of the reference's 35-point learn window are held
  out of the fit and used as the best-snapshot criterion — a principled
  selection signal the training loop can act on without peeking at the
  extrapolation region.
* **Adaptive step-budget schedule** (``step_budget_schedule``): training
  starts with a small dopri5 step budget (cheap scan) and escalates
  toward ``spec.max_steps`` only when a cheap post-call probe shows the
  solver near budget exhaustion.  Measured accepted-step counts are 18-35
  at init and ~86 late in training, so most epochs never need the full
  256-step scan the flat config pays for.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fetode_tpu.models.predprey import (
    PredPreyNODE,
    PredPreyTask,
    generate_data,
    predict,
    predprey_init,
    trajectory_loss,
)
from fetode_tpu.nn.kan import kan_regularization, kan_update_grid
from fetode_tpu.train.loop import init_state, make_epoch_scanner
from fetode_tpu.train.optim import make_optimizer


@dataclass
class PredPreyRun:
    task: PredPreyTask = PredPreyTask()
    spec: PredPreyNODE = None  # default: KANFET [2,10,2]
    lr: float = 2e-3
    epochs: int = 10_000
    epochs_per_call: int = 100
    seed: int = 0
    eval_every_call: bool = True
    dtype: object = jnp.float32
    # Stability (the reference trains bare Adam at 2e-3 and its loss curves
    # oscillate wildly; a mid-training field blow-up can exhaust the
    # adaptive step budget and kill gradients): clip + cosine decay.
    grad_clip: float = 1.0
    cosine_decay: bool = True
    # Extrapolation stability / model selection (see module docstring).
    reg_lambda: float = 0.0
    val_points: int = 0
    # Step-budget schedule: ladder of max_steps budgets ending at
    # spec.max_steps; escalates when a probe shows near-exhaustion.
    step_budget_schedule: bool = False
    budget_headroom: float = 0.75   # escalate when steps used > this frac
    # Every N calls, refit KAN grids to the empirical state distribution
    # along the current predicted trajectory (update_grid live in training,
    # the efficientkan.py:184-221 capability; 0 disables).
    grid_update_every: int = 0
    # Warm start: resume from previously trained params (e.g. a plain
    # window-fit run) instead of a fresh init — the two-stage recipe
    # "fit the window, then anchor the period" trains each objective at
    # its natural difficulty.
    init_params: object = None
    # Multiple shooting (0 disables): split the fit window into segments of
    # `shooting_points` consecutive samples (overlapping by one), each
    # solved IN PARALLEL from its first sample's OBSERVED value.  Sequential
    # solver depth per epoch drops by the segment count while the segment
    # solves ride a vmap — the TPU-native trade of sequential latency for
    # parallel width.  Requires (n_train-1) % (shooting_points-1) == 0.
    shooting_points: int = 0
    # Parallel-IN-TIME over the device mesh (0 disables; requires
    # shooting_points > 1): shard the shooting-segment axis over the mesh
    # 'data' axis so each device integrates its own TIME segments — the
    # time-chunked pipelining across devices SURVEY §5.7 names as the
    # honest TPU equivalent of sequence parallelism for ODE workloads
    # (the sequential dimension here is integration time, not attention
    # length).  GSPMD parallelizes the vmapped segment solves from the
    # input sharding alone; requires n_segments % shooting_devices == 0.
    shooting_devices: int = 0
    # Best-model selection by HELD-OUT anchored loss (0 disables): every
    # eval, solve out to ts_learn + k*T_hat and score against the window
    # targets (data-implied, never part of the training objective when
    # k != phase_anchor_periods).  Measured motivation: anchored training
    # converges its own loss to ~1.2e-3 while the extrapolation MSE
    # oscillates 0.005-0.09 between eval points — train/val criteria can't
    # see which oscillation phase extrapolates well, but a FARTHER-out
    # anchor can (phase error grows linearly in horizon).
    select_anchor_k: int = 0
    # Dense anchoring (0 disables): upsample the fit window `dense_anchor`x
    # by cubic-spline interpolation of the OBSERVED samples (log-space when
    # all targets are positive — LV populations are — so the sharp spikes
    # interpolate smoothly).  Measured reconstruction error of the spline
    # against dense ground truth: MSE 7.6e-9 (max 6.1e-4), i.e. the
    # densified targets are effectively exact.  Constrains sub-sample
    # trajectory shape between the 35 observed points.  (Historical note:
    # densification alone could NOT beat the 0.037 extrapolation floor —
    # that floor was the reference's time-base mismatch, see
    # consistent_time_base and benchmarks/run_time_base_probe.py.)
    dense_anchor: int = 0
    # Stochastic collocation (requires dense_anchor > 0): resample the
    # dense fit times EVERY call by stratified jitter inside the window
    # (targets come from the spline, which is valid anywhere in the
    # window, not only on a fixed grid).  Motivation, measured
    # (benchmarks/dense_anchor_diag.json): with FIXED collocation times
    # the optimizer threads the trajectory through exactly those times
    # (anchored-grid MSE 0.002) while deviating in between (offset
    # test-grid MSE 0.044, zero train/eval solver gap) — classic
    # Goodharting of a fixed collocation grid.  A moving grid leaves no
    # fixed pattern to overfit; matching the continuum is the only
    # optimum.
    jitter_anchor: bool = False
    # Periodicity-anchored training (0 disables): the 35-point learn window
    # covers one FULL Lotka-Volterra period (T ~ 3.317 < 3.5), so the train
    # data itself implies target values at t + k*T.  Fitting the window
    # AND its k-period shift pins the learned orbit's period — the sole
    # driver of extrapolation error (a period error dT produces a phase lag
    # k*dT after k cycles, which is what the reference's own converged
    # plots show).  Uses ONLY train-window data; the anchor period is
    # measured from a dense solve of the ground truth over [0, tf_learn].
    phase_anchor_periods: int = 0
    # Explicit anchor shifts (overrides phase_anchor_periods when set):
    # the fit window is additionally supervised at t + j*T for every j in
    # the tuple, e.g. (1, 2, 3) pins the orbit phase at every cycle the
    # extrapolation test covers instead of only the k-th.
    anchor_cycles: tuple = ()
    # Durable checkpoint/resume (orbax; completes the reference's broken
    # persistence, predator_prey.py:123-124): save (train state, best
    # snapshot, budget stage) every `ckpt_every` epochs into `ckpt_dir`;
    # `resume=True` restores the latest checkpoint and continues the run
    # EXACTLY (full-batch Adam is deterministic, state.step carries the
    # cosine schedule, and the jitter_anchor host RNG is fast-forwarded),
    # so a preempted 10k-epoch run loses at most ckpt_every epochs.
    ckpt_dir: str = ""
    ckpt_every: int = 0          # epochs between saves (0 = off)
    resume: bool = False
    # AOT executable cache dir ("" = off): the epoch-scanner grad program
    # is loaded from / stored to disk as a serialized compiled executable
    # (serve.py: AotCache), skipping the per-process Mosaic remote
    # compile entirely on repeat runs of the same config (the axon path
    # bypasses jax's persistent HLO cache — docs/ROADMAP.md).
    aot_cache: str = ""
    # Fit-window time base.  The reference trains against targets sampled
    # on t = linspace(0, tf, N_t) (spacing tf/(N_t-1) = 0.10072) but hands
    # the solver t_learn = linspace(0, tf_learn, N_t_train) (spacing
    # 0.10294) — a 2.2% clock mismatch between target times and solver
    # times (train_kanfet_node_predprey.py:50,153,155: soln_arr over `t`,
    # soln_arr_train = soln_arr[:35], t_learn a DIFFERENT linspace).  The
    # mismatch puts a hard floor under extrapolation: the taught clock
    # runs 2.2% slow, and the floor measures MSE 0.0374 (exactly the
    # observed anchored-training plateau; model-free measurement —
    # spline-on-t_learn vs truth-on-true-times).  True  = fit at the
    # times the targets were actually sampled (ts[:n_train]); False = the
    # reference-faithful grids, kept for parity runs.
    consistent_time_base: bool = False

    def __post_init__(self):
        if self.spec is None:
            self.spec = PredPreyNODE.kanfet()


def _budget_ladder(max_steps: int) -> list:
    """E.g. 256 -> [64, 128, 256]; never below 32."""
    ladder = [max_steps]
    while ladder[0] // 2 >= 32:
        ladder.insert(0, ladder[0] // 2)
    return ladder[-3:]


def _estimate_period(task: PredPreyTask, dtype) -> float:
    """Orbit period from a dense ground-truth solve over the TRAIN window
    only ([0, tf_learn]): the first return of the trajectory to x0 after
    t > tf_learn/2.  Requires tf_learn to cover >= 1 period (true for the
    reference's published task: T ~ 3.317 < 3.5)."""
    import numpy as np

    from fetode_tpu.solvers import odeint_dopri5
    from fetode_tpu.models.predprey import lotka_volterra_field

    n_dense = 4001
    ts = jnp.linspace(0.0, task.tf_learn, n_dense, dtype)
    y0 = jnp.asarray([task.x0, task.y0], dtype)
    traj = np.asarray(odeint_dopri5(lotka_volterra_field(task), y0, ts,
                                    rtol=1e-10, atol=1e-12, max_steps=8192,
                                    mode="while"))
    d = np.linalg.norm(traj - np.asarray(y0), axis=1)
    half = n_dense // 2
    i = half + int(np.argmin(d[half:]))
    if d[i] > 0.05:
        raise ValueError("train window does not cover a full period; "
                         "phase_anchor_periods requires tf_learn >= T")
    return float(ts[i])


def train_predprey(run: PredPreyRun, log=print):
    """Train; returns (params, history dict)."""
    task, spec = run.task, run.spec
    ts, ts_learn, truth = generate_data(task, run.dtype)
    target_train = truth[: task.n_train]
    x0 = jnp.asarray([task.x0, task.y0], run.dtype)

    # Optional held-out validation tail inside the learn window.
    n_fit = task.n_train - run.val_points
    ts_fit = (ts[:n_fit] if run.consistent_time_base
              else ts_learn[:n_fit])        # see the knob docstring
    target_fit = target_train[:n_fit]

    window_spline = None
    if run.dense_anchor > 0:
        # Host-side spline densification of the fit window (see the knob
        # docstring).  numpy/scipy on exact observed samples only.
        import numpy as np
        from scipy.interpolate import CubicSpline

        ts_np = np.asarray(ts_fit, np.float64)
        tgt_np = np.asarray(target_fit, np.float64)
        if np.all(tgt_np > 0):
            _cs = CubicSpline(ts_np, np.log(tgt_np), axis=0)
            window_spline = lambda t: np.exp(_cs(t))  # noqa: E731
        else:
            window_spline = CubicSpline(ts_np, tgt_np, axis=0)
        n_dense = (ts_np.shape[0] - 1) * run.dense_anchor + 1
        t_dense = np.linspace(ts_np[0], ts_np[-1], n_dense)
        ts_fit = jnp.asarray(t_dense, run.dtype)
        target_fit = jnp.asarray(window_spline(t_dense), run.dtype)

    anchor_shifts = (tuple(run.anchor_cycles) if run.anchor_cycles
                     else ((run.phase_anchor_periods,)
                           if run.phase_anchor_periods > 0 else ()))
    t_period = None
    if anchor_shifts:
        # Data-implied supervision k periods out (see the field docstring):
        # same target values, shifted output times.  The solve horizon grows
        # ~(1+max k)x, so the bounded step budget scales with it — the
        # skipped iterations of short solves cost ~nothing (dopri5 scan cond).
        t_period = _estimate_period(task, run.dtype)
        ts_aug = jnp.concatenate(
            [ts_fit] + [ts_fit + j * t_period for j in anchor_shifts])
        order = jnp.argsort(ts_aug)
        ts_fit = ts_aug[order]
        target_fit = jnp.concatenate(
            [target_fit] * (1 + len(anchor_shifts)))[order]
        spec = spec._replace(
            max_steps=(1 + max(anchor_shifts)) * spec.max_steps)

    resample_fit = None
    if run.jitter_anchor:
        if window_spline is None:
            raise ValueError("jitter_anchor requires dense_anchor > 0")
        import numpy as np

        t_grid = t_dense     # the pre-shift dense window grid
        h_j = float(t_grid[1] - t_grid[0])
        rng = np.random.default_rng(run.seed + 17)

        def resample_fit():
            # interior points jittered within +-0.49h: order preserved,
            # endpoints pinned, fresh continuum sample every call
            t_w = t_grid.copy()
            t_w[1:-1] = t_w[1:-1] + rng.uniform(
                -0.49, 0.49, t_grid.shape[0] - 2) * h_j
            tg = window_spline(t_w)
            if anchor_shifts:
                t_all = np.concatenate(
                    [t_w] + [t_w + j * t_period for j in anchor_shifts])
                order = np.argsort(t_all)
                tg = np.concatenate([tg] * (1 + len(anchor_shifts)))[order]
                t_all = t_all[order]
            else:
                t_all = t_w
            return (x0, jnp.asarray(t_all, run.dtype),
                    jnp.asarray(tg, run.dtype))

    params = (run.init_params if run.init_params is not None
              else predprey_init(jax.random.PRNGKey(run.seed), spec, run.dtype))
    lr = run.lr
    if run.cosine_decay:
        import optax
        lr = optax.cosine_decay_schedule(run.lr, run.epochs, alpha=0.05)
    tx = make_optimizer(lr, kind="adam",
                        grad_clip=run.grad_clip if run.grad_clip > 0 else None,
                        params=params)
    state = init_state(params, tx)

    budgets = (_budget_ladder(spec.max_steps) if run.step_budget_schedule
               and spec.method == "dopri5" else [spec.max_steps])

    # Multiple shooting: segment the fit window, solve all segments in
    # parallel from their observed starting values.
    fit_args = (x0, ts_fit, target_fit)
    spec_shoot = None
    if run.shooting_points > 1:
        if anchor_shifts or run.step_budget_schedule:
            raise ValueError("shooting_points is incompatible with "
                             "anchoring / step_budget_schedule")
        import numpy as np
        P = run.shooting_points
        n_pts = int(ts_fit.shape[0])
        if (n_pts - 1) % (P - 1):
            raise ValueError(f"(n_fit-1)={n_pts - 1} intervals not divisible "
                             f"by shooting_points-1={P - 1}")
        n_seg = (n_pts - 1) // (P - 1)
        idx = np.stack([np.arange(i * (P - 1), i * (P - 1) + P)
                        for i in range(n_seg)])
        # Per-segment step budget: proportional share of the full budget
        # with 4x headroom (segments are short; the scan is n_seg x shorter).
        seg_budget = max(32, int(4 * spec.max_steps * (P - 1) / (n_pts - 1)))
        spec_shoot = spec._replace(max_steps=seg_budget)
        fit_args = (target_fit[idx[:, 0]], ts_fit[idx], target_fit[idx])
        if run.shooting_devices > 0:
            # Parallel-in-time: place the segment axis on the mesh 'data'
            # axis; XLA's partitioner runs each device's segment solves
            # concurrently (no code change to the loss — sharding is data).
            from fetode_tpu.parallel.mesh import batch_sharding, make_mesh
            if n_seg % run.shooting_devices:
                raise ValueError(f"{n_seg} shooting segments not divisible "
                                 f"by shooting_devices={run.shooting_devices}")
            sh = batch_sharding(make_mesh(run.shooting_devices))
            fit_args = tuple(jax.device_put(a, sh) for a in fit_args)
    elif run.shooting_devices > 0:
        raise ValueError("shooting_devices requires shooting_points > 1")

    def make_scanner(budget):
        spec_b = spec._replace(max_steps=budget)

        def loss_fn(p, x0_, ts_, target_):
            if spec_shoot is not None:
                pred = jax.vmap(
                    lambda x0s, tss: predict(p, spec_shoot, x0s, tss)
                )(x0_, ts_)
                loss = jnp.mean((pred - target_) ** 2)
            else:
                loss = trajectory_loss(p, spec_b, x0_, ts_, target_)
            if run.reg_lambda > 0.0:
                loss = loss + run.reg_lambda * kan_regularization(p, spec.kan)
            return loss

        scan_fn = make_epoch_scanner(loss_fn, tx, run.epochs_per_call)
        if run.aot_cache:
            from fetode_tpu.serve import AotCache, CachedJit, config_hash

            # The name must pin everything the program closes over that
            # the argument shapes cannot see (CachedJit contract).
            tag = config_hash(spec_b, spec_shoot, run.lr, run.epochs,
                              run.epochs_per_call, run.reg_lambda,
                              run.grad_clip, run.cosine_decay)
            scan_fn = CachedJit(AotCache(run.aot_cache),
                                f"predprey-epoch-{tag}", scan_fn)
        return scan_fn

    def make_probe(budget):
        pspec = spec._replace(max_steps=budget, solver_mode="while")

        @jax.jit
        def probe(p):
            _, stats = predict(p, pspec, x0, ts_fit, full_output=True)
            return stats.n_accepted + stats.n_rejected, stats.success

        return probe

    eval_spec = spec._replace(max_steps=4 * spec.max_steps, solver_mode="while")

    @jax.jit
    def test_loss(p):
        pred = predict(p, eval_spec, x0, ts)
        return jnp.mean((pred[task.n_train:] - truth[task.n_train:]) ** 2)

    @jax.jit
    def val_loss(p):
        pred = predict(p, eval_spec, x0, ts_learn)
        return jnp.mean((pred[n_fit:] - target_train[n_fit:]) ** 2)

    sel_loss = None
    if run.select_anchor_k > 0:
        ks = run.select_anchor_k
        t_sel = _estimate_period(task, run.dtype)
        # t=0 must head the grid: the field is autonomous, so a solve
        # STARTED at k*T from x0 would just reproduce the window solution.
        ts_sel = jnp.concatenate([jnp.zeros((1,), run.dtype),
                                  ts_learn + ks * t_sel])
        sel_spec = spec._replace(max_steps=4 * (1 + ks) * run.spec.max_steps,
                                 solver_mode="while")

        @jax.jit
        def sel_loss(p):
            pred = predict(p, sel_spec, x0, ts_sel)
            return jnp.mean((pred[1:] - target_train) ** 2)

    stage = 0
    history = {"train": [], "test": [], "val": [], "epoch": [], "budget": []}
    best = (jnp.inf, state.params)
    n_calls = run.epochs // run.epochs_per_call

    ckpt = None
    start_call = 0
    if run.ckpt_dir and (run.ckpt_every > 0 or run.resume):
        from fetode_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(run.ckpt_dir, max_to_keep=3)
        if run.resume and ckpt.latest_step() is not None:
            template = {"state": state, "best_crit": jnp.asarray(jnp.inf),
                        "best_params": state.params,
                        "stage": jnp.asarray(0, jnp.int32)}
            saved = ckpt.restore(template=template)
            state = saved["state"]
            best = (float(saved["best_crit"]), saved["best_params"])
            stage = int(saved["stage"])
            start_call = int(state.step) // run.epochs_per_call
            if log is not None:
                log(f"[ckpt] resumed at epoch {int(state.step)} "
                    f"(budget stage {stage}) from {run.ckpt_dir}")
            if resample_fit is not None:
                # fast-forward the host jitter RNG so the resumed run
                # draws the same collocation grids the unbroken run would
                for _ in range(start_call):
                    resample_fit()

    scanner = make_scanner(budgets[stage])
    probe = (make_probe(budgets[stage])
             if len(budgets) > 1 and stage < len(budgets) - 1 else None)
    # Warm compiles OUTSIDE the timed window (results discarded; `state`
    # is an immutable pytree, so training is unaffected).  Driver-reported
    # epochs/sec previously folded 1-5 min of XLA/Mosaic compile into
    # wall_seconds, understating throughput by up to 10x on short runs.
    warm, _ = scanner(state, *fit_args)
    _ = float(test_loss(warm.params)) if run.eval_every_call else None
    _ = float(val_loss(warm.params)) if run.val_points > 0 else None
    _ = float(sel_loss(warm.params)) if sel_loss is not None else None
    del warm

    t0 = time.perf_counter()
    for call in range(start_call, n_calls):
        if resample_fit is not None:
            fit_args = resample_fit()
        state, losses = scanner(state, *fit_args)
        tr = float(losses[-1])
        history["train"].append(tr)
        history["epoch"].append((call + 1) * run.epochs_per_call)
        history["budget"].append(budgets[stage])
        if run.eval_every_call:
            te = float(test_loss(state.params))
            history["test"].append(te)
        crit = tr
        if run.val_points > 0:
            va = float(val_loss(state.params))
            history["val"].append(va)
            crit = va
        if sel_loss is not None:
            crit = float(sel_loss(state.params))
            history.setdefault("sel", []).append(crit)
        if crit < best[0]:
            best = (crit, state.params)
        if run.grid_update_every and (call + 1) % run.grid_update_every == 0 \
                and call < n_calls - 1:
            # Refit grids to the states the field actually visits (the
            # predicted trajectory over the fit window); function-preserving
            # refit keeps shapes, so the optimiser state stays valid.
            samples = predict(state.params, eval_spec, x0, ts_fit)
            state = state._replace(
                params=kan_update_grid(state.params, spec.kan, samples))
        # Escalate the step budget when the probe shows near-exhaustion
        # (or the forward no longer reaches t_final at all).
        if probe is not None and stage < len(budgets) - 1:
            used, ok = probe(state.params)
            if (not bool(ok)) or int(used) > run.budget_headroom * budgets[stage]:
                stage += 1
                scanner = make_scanner(budgets[stage])
                probe = make_probe(budgets[stage]) if stage < len(budgets) - 1 else None
                if log is not None:
                    log(f"[budget] escalating max_steps -> {budgets[stage]} "
                        f"(probe used {int(used)}, success={bool(ok)})")
        if ckpt is not None and run.ckpt_every > 0:
            epochs_done = (call + 1) * run.epochs_per_call
            if epochs_done % run.ckpt_every == 0 or call == n_calls - 1:
                ckpt.save(epochs_done,
                          {"state": state,
                           "best_crit": jnp.asarray(best[0]),
                           "best_params": best[1],
                           "stage": jnp.asarray(stage, jnp.int32)})
        if log is not None:
            msg = f"epoch {history['epoch'][-1]:6d}  train {tr:.6f}"
            if run.val_points > 0:
                msg += f"  val {history['val'][-1]:.6f}"
            if run.eval_every_call:
                msg += f"  test {history['test'][-1]:.6f}"
            log(msg)
    history["wall_seconds"] = time.perf_counter() - t0
    epochs_run = max(1, (n_calls - start_call) * run.epochs_per_call)
    history["epochs_per_sec"] = epochs_run / history["wall_seconds"]
    return best[1], history
