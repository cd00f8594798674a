"""Trajectory-parallel predprey training: batched initial conditions
sharded over the device mesh.

The TPU-native upgrade the reference's architecture forbids (SURVEY.md
§2.5(b)): its ferro bases mutate per-call module buffers, so it trains ONE
trajectory at a time (``train_kanfet_node_predprey.py`` fits a single x0).
Here the hysteresis state is an explicit pytree, so a *population* of
initial conditions trains in one jitted step — ``vmap`` over trajectories
inside the loss, the trajectory axis sharded over the mesh's ``data`` axis
(GSPMD turns the mean-loss gradient into an implicit all-reduce over ICI),
KAN weights optionally tensor-sharded over ``model``.

Single-chip this is the batched-training throughput workload; multi-chip
it is the scaling path (the driver's ``dryrun_multichip`` runs exactly
this step on a dp x tp mesh).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from fetode_tpu.models.predprey import (
    PredPreyNODE,
    PredPreyTask,
    lotka_volterra_field,
    predprey_init,
    trajectory_loss,
)
from fetode_tpu.parallel import (
    batch_sharding,
    kan_stack_param_specs,
    make_mesh,
    shard_params,
)
from fetode_tpu.solvers import odeint_dopri5
from fetode_tpu.train.loop import init_state, make_epoch_scanner
from fetode_tpu.train.optim import make_optimizer


@dataclass
class TrajParallelRun:
    task: PredPreyTask = PredPreyTask()
    spec: PredPreyNODE = None
    n_traj: int = 256
    x0_low: float = 0.5
    x0_high: float = 2.0
    lr: float = 2e-3
    epochs: int = 1000
    epochs_per_call: int = 50
    seed: int = 0
    grad_clip: float = 1.0
    cosine_decay: bool = True
    # Pin x0s[0] to the task's canonical initial condition so the
    # single-trajectory workload is a strict subset of the population.
    include_canonical: bool = True
    # Mesh: None = single device (no sharding); otherwise the number of
    # devices to use, with model_axis-way tensor parallelism inside it.
    n_devices: int = None
    model_axis: int = 1
    dtype: object = jnp.float32

    def __post_init__(self):
        if self.spec is None:
            self.spec = PredPreyNODE.kanfet()


def make_batched_data(run: TrajParallelRun):
    """Sample x0s and solve the ground-truth LV system per trajectory
    (tight-tolerance dopri5, one vmapped batched solve)."""
    task = run.task
    ts_learn = jnp.linspace(0.0, task.tf_learn, task.n_train, run.dtype)
    key = jax.random.PRNGKey(run.seed)
    x0s = jax.random.uniform(key, (run.n_traj, 2), run.dtype,
                             run.x0_low, run.x0_high)
    if run.include_canonical:
        x0s = x0s.at[0].set(jnp.asarray([task.x0, task.y0], run.dtype))
    field = lotka_volterra_field(task)
    solve = lambda x0: odeint_dopri5(field, x0, ts_learn, rtol=1e-8,
                                     atol=1e-10, max_steps=2048, mode="while")
    targets = jax.jit(jax.vmap(solve))(x0s)
    return ts_learn, x0s, targets


def train_traj_parallel(run: TrajParallelRun, log=print):
    """Train on a population of trajectories; returns (params, history)."""
    spec = run.spec
    ts_learn, x0s, targets = make_batched_data(run)

    params = predprey_init(jax.random.PRNGKey(run.seed), spec, run.dtype)
    lr = run.lr
    if run.cosine_decay:
        import optax
        lr = optax.cosine_decay_schedule(run.lr, run.epochs, alpha=0.05)
    tx = make_optimizer(lr, kind="adam", grad_clip=run.grad_clip,
                        params=params)

    mesh = None
    if run.n_devices is not None:
        mesh = make_mesh(run.n_devices, model=run.model_axis)
        specs = (kan_stack_param_specs(params) if run.model_axis > 1 else None)
        params = shard_params(params, mesh, specs)
        data_shard = batch_sharding(mesh)
        x0s = jax.device_put(x0s, data_shard)
        targets = jax.device_put(targets, data_shard)

    state = init_state(params, tx)

    if spec.solver_mode == "pallas" and mesh is not None and run.model_axis > 1:
        raise ValueError("solver_mode='pallas' shards trajectories over "
                         "'data' only; tensor parallelism needs scan mode")
    if spec.solver_mode == "pallas":
        # The whole-solve adjoint kernel is natively batched (trajectories
        # on the lane axis, per-lane step control) — solve the population
        # in one kernel call instead of vmapping per-trajectory solves.
        # On a mesh, shard_map runs the kernel per device over the 'data'
        # axis; the shard_map transpose psums the replicated-param grads.
        from fetode_tpu.ops.pallas_adjoint import (
            pallas_kanfet_solve_train,
            pallas_kanfet_solve_train_sharded,
        )

        def loss_fn(p, x0s_, targets_):
            if mesh is not None:
                pred = pallas_kanfet_solve_train_sharded(
                    p, spec.kan, x0s_, ts_learn, mesh, rtol=spec.rtol,
                    atol=spec.atol, max_steps=spec.max_steps)
            else:
                pred = pallas_kanfet_solve_train(
                    p, spec.kan, x0s_, ts_learn, rtol=spec.rtol,
                    atol=spec.atol, max_steps=spec.max_steps)
            return jnp.mean((pred - targets_) ** 2)
    else:
        def loss_fn(p, x0s_, targets_):
            losses = jax.vmap(
                lambda x0, tgt: trajectory_loss(p, spec, x0, ts_learn, tgt)
            )(x0s_, targets_)
            return jnp.mean(losses)

    scanner = make_epoch_scanner(loss_fn, tx, run.epochs_per_call)

    history = {"train": [], "epoch": []}
    n_calls = run.epochs // run.epochs_per_call
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        for call in range(n_calls):
            state, losses = scanner(state, x0s, targets)
            tr = float(losses[-1])
            history["train"].append(tr)
            history["epoch"].append((call + 1) * run.epochs_per_call)
            if log is not None:
                log(f"epoch {history['epoch'][-1]:6d}  batch-train {tr:.6f}")
    history["wall_seconds"] = time.perf_counter() - t0
    history["epochs_per_sec"] = run.epochs / history["wall_seconds"]
    history["traj_epochs_per_sec"] = (run.epochs * run.n_traj
                                      / history["wall_seconds"])
    return state.params, history
