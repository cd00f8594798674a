"""End-to-end predator-prey trainer (the north-star run).

Mirrors the reference's published configuration
(``train_kanfet_node_predprey.py:20-27``: lr 2e-3, Adam, 10k epochs,
KANFET [2,10,2] grid 5, dopri5) as a scan-of-epochs jit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

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

    def __post_init__(self):
        if self.spec is None:
            self.spec = PredPreyNODE.kanfet()


def train_predprey(run: PredPreyRun, log=print):
    """Train; returns (params, history dict)."""
    task, spec = run.task, run.spec
    ts, ts_learn, truth = generate_data(task, run.dtype)
    target_train = truth[: task.n_train]
    x0 = jnp.asarray([task.x0, task.y0], run.dtype)

    params = predprey_init(jax.random.PRNGKey(run.seed), spec, run.dtype)
    lr = run.lr
    if run.cosine_decay:
        import optax
        lr = optax.cosine_decay_schedule(run.lr, run.epochs, alpha=0.05)
    tx = make_optimizer(lr, kind="adam", grad_clip=run.grad_clip,
                        params=params)
    state = init_state(params, tx)

    def loss_fn(p, x0_, ts_, target_):
        return trajectory_loss(p, spec, x0_, ts_, target_)

    scanner = make_epoch_scanner(loss_fn, tx, run.epochs_per_call)

    eval_spec = spec._replace(max_steps=4 * spec.max_steps, solver_mode="while")

    @jax.jit
    def test_loss(p):
        pred = predict(p, eval_spec, x0, ts)
        return jnp.mean((pred[task.n_train:] - truth[task.n_train:]) ** 2)

    history = {"train": [], "test": [], "epoch": []}
    best = (jnp.inf, state.params)
    n_calls = run.epochs // run.epochs_per_call
    t0 = time.perf_counter()
    for call in range(n_calls):
        state, losses = scanner(state, x0, ts_learn, target_train)
        tr = float(losses[-1])
        history["train"].append(tr)
        history["epoch"].append((call + 1) * run.epochs_per_call)
        if run.eval_every_call:
            te = float(test_loss(state.params))
            history["test"].append(te)
        if tr < best[0]:
            best = (tr, state.params)
        if log is not None:
            msg = f"epoch {history['epoch'][-1]:6d}  train {tr:.6f}"
            if run.eval_every_call:
                msg += f"  test {history['test'][-1]:.6f}"
            log(msg)
    history["wall_seconds"] = time.perf_counter() - t0
    history["epochs_per_sec"] = run.epochs / history["wall_seconds"]
    return best[1], history
