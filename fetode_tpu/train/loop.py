"""Generic jitted training-step and epoch-scan builders.

The reference's epoch loops are Python ``for`` loops dispatching one torch
graph per epoch; here a whole block of epochs is one ``lax.scan`` inside
one jit — a single device dispatch executes hundreds of full
solve+grad+update epochs (the main wall-clock win on TPU).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_state(params, tx) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(loss_fn: Callable, tx) -> Callable:
    """``loss_fn(params, *batch) -> scalar`` (or ``(scalar, aux)``).

    Returns a pure step ``(state, *batch) -> (state, loss[, aux])``.
    """
    def step(state: TrainState, *batch):
        out = jax.value_and_grad(loss_fn, has_aux=False)(state.params, *batch)
        loss, grads = out
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def make_epoch_scanner(loss_fn: Callable, tx, n_epochs_per_call: int) -> Callable:
    """Jit one function that runs ``n_epochs_per_call`` full-batch epochs.

    Use for full-batch workloads (predprey): one dispatch, many epochs.
    Returns ``fn(state, *batch) -> (state, losses[n])``.
    """
    step = make_train_step(loss_fn, tx)

    @jax.jit
    def run(state: TrainState, *batch):
        def body(s, _):
            s, loss = step(s, *batch)
            return s, loss
        return jax.lax.scan(body, state, None, length=n_epochs_per_call)

    return run


def make_minibatch_epoch(loss_fn: Callable, tx, *, keyed: bool = False) -> Callable:
    """Jit one function that scans a pre-batched epoch of minibatches.

    ``fn(state, batches) -> (state, losses)`` where every leaf of
    ``batches`` has leading axis (n_batches, batch_size, ...).

    With ``keyed=True`` the loss takes a PRNG key —
    ``loss_fn(params, key, *batch)`` — and the epoch function becomes
    ``fn(state, key, batches)``: the key is split so EVERY training step
    observes a fresh, independent key.  This is how stochastic
    per-evaluation device noise (the reference's
    ``torch.randn_like(...).detach()`` on every basis forward,
    ``ferro_class.py:309-310``) is threaded without hidden global RNG.
    """
    if not keyed:
        step = make_train_step(loss_fn, tx)

        @jax.jit
        def run(state: TrainState, batches):
            def body(s, batch):
                s, loss = step(s, *batch)
                return s, loss
            return jax.lax.scan(body, state, batches)

        return run

    step = make_train_step(lambda p, key, *batch: loss_fn(p, key, *batch), tx)

    @jax.jit
    def run_keyed(state: TrainState, key, batches):
        n_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
        keys = jax.random.split(key, n_batches)

        def body(s, key_batch):
            k, batch = key_batch
            s, loss = step(s, k, *batch)
            return s, loss

        return jax.lax.scan(body, state, (keys, batches))

    return run_keyed


def make_minibatch_epochs_scanner(loss_fn: Callable, tx, *,
                                  keyed: bool = False) -> Callable:
    """Like :func:`make_minibatch_epoch`, but a whole BLOCK of epochs is
    one dispatch: every leaf of ``epoch_batches`` has leading axes
    ``(n_epochs, n_batches, batch_size, ...)`` — per-epoch reshuffles are
    prepared on host and stacked.  Returns ``fn(state, epoch_batches) ->
    (state, losses[n_epochs, n_batches])`` (keyed: ``fn(state, key,
    epoch_batches)``; epoch ``e`` consumes ``jax.random.split(key,
    n_epochs)[e]``, exactly matching ``make_minibatch_epoch`` called
    sequentially with those keys).

    Small-model minibatch training is dispatch-latency-bound on TPU
    (one host→device round trip per epoch); blocking epochs amortises it
    the same way :func:`make_epoch_scanner` does for full-batch work.
    """
    if not keyed:
        step = make_train_step(loss_fn, tx)

        @jax.jit
        def run(state: TrainState, epoch_batches):
            def body(s, batch):
                s, loss = step(s, *batch)
                return s, loss

            def epoch(s, batches):
                return jax.lax.scan(body, s, batches)

            return jax.lax.scan(epoch, state, epoch_batches)

        return run

    step = make_train_step(lambda p, key, *batch: loss_fn(p, key, *batch), tx)

    @jax.jit
    def run_keyed(state: TrainState, key, epoch_batches):
        n_epochs = jax.tree_util.tree_leaves(epoch_batches)[0].shape[0]

        def body(s, key_batch):
            k, batch = key_batch
            s, loss = step(s, k, *batch)
            return s, loss

        def epoch(s, ekey_batches):
            ekey, batches = ekey_batches
            n_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
            keys = jax.random.split(ekey, n_batches)
            return jax.lax.scan(body, s, (keys, batches))

        ekeys = jax.random.split(key, n_epochs)
        return jax.lax.scan(epoch, state, (ekeys, epoch_batches))

    return run_keyed


def make_population_epochs_scanner(loss_fn: Callable, tx) -> Callable:
    """Population (vmapped-config) training: P independent runs in ONE
    device dispatch.

    The sequential study this replaces (the reference's clean-vs-noisy
    harness, ``compare_noise_ecg.py:1250-1452``; repo twin
    ``ecg_driver.compare_noise``) trains seeds x noise-levels one run at a
    time — and each run is latency-bound at <0.4% of either chip peak
    (round-3 roofline), so N sequential runs waste ~N x the hardware.  A
    population axis turns the study into one program: every member is an
    independent (params, opt_state, key, data-shuffle, config) tuple and
    ``vmap`` stacks them into batched compute.

    ``loss_fn(params, key, extra, *batch) -> scalar`` per member, where
    ``extra`` is the member's traced config pytree (e.g. a device-noise
    std scalar).  Returns ``fn(states, keys, extras, epoch_batches) ->
    (states, losses[P, n_epochs, n_batches])`` with every argument
    carrying a leading population axis P.  Key-splitting per member is
    IDENTICAL to :func:`make_minibatch_epochs_scanner` (keyed), so member
    curves are bit-comparable to running that scanner per config.
    """
    step = make_train_step(
        lambda p, key, extra, *batch: loss_fn(p, key, extra, *batch), tx)

    def run_one(state: TrainState, key, extra, epoch_batches):
        def body(s, key_batch):
            k, batch = key_batch
            s, loss = step(s, k, extra, *batch)
            return s, loss

        def epoch(s, ekey_batches):
            ekey, batches = ekey_batches
            n_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
            keys = jax.random.split(ekey, n_batches)
            return jax.lax.scan(body, s, (keys, batches))

        n_epochs = jax.tree_util.tree_leaves(epoch_batches)[0].shape[0]
        ekeys = jax.random.split(key, n_epochs)
        return jax.lax.scan(epoch, state, (ekeys, epoch_batches))

    return jax.jit(jax.vmap(run_one))
