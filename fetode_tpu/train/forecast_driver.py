"""Forecasting trainers: point forecast + diffusion variants.

Capability parity with ``TrainConfig`` / ``train_and_predict`` and the
three near-identical diffusion trainers of the ETT/Time-MMD template
(``/root/reference/train_kan_fet_ett.py:251-408,921-1334``): AdamW, MSE
(or epsilon-loss), grad clip 1.0, best-val snapshot + restore, test MSE,
final de-standardised forecast.  One generic driver replaces the five
copy-pasted scripts; the workload is a config, not a file.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.data.timeseries import (
    Standardizer,
    make_windows,
    split_time_series,
    standardize_fit,
    window_batches,
)
from fetode_tpu.models.forecasting import (
    DiffusionForecasterSpec,
    LatentODEForecasterSpec,
    diffusion_forecaster_init,
    diffusion_forecaster_loss,
    diffusion_forecaster_sample,
    latent_ode_forecast,
    latent_ode_forecaster_init,
)
from fetode_tpu.nn.diffusion import make_schedule
from fetode_tpu.train.loop import init_state, make_minibatch_epoch
from fetode_tpu.train.optim import make_optimizer


@dataclass
class ForecastRun:
    context_len: int = 96
    pred_len: int = 8
    batch_size: int = 64
    epochs: int = 100
    lr: float = 1e-3
    weight_decay: float = 1e-4
    grad_clip: float = 1.0
    train_frac: float = 0.7
    val_frac: float = 0.1
    seed: int = 0
    log_every: int = 10
    eval_samples: int = 10   # diffusion eval averaging
    # >0: train over a ('data','model') mesh — minibatch axis sharded
    # over 'data' (grad psum via GSPMD); mesh_model>1 column-shards
    # output features over 'model' (model_param_specs), else replicate.
    mesh_devices: int = 0
    mesh_model: int = 1
    # Durable checkpoint/resume (train/checkpoint.py: DurableLoop): save
    # (train state, best snapshot[, key chain]) every ckpt_every epochs;
    # resume=True continues the exact curve from the latest checkpoint.
    ckpt_dir: str = ""
    ckpt_every: int = 0
    resume: bool = False
    # AOT executable cache dir ("" = off): repeat runs of the same
    # (spec, hypers) load the epoch program from disk instead of
    # recompiling (serve.py: AotCache; the spec is hashed in here, so no
    # caller-supplied tag is needed).
    aot_cache: str = ""


def _maybe_aot(epoch_fn, run: "ForecastRun", name: str, *identity):
    """Wrap an epoch fn in CachedJit when run.aot_cache is set; the cache
    name pins the spec + every hyper that shapes the program."""
    if not run.aot_cache:
        return epoch_fn
    from fetode_tpu.serve import AotCache, CachedJit, config_hash

    tag = config_hash(*identity, run.lr, run.weight_decay, run.grad_clip,
                      run.mesh_devices, run.mesh_model)
    return CachedJit(AotCache(run.aot_cache), f"{name}-{tag}", epoch_fn)


def _mesh_tools(run: "ForecastRun", params):
    """(params', shard_fn) — place params on the run's mesh (replicated,
    or column-sharded over 'model' when mesh_model > 1) and return a
    ``(tree, batch_axis) -> tree`` placement helper (identity when the
    mesh is off)."""
    if not run.mesh_devices:
        return params, lambda tree, batch_axis: tree
    from fetode_tpu.parallel import (make_mesh, model_param_specs,
                                     shard_batch_leaves, shard_params)

    mesh = make_mesh(run.mesh_devices, model=run.mesh_model)
    # model=1: replicate; model>1: column-parallel output-feature sharding.
    specs = model_param_specs(params, mesh) if run.mesh_model > 1 else None
    return (shard_params(params, mesh, specs),
            lambda tree, batch_axis: shard_batch_leaves(
                tree, mesh, batch_axis=batch_axis))


def _chunked_mean(sum_fn, p, x, y, chunk: int = 512):
    """Evaluate a jitted (sum, count) function over fixed-size chunks —
    bounds device memory on large eval splits (pads the tail by reuse)."""
    n = len(x)
    if n <= chunk:
        s, c = sum_fn(p, x, y)
        return float(s) / float(c)
    total, count = 0.0, 0
    for i in range(0, n, chunk):
        xs, ys = x[i:i + chunk], y[i:i + chunk]
        # the tail chunk has its own shape -> one extra compile, once
        s, c = sum_fn(p, xs, ys)
        total += float(s)
        count += int(c)
    return total / count


def prepare_windows(X: np.ndarray, y: np.ndarray, run: ForecastRun):
    """Chronological split, train-only standardisation, dense windows."""
    tr, va, te = split_time_series(len(X), run.train_frac, run.val_frac)
    sx = standardize_fit(X[tr])
    sy = standardize_fit(y[tr][:, None])
    Xs, ys = sx.apply(X), sy.apply(y[:, None])[:, 0]

    out = {}
    for name, sl in (("train", tr), ("val", va), ("test", te)):
        out[name] = make_windows(Xs[sl], ys[sl], run.context_len, run.pred_len)
    return out, sx, sy


def train_point_forecaster(spec: LatentODEForecasterSpec, X, y,
                           run: ForecastRun = ForecastRun(), log=print):
    """MSE point-forecast trainer (train_and_predict)."""
    windows, sx, sy = prepare_windows(X, y, run)
    params = latent_ode_forecaster_init(jax.random.PRNGKey(run.seed), spec)
    params, _shard = _mesh_tools(run, params)
    tx = make_optimizer(run.lr, kind="adamw", weight_decay=run.weight_decay,
                        grad_clip=run.grad_clip, params=params)
    state = init_state(params, tx)

    def loss_fn(p, xb, yb):
        return jnp.mean((latent_ode_forecast(p, spec, xb) - yb) ** 2)

    epoch_fn = _maybe_aot(make_minibatch_epoch(loss_fn, tx), run,
                          "ett-point-epoch", spec)

    # Eval runs while-mode when training uses the pallas kernel: the
    # 512-window eval chunks would overflow the kernel's VMEM adjoint
    # records, and no-grad eval doesn't need them anyway.
    eval_spec = (spec._replace(solver_mode="while")
                 if spec.solver_mode == "pallas" else spec)

    @jax.jit
    def _mse_chunk(p, x, y):
        return jnp.sum((latent_ode_forecast(p, eval_spec, x) - y) ** 2), y.size

    def eval_mse(p, x, y):
        return _chunked_mean(_mse_chunk, p, x, y, chunk=512)

    xv, yv = map(jnp.asarray, windows["val"])
    xt, yt = map(jnp.asarray, windows["test"])

    best = (np.inf, state.params)

    from fetode_tpu.train.checkpoint import DurableLoop

    dl = DurableLoop(run.ckpt_dir, run.ckpt_every, run.resume)
    start_ep, saved = dl.restore(state=state, best_crit=np.inf,
                                 best_params=state.params)
    if saved is not None:
        state = saved["state"]
        best = (float(saved["best_crit"]), saved["best_params"])
        if log is not None:
            log(f"[ckpt] resumed at epoch {start_ep} from {run.ckpt_dir}")

    history = {"train": [], "val": []}
    t0 = time.perf_counter()
    for ep in range(start_ep, run.epochs):
        bx, by = window_batches(*windows["train"], run.batch_size,
                                seed=run.seed + ep)
        state, losses = epoch_fn(
            state, _shard((jnp.asarray(bx), jnp.asarray(by)), 1))
        vl = float(eval_mse(state.params, xv, yv))
        history["train"].append(float(losses.mean()))
        history["val"].append(vl)
        if vl < best[0]:
            best = (vl, state.params)
        dl.save(ep + 1, state=state, best_crit=best[0], best_params=best[1],
                last=ep + 1 == run.epochs)
        if log is not None and (ep % run.log_every == 0 or ep == run.epochs - 1):
            log(f"epoch {ep:3d} | train {history['train'][-1]:.5f} | val {vl:.5f}")

    test_mse = float(eval_mse(best[1], xt, yt))
    history["wall_seconds"] = time.perf_counter() - t0
    history["test_mse"] = test_mse
    if log is not None:
        log(f"best-val test MSE: {test_mse:.5f}")

    # final forecast on the last window, de-standardised
    last_x = jnp.asarray(windows["test"][0][-1:])
    y_hat_std = np.asarray(latent_ode_forecast(best[1], eval_spec, last_x))[0]
    history["final_forecast"] = sy.invert(y_hat_std[:, None])[:, 0]
    return best[1], history


def train_diffusion_forecaster(spec: DiffusionForecasterSpec, X, y,
                               run: ForecastRun = ForecastRun(), log=print):
    """Epsilon-loss diffusion trainer with sampling-MSE validation
    (train_and_predict_{diffusion,kan_diffusion,kan_fet_diffusion} — the
    encoder choice in `spec.encoder` selects which of the three)."""
    windows, sx, sy = prepare_windows(X, y, run)
    sched = make_schedule(spec.diff_T)
    key = jax.random.PRNGKey(run.seed)
    params = diffusion_forecaster_init(key, spec)
    params, _shard = _mesh_tools(run, params)
    tx = make_optimizer(run.lr, kind="adamw", weight_decay=run.weight_decay,
                        grad_clip=run.grad_clip, params=params)
    state = init_state(params, tx)

    def loss_fn(p, xb, yb, k):
        return diffusion_forecaster_loss(p, spec, sched, xb, yb, k)

    epoch_fn = _maybe_aot(make_minibatch_epoch(loss_fn, tx), run,
                          "ett-diff-epoch", spec)

    # See train_point_forecaster: eval chunks downgrade pallas -> while.
    eval_spec = (spec._replace(solver_mode="while")
                 if spec.solver_mode == "pallas" else spec)

    @jax.jit
    def _sample_mse_chunk(p, x, y, k):
        samples = diffusion_forecaster_sample(p, eval_spec, sched, x, k,
                                              n_samples=run.eval_samples)
        if samples.ndim == y.ndim:   # n_samples == 1 returns (B, P)
            samples = samples[None]
        return jnp.sum((samples.mean(0) - y) ** 2), y.size

    def eval_sample_mse(p, x, y, k):
        return _chunked_mean(lambda p, xs, ys: _sample_mse_chunk(p, xs, ys, k),
                             p, x, y, chunk=256)

    xv, yv = map(jnp.asarray, windows["val"])
    xt, yt = map(jnp.asarray, windows["test"])

    best = (np.inf, state.params)

    from fetode_tpu.train.checkpoint import DurableLoop

    dl = DurableLoop(run.ckpt_dir, run.ckpt_every, run.resume)
    start_ep, saved = dl.restore(state=state, best_crit=np.inf,
                                 best_params=state.params, key=key)
    if saved is not None:
        state, key = saved["state"], saved["key"]
        best = (float(saved["best_crit"]), saved["best_params"])
        if log is not None:
            log(f"[ckpt] resumed at epoch {start_ep} from {run.ckpt_dir}")

    history = {"train": [], "val": []}
    t0 = time.perf_counter()
    for ep in range(start_ep, run.epochs):
        key, k_ep, k_ev = jax.random.split(key, 3)
        bx, by = window_batches(*windows["train"], run.batch_size,
                                seed=run.seed + ep)
        bk = jax.random.split(k_ep, bx.shape[0])
        state, losses = epoch_fn(
            state, _shard((jnp.asarray(bx), jnp.asarray(by), bk), 1))
        vl = float(eval_sample_mse(state.params, xv, yv, k_ev))
        history["train"].append(float(losses.mean()))
        history["val"].append(vl)
        if vl < best[0]:
            best = (vl, state.params)
        dl.save(ep + 1, state=state, best_crit=best[0], best_params=best[1],
                key=key, last=ep + 1 == run.epochs)
        if log is not None and (ep % run.log_every == 0 or ep == run.epochs - 1):
            log(f"epoch {ep:3d} | eps-loss {history['train'][-1]:.5f} | "
                f"val sample-MSE {vl:.5f}")

    key, k_te, k_f = jax.random.split(key, 3)
    test_mse = float(eval_sample_mse(best[1], xt, yt, k_te))
    history["wall_seconds"] = time.perf_counter() - t0
    history["test_mse"] = test_mse
    if log is not None:
        log(f"best-val test sample-MSE: {test_mse:.5f}")

    last_x = jnp.asarray(windows["test"][0][-1:])
    y_hat = np.asarray(diffusion_forecaster_sample(
        best[1], eval_spec, sched, last_x, k_f,
        n_samples=run.eval_samples))
    if y_hat.ndim == 2:          # n_samples == 1 returns (B, P), not (S, B, P)
        y_hat = y_hat[None]
    y_hat_std = y_hat.mean(0)[0]
    history["final_forecast"] = sy.invert(y_hat_std[:, None])[:, 0]
    return best[1], history
