"""Hysteresis-loop diagnostics: sweep, measure, and (optionally) plot.

The P-E loop visualisers are a genuine interpretability feature of the
model family (SURVEY.md §5.5; reference implementations at
``/root/reference/train_ecg.py:260-369,673-877,1062-1225`` and the noisy
variants in ``compare_noise_ecg.py``): drive each basis function with an
up-then-down field sweep, read the per-basis responses, and plot the open
loops with the learned device parameters in the titles.

Here the sweep is a pure function usable both as a plot source and as a
quantitative assert (loop openness — the property the reference only
eyeballs)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    ferro_basis,
    ferro_state_init,
)


def sweep_loop(params: FerroParams, cfg: FerroConfig, *, e_max: float = 3.0,
               n_points: int = 81, noise_key: Optional[jax.Array] = None):
    """Drive every basis function through an up-then-down field sweep.

    Returns ``(fields (2N,), responses (2N, in, out, K))`` — responses are
    the raw basis values, state threaded through the sweep.

    By default the sweep shows the CLEAN device response even when
    ``cfg.noise_std > 0``; pass ``noise_key`` to draw fresh device noise
    at every field point instead — the reference's noisy-loop
    visualisers (``compare_noise_ecg.py:398-513``).
    """
    if noise_key is None:
        cfg = cfg._replace(noise_std=0.0)   # clean device response
    up = np.linspace(-e_max, e_max, n_points)
    fields = np.concatenate([up, up[::-1]])
    state = ferro_state_init((1,), cfg)
    keys = (jax.random.split(noise_key, len(fields))
            if noise_key is not None and cfg.noise_std > 0
            else jnp.zeros((len(fields), 2), jnp.uint32))
    use_noise = noise_key is not None and cfg.noise_std > 0

    def step(state, ek):
        e, k = ek
        x = jnp.full((1, cfg.in_dim), e, jnp.float32)
        b, state = ferro_basis(params, state, x, cfg,
                               noise_key=k if use_noise else None)
        return state, b[0]

    _, responses = jax.lax.scan(
        step, state, (jnp.asarray(fields, jnp.float32), keys))
    return fields, np.asarray(responses)


def loop_openness(params: FerroParams, cfg: FerroConfig, **kw) -> np.ndarray:
    """Mean |up-branch - down-branch| gap per basis function (in, out, K).

    > 0 means the device exhibits hysteresis; the quantitative version of
    the reference's visual check."""
    fields, resp = sweep_loop(params, cfg, **kw)
    n = len(fields) // 2
    rise = resp[:n]
    fall = resp[n:][::-1]
    return np.abs(rise - fall).mean(axis=0)


def plot_loops(params: FerroParams, cfg: FerroConfig, out_dir: str,
               *, max_panels: int = 16, e_max: float = 3.0,
               n_points: int = 81, prefix: str = "hysteresis",
               noise_key: Optional[jax.Array] = None):
    """Save P-E loop panels (one per basis function, learned params in the
    title) to ``out_dir`` — the artifact set of the reference visualisers.
    ``noise_key`` draws fresh device noise per field point (the noisy-loop
    panels of ``compare_noise_ecg.py``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    fields, resp = sweep_loop(params, cfg, e_max=e_max, n_points=n_points,
                              noise_key=noise_key)
    n = len(fields) // 2

    count = 0
    paths = []
    for i in range(cfg.in_dim):
        for o in range(cfg.out_dim):
            for k in range(cfg.num_basis):
                if count >= max_panels:
                    return paths
                fig, ax = plt.subplots(figsize=(4, 3))
                ax.plot(fields[:n], resp[:n, i, o, k], label="up sweep")
                ax.plot(fields[n:], resp[n:, i, o, k], label="down sweep")
                ax.set_xlabel("E")
                ax.set_ylabel("P")
                ax.set_title(
                    f"in{i} out{o} k{k}: "
                    f"Ps={float(params.ps[i, o, k]):.2f} "
                    f"Ec={float(params.ec[i, o, k]):.2f} "
                    f"k={float(params.k[i, o, k]):.2f} "
                    f"coef={float(params.coef[i, o, k]):.2f}")
                ax.legend(fontsize=7)
                fig.tight_layout()
                path = os.path.join(out_dir, f"{prefix}_i{i}_o{o}_k{k}.png")
                fig.savefig(path, dpi=120)
                plt.close(fig)
                paths.append(path)
                count += 1
    return paths
