"""Checkpoint / resume via orbax.

SURVEY.md §5.4: the reference's persistence is minimal and partly broken
(``load_ckpt`` calls a method that does not exist; saving commented out);
the working mechanism is the in-memory best-state snapshot.  The framework
provides both: durable orbax checkpoints of the full train-state pytree
(params + optimiser state + step + RNG key) with retention, and a
``BestTracker`` for the best-val snapshot/restore pattern.

Hysteresis-state convention on resume (reset at sequence start —
``train_ecg.py:371-378``) is automatic here: states are constructed fresh
per sequence, never checkpointed.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


class CheckpointManager:
    """Thin orbax wrapper: save/restore arbitrary pytrees by step."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, tree: Any, *, force: bool = False) -> bool:
        ok = self.manager.save(
            step, args=self._ocp.args.StandardSave(tree), force=force)
        self.manager.wait_until_finished()
        return bool(ok)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template))
        return self.manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


class BestTracker:
    """Best-metric in-memory snapshot (the reference's working pattern,
    ``train_kan_fet_ett.py:341-358``), host-side copies."""

    def __init__(self, mode: str = "min"):
        self.mode = mode
        self.best_metric = np.inf if mode == "min" else -np.inf
        self.best_tree = None

    def update(self, metric: float, tree: Any) -> bool:
        better = (metric < self.best_metric if self.mode == "min"
                  else metric > self.best_metric)
        if better:
            self.best_metric = float(metric)
            self.best_tree = jax.tree_util.tree_map(np.asarray, tree)
        return better

    def restore(self, like: Any = None) -> Any:
        if self.best_tree is None:
            raise ValueError("no snapshot recorded yet")
        if like is None:
            return self.best_tree
        import jax.numpy as jnp
        return jax.tree_util.tree_map(lambda ref, b: jnp.asarray(b),
                                      like, self.best_tree)


class DurableLoop:
    """Periodic-save + exact-resume harness for epoch-style drivers.

    Every generic driver (ECG, point/diffusion forecast, conditional
    diffusion) derives its per-epoch randomness either statelessly
    (``fold_in(base, ep)``, shuffles seeded ``run.seed + ep``) or from a
    key chain that rides the payload, so checkpointing
    ``(train state, best snapshot, key, epoch)`` makes a resumed run
    continue the EXACT curve of an unbroken one.  (The reference's
    persistence is a dead ``load_ckpt`` call,
    ``predator_prey.py:123-124``.)

    Usage::

        dl = DurableLoop(run.ckpt_dir, run.ckpt_every, run.resume)
        start_ep, saved = dl.restore(state=state, best_crit=np.inf,
                                     best_params=state.params, key=key)
        if saved is not None:
            state, key = saved["state"], saved["key"]
            best = (float(saved["best_crit"]), saved["best_params"])
        for ep in range(start_ep, run.epochs):
            ...
            dl.save(ep + 1, state=state, best_crit=best[0],
                    best_params=best[1], key=key, last=ep + 1 == run.epochs)
    """

    def __init__(self, ckpt_dir: str = "", ckpt_every: int = 0,
                 resume: bool = False, max_to_keep: int = 3):
        self.every = int(ckpt_every)
        self.resume = bool(resume)
        self.enabled = bool(ckpt_dir) and (self.every > 0 or self.resume)
        self.manager = (CheckpointManager(ckpt_dir, max_to_keep=max_to_keep)
                        if self.enabled else None)

    def _payload(self, state, best_crit, best_params, key):
        import jax.numpy as jnp

        payload = {"state": state, "best_crit": jnp.asarray(float(best_crit)),
                   "best_params": best_params}
        if key is not None:
            payload["key"] = key
        return payload

    def restore(self, *, state, best_crit, best_params, key=None):
        """(start_epoch, saved_payload | None); arguments are templates."""
        if not (self.enabled and self.resume):
            return 0, None
        step = self.manager.latest_step()
        if step is None:
            return 0, None
        saved = self.manager.restore(
            step, template=self._payload(state, best_crit, best_params, key))
        return int(step), saved

    def save(self, epoch: int, *, state, best_crit, best_params, key=None,
             last: bool = False) -> bool:
        if self.manager is None or self.every <= 0:
            return False
        if epoch % self.every and not last:
            return False
        return self.manager.save(
            epoch, self._payload(state, best_crit, best_params, key))
