"""Symbolic-regression demo: a 2-layer ferroelectric KAN fit to a
closed-form target.

Capability parity with ``/root/reference/smooth_test_KAN_ferro.py``:
a small net whose every edge is a hysteretic basis (here the smooth
two-branch formulation from ``ops.ferro``; the reference's hard-gate
variant is available through ``ops.logistic.hysteretic_logistic_basis``
with ``hard_gate=True``), trained on ``y = sin(x) + 0.1 x^2`` with an L1
pruning penalty on mixing coefficients and hysteresis state reset every
epoch.  This doubles as the functional test of hysteresis behavior the
reference verifies visually.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    ferro_apply,
    ferro_init,
    ferro_state_init,
)


class SymbolicNetSpec(NamedTuple):
    in_dim: int = 1
    hidden: int = 8
    out_dim: int = 1
    num_basis: int = 6
    l1_coef: float = 1e-3

    @property
    def l1_cfg(self):
        return FerroConfig(self.in_dim, self.hidden, self.num_basis)

    @property
    def l2_cfg(self):
        return FerroConfig(self.hidden, self.out_dim, self.num_basis)


def symbolic_net_init(key, spec: SymbolicNetSpec, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "l1": ferro_init(k1, spec.l1_cfg, dtype, coef_scale=0.3)._asdict(),
        "l2": ferro_init(k2, spec.l2_cfg, dtype, coef_scale=0.3)._asdict(),
    }


def symbolic_net_apply(params, spec: SymbolicNetSpec, x, state=None):
    """x (B, in_dim) -> (B, out_dim); fresh hysteresis state per call by
    default (= the reference's per-epoch reset_state)."""
    B = x.shape[0]
    if state is None:
        state = (ferro_state_init((B,), spec.l1_cfg, x.dtype),
                 ferro_state_init((B,), spec.l2_cfg, x.dtype))
    h, s1 = ferro_apply(FerroParams(**params["l1"]), state[0], x, spec.l1_cfg)
    h = jnp.tanh(h)
    y, s2 = ferro_apply(FerroParams(**params["l2"]), state[1], h, spec.l2_cfg)
    return y, (s1, s2)


def target_fn(x):
    """The reference's regression target (smooth_test_KAN_ferro.py:125-130)."""
    return jnp.sin(x) + 0.1 * x ** 2


def pruning_l1(params):
    """L1 penalty on mixing coefficients (the coef-pruning regulariser)."""
    return jnp.abs(params["l1"]["coef"]).mean() + jnp.abs(params["l2"]["coef"]).mean()


def train_symbolic(spec: SymbolicNetSpec = SymbolicNetSpec(),
                   epochs: int = 300, lr: float = 5e-3, n_points: int = 128,
                   seed: int = 0, log=None):
    """Fit the net; returns (params, losses)."""
    import optax

    from fetode_tpu.train.loop import init_state, make_epoch_scanner
    from fetode_tpu.train.optim import make_optimizer

    key = jax.random.PRNGKey(seed)
    x = jnp.linspace(-3.0, 3.0, n_points)[:, None]
    y = target_fn(x)

    params = symbolic_net_init(key, spec)
    tx = make_optimizer(lr, kind="adam", params=params)
    state = init_state(params, tx)

    def loss_fn(p, x_, y_):
        pred, _ = symbolic_net_apply(p, spec, x_)
        return jnp.mean((pred - y_) ** 2) + spec.l1_coef * pruning_l1(p)

    scanner = make_epoch_scanner(loss_fn, tx, epochs)
    state, losses = scanner(state, x, y)
    if log is not None and epochs > 0:
        log(f"symbolic regression: loss {float(losses[0]):.4f} -> "
            f"{float(losses[-1]):.4f}")
    return state.params, np.asarray(losses)
