"""KAN layers: spline + base branch, optional logistic and ferroelectric
branches ("KANFET").

Capability parity:
* ``KANLinear`` / ``KAN`` — ``/root/reference/efficient_kan/efficientkan.py:
  27-285`` (SiLU base branch + B-spline branch + optional logistic branch,
  grid refit, regularisation loss).
* ``KANFET`` — the symbol the reference imports but never defines
  (see SURVEY.md §0.2-1): a KAN whose layers additionally carry the
  ferroelectric hysteresis branch of ``ferro_class.py``.  Constructor shape
  matches the observed call sites: ``kanfet_init(key, layers_hidden=[2,10,2],
  grid_size=5)``.

TPU-first structure: parameters are plain dicts of arrays (pytrees), the
knot grid is a non-trainable buffer under ``_buffers``, hysteresis state is
an explicit pytree threaded by the caller, and the forward pass is three
matmuls (base / spline / branch) that XLA fuses with their elementwise
producers and maps onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fetode_tpu.ops.bsplines import bspline_basis, curve2coeff, make_grid, refine_grid
from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    ferro_basis,
    ferro_init,
    ferro_state_init,
)
from fetode_tpu.ops.logistic import LogisticParams, logistic_basis
from fetode_tpu.utils.init import kaiming_uniform


class KANLinearConfig(NamedTuple):
    """Static layer hyper-parameters (hashable; safe to close over in jit)."""

    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    standalone_spline_scaler: bool = True
    grid_eps: float = 0.02
    grid_range: Tuple[float, float] = (-1.0, 1.0)
    # logistic branch (0 disables) — the reference's optional branch
    logistic_num_basis: int = 0
    scale_logistic: float = 1.0
    standalone_logistic_scaler: bool = True
    # ferroelectric branch (0 disables) — this is what makes a layer "FET"
    ferro_num_basis: int = 0
    ferro_gate_slope: float = 10.0
    ferro_alpha: float = 0.8
    ferro_noise_std: float = 0.0
    # Small initial mixing keeps the additive branch from dominating the
    # spline+base output at init (cf. the reference's logistic scaler
    # starting at 1.0 with kaiming-small weights, efficientkan.py:112-115).
    ferro_coef_scale: float = 0.1
    # Hysteresis-state dtype override ("" = follow the input dtype).  The
    # branch state is stop-gradient [-1,1] memory, so "bfloat16" halves the
    # dominant HBM traffic of the ferro op at negligible accuracy cost.
    state_dtype: str = ""

    @property
    def n_coeff(self) -> int:
        return self.grid_size + self.spline_order

    @property
    def ferro_cfg(self) -> FerroConfig:
        return FerroConfig(
            in_dim=self.in_features,
            out_dim=self.out_features,
            num_basis=self.ferro_num_basis,
            gate_slope=self.ferro_gate_slope,
            alpha=self.ferro_alpha,
            noise_std=self.ferro_noise_std,
        )


def kan_linear_init(key, cfg: KANLinearConfig, dtype=jnp.float32) -> dict:
    """Initialise one KAN layer's parameter pytree.

    Matches the reference's init scheme (``efficientkan.py:92-115``):
    kaiming-uniform base weight, spline weights fit to small uniform noise
    at the interior grid points via least squares, scalers at kaiming/ones.
    """
    k_base, k_noise, k_scaler, k_log, k_ferro = jax.random.split(key, 5)
    grid = make_grid(cfg.in_features, cfg.grid_size, cfg.spline_order,
                     cfg.grid_range, dtype)

    params: dict = {"_buffers": {"grid": grid}}
    params["base_weight"] = kaiming_uniform(
        k_base, (cfg.out_features, cfg.in_features),
        a=math.sqrt(5) * cfg.scale_base, dtype=dtype)

    # Spline branch: fit coefficients to noise sampled at interior knots.
    interior = grid.T[cfg.spline_order:-cfg.spline_order]     # (G+1, in)
    noise = (jax.random.uniform(
        k_noise, (cfg.grid_size + 1, cfg.in_features, cfg.out_features), dtype)
        - 0.5) * cfg.scale_noise / cfg.grid_size
    coeff = curve2coeff(interior, noise, grid, cfg.spline_order)
    if not cfg.standalone_spline_scaler:
        coeff = coeff * cfg.scale_spline
    params["spline_weight"] = coeff
    if cfg.standalone_spline_scaler:
        params["spline_scaler"] = kaiming_uniform(
            k_scaler, (cfg.out_features, cfg.in_features),
            a=math.sqrt(5) * cfg.scale_spline, dtype=dtype)

    if cfg.logistic_num_basis > 0:
        ka, kb, kw = jax.random.split(k_log, 3)
        params["logistic"] = {
            "a": jax.random.normal(ka, (cfg.in_features, cfg.logistic_num_basis), dtype),
            "b": jax.random.normal(kb, (cfg.in_features, cfg.logistic_num_basis), dtype),
            "weight": kaiming_uniform(
                kw, (cfg.out_features, cfg.in_features * cfg.logistic_num_basis),
                a=math.sqrt(5) * cfg.scale_logistic, dtype=dtype),
        }
        if cfg.standalone_logistic_scaler:
            params["logistic"]["scaler"] = jnp.ones((cfg.out_features,), dtype)

    if cfg.ferro_num_basis > 0:
        params["ferro"] = ferro_init(k_ferro, cfg.ferro_cfg, dtype,
                                     coef_scale=cfg.ferro_coef_scale)._asdict()

    return params


def _scaled_spline_weight(params: dict, cfg: KANLinearConfig) -> jax.Array:
    w = params["spline_weight"]
    if cfg.standalone_spline_scaler:
        w = w * params["spline_scaler"][..., None]
    return w


def kan_linear_apply(
    params: dict,
    cfg: KANLinearConfig,
    x: jax.Array,
    state=None,
    *,
    noise_key=None,
):
    """Forward pass of one layer.

    Args:
      x: (..., in_features)
      state: ferro hysteresis state (required iff the ferro branch is on).

    Returns:
      ``(y, new_state)`` — new_state is None for branch-free layers.
    """
    lead = x.shape[:-1]
    x2 = x.reshape((-1, cfg.in_features))

    base = jnp.dot(jax.nn.silu(x2), params["base_weight"].T,
                   preferred_element_type=x2.dtype)

    bases = bspline_basis(x2, params["_buffers"]["grid"], cfg.spline_order)
    sw = _scaled_spline_weight(params, cfg)
    y = base + jnp.dot(bases.reshape(x2.shape[0], -1),
                       sw.reshape(cfg.out_features, -1).T,
                       preferred_element_type=x2.dtype)

    if cfg.logistic_num_basis > 0:
        lp = params["logistic"]
        phi = logistic_basis(LogisticParams(lp["a"], lp["b"]), x2)
        w = lp["weight"] * cfg.scale_logistic
        if cfg.standalone_logistic_scaler:
            w = w * lp["scaler"][:, None]
        y = y + jnp.dot(phi.reshape(x2.shape[0], -1), w.T,
                        preferred_element_type=x2.dtype)

    new_state = None
    if cfg.ferro_num_basis > 0:
        if state is None:
            raise ValueError("ferro branch enabled: pass a FerroState "
                             "(use kan_linear_state / kanfet_state_init)")
        fp = FerroParams(**params["ferro"])
        fstate = jax.tree_util.tree_map(
            lambda l: l.reshape((x2.shape[0],) + l.shape[len(lead):]), state)
        fb, new_fstate = ferro_basis(fp, fstate, x2, cfg.ferro_cfg,
                                     noise_key=noise_key)
        y = y + jnp.einsum("biok,iok->bo", fb, fp.coef)
        new_state = jax.tree_util.tree_map(
            lambda l: l.reshape(lead + l.shape[1:]), new_fstate)

    return y.reshape(lead + (cfg.out_features,)), new_state


def kan_linear_state(batch_shape, cfg: KANLinearConfig, dtype=jnp.float32):
    if cfg.ferro_num_basis == 0:
        return None
    if cfg.state_dtype:
        dtype = jnp.dtype(cfg.state_dtype)
    return ferro_state_init(batch_shape, cfg.ferro_cfg, dtype)


def kan_linear_update_grid(params: dict, cfg: KANLinearConfig, x: jax.Array,
                           margin: float = 0.01) -> dict:
    """Adaptive grid refit (capability of ``update_grid``,
    ``efficientkan.py:184-221``): move knots toward the empirical input
    distribution and refit spline coefficients to preserve the current
    function.  Pure: returns a new params pytree."""
    x2 = x.reshape((-1, cfg.in_features))
    grid = params["_buffers"]["grid"]
    bases = bspline_basis(x2, grid, cfg.spline_order)              # (B, in, C)
    sw = _scaled_spline_weight(params, cfg)                        # (out, in, C)
    y_unreduced = jnp.einsum("bic,oic->bio", bases, sw)            # (B, in, out)

    new_grid = refine_grid(x2, cfg.grid_size, cfg.spline_order,
                           cfg.grid_eps, margin)
    new_coeff = curve2coeff(x2, y_unreduced, new_grid, cfg.spline_order)

    out = dict(params)
    out["_buffers"] = dict(params["_buffers"], grid=new_grid)
    # Fold the fit back into the raw weight so scaled value is preserved.
    if cfg.standalone_spline_scaler:
        scaler = params["spline_scaler"][..., None]
        out["spline_weight"] = new_coeff / jnp.where(scaler == 0, 1.0, scaler)
    else:
        out["spline_weight"] = new_coeff
    return out


def kan_linear_regularization(params: dict, cfg: KANLinearConfig,
                              regularize_activation: float = 1.0,
                              regularize_entropy: float = 1.0,
                              regularize_logistic_l1: float = 0.0):
    """L1 + entropy regulariser on spline weights (``efficientkan.py:223-237``)."""
    l1 = jnp.abs(params["spline_weight"]).mean(-1)
    act = l1.sum()
    p = l1 / (act + 1e-12)
    ent = -jnp.sum(p * jnp.log(p + 1e-12))
    reg = regularize_activation * act + regularize_entropy * ent
    if cfg.logistic_num_basis > 0 and regularize_logistic_l1 != 0.0:
        reg = reg + regularize_logistic_l1 * jnp.abs(params["logistic"]["weight"]).mean()
    return reg


# --------------------------------------------------------------------- stacks


class KANConfig(NamedTuple):
    """A stack of KAN layers built from ``layers_hidden`` pairs."""

    layers: Tuple[KANLinearConfig, ...]

    @classmethod
    def make(cls, layers_hidden: Sequence[int], grid_size: int = 5,
             spline_order: int = 3, **layer_kw) -> "KANConfig":
        cfgs = tuple(
            KANLinearConfig(i, o, grid_size=grid_size, spline_order=spline_order,
                            **layer_kw)
            for i, o in zip(layers_hidden, layers_hidden[1:])
        )
        return cls(layers=cfgs)


def kan_init(key, cfg: KANConfig, dtype=jnp.float32) -> list:
    keys = jax.random.split(key, len(cfg.layers))
    return [kan_linear_init(k, c, dtype) for k, c in zip(keys, cfg.layers)]


def kan_state_init(batch_shape, cfg: KANConfig, dtype=jnp.float32) -> tuple:
    return tuple(kan_linear_state(batch_shape, c, dtype) for c in cfg.layers)


def kan_apply(params: list, cfg: KANConfig, x: jax.Array, state=None, *,
              noise_key=None):
    """Apply the stack; threads per-layer hysteresis state when present.

    Returns ``(y, new_state)`` (new_state a tuple aligned with layers).
    """
    if state is None:
        state = (None,) * len(cfg.layers)
    keys = (jax.random.split(noise_key, len(cfg.layers))
            if noise_key is not None else (None,) * len(cfg.layers))
    new_states = []
    for p, c, s, k in zip(params, cfg.layers, state, keys):
        x, s1 = kan_linear_apply(p, c, x, s, noise_key=k)
        new_states.append(s1)
    return x, tuple(new_states)


def kan_regularization(params: list, cfg: KANConfig, **kw):
    return sum(kan_linear_regularization(p, c, **kw)
               for p, c in zip(params, cfg.layers))


def kan_update_grid(params: list, cfg: KANConfig, x: jax.Array,
                    margin: float = 0.01) -> list:
    """Stack-level adaptive grid refit (``update_grid`` over the whole KAN,
    ``efficientkan.py:184-221`` per layer): each layer refits its knots to
    the empirical distribution of ITS OWN input (x propagated through the
    already-refitted earlier layers), preserving the current function.

    Pure: returns a new params list; parameter shapes are unchanged, so
    optimiser state remains valid.
    """
    state = kan_state_init(x.shape[:-1], cfg, x.dtype)
    new_params = []
    for p, c, s in zip(params, cfg.layers, state):
        p2 = kan_linear_update_grid(p, c, x, margin)
        new_params.append(p2)
        x, _ = kan_linear_apply(p2, c, x, s)
    return new_params


# ---------------------------------------------------------------------- KANFET


def kanfet_config(layers_hidden: Sequence[int], grid_size: int = 5,
                  spline_order: int = 3, ferro_num_basis: int = 8,
                  noise_std: float = 0.0, **kw) -> KANConfig:
    """The missing ``KANFET`` class of the reference, defined: a KAN whose
    every layer carries the ferroelectric hysteresis branch (SURVEY.md
    §0.2-1; call-site contract ``KANFET(layers_hidden=[2,10,2],
    grid_size=5)`` at ``train_kanfet_node_predprey.py:146``)."""
    return KANConfig.make(layers_hidden, grid_size=grid_size,
                          spline_order=spline_order,
                          ferro_num_basis=ferro_num_basis,
                          ferro_noise_std=noise_std, **kw)


kanfet_init = kan_init
kanfet_apply = kan_apply
kanfet_state_init = kan_state_init
