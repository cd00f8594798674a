"""Object-style convenience wrappers with the reference's class names.

The functional core (explicit params/state pytrees) is the real API; these
thin classes give users of the reference a familiar surface with the same
constructor signatures.  Every wrapper holds only static config — params
and hysteresis state remain explicit, so everything stays jit/vmap/pjit
legal (``model(params, x)`` instead of stateful ``model(x)``).

Name map (reference -> here):
  efficient_kan.KAN / the missing KANFET        -> KAN / KANFET
  kan_diffusion.kan.KAN (empty dir, same ctor   -> KAN (one implementation
    contract — SURVEY.md §0.2-2)                   serves both import paths)
  ferro_class.FerroelectricBasis                -> FerroelectricBasis
  ferro_class.NoisyFerroelectricBasis           -> NoisyFerroelectricBasis
  ferro_class.{Original,}BatchedFerroelectric.. -> FerroelectricBasis (batch
    is a leading axis; the per-sample loop variants are obsolete by design)
  ferro_class.TwoDimensionFerroelectricBasis    -> TwoDimensionFerroelectricBasis
  ferro_class.FerroelectricBasisConv2d          -> FerroelectricBasisConv2d
  ferro_class.MemEfficient_...Conv2d            -> FerroelectricBasisConv2d
                                                   (out_chunk=...)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from fetode_tpu.nn.ferro_layers import (
    FerroConv2DConfig,
    ferro_conv2d_apply,
    ferro_conv2d_init,
    ferro_conv2d_state,
    ferro_feature_basis,
    ferro_feature_init,
    ferro_feature_state,
)
from fetode_tpu.nn.kan import (
    KANConfig,
    kan_apply,
    kan_init,
    kan_regularization,
    kan_state_init,
    kanfet_config,
)
from fetode_tpu.ops.ferro import (
    FerroConfig,
    FerroParams,
    ferro_apply,
    ferro_init,
    ferro_state_init,
)


class KAN:
    """``KAN(layers_hidden, grid_size=5, spline_order=3, ...)`` — the
    constructor contract shared by both of the reference's KAN import
    paths (``efficientkan.py:240-284``)."""

    def __init__(self, layers_hidden: Sequence[int], grid_size: int = 5,
                 spline_order: int = 3, **kw):
        self.cfg = KANConfig.make(list(layers_hidden), grid_size=grid_size,
                                  spline_order=spline_order, **kw)

    def init(self, key, dtype=jnp.float32):
        return kan_init(key, self.cfg, dtype)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return kan_state_init(batch_shape, self.cfg, dtype)

    def __call__(self, params, x, state=None, **kw):
        y, new_state = kan_apply(params, self.cfg, x, state, **kw)
        return (y, new_state) if self._stateful else y

    @property
    def _stateful(self):
        return any(c.ferro_num_basis > 0 for c in self.cfg.layers)

    def regularization_loss(self, params, **kw):
        return kan_regularization(params, self.cfg, **kw)


class KANFET(KAN):
    """The symbol the reference imports but never defines (SURVEY.md
    §0.2-1): a KAN whose layers carry the ferroelectric hysteresis branch.
    ``KANFET(layers_hidden=[2, 10, 2], grid_size=5)``."""

    def __init__(self, layers_hidden: Sequence[int], grid_size: int = 5,
                 spline_order: int = 3, ferro_num_basis: int = 8,
                 noise_std: float = 0.0, **kw):
        self.cfg = kanfet_config(list(layers_hidden), grid_size=grid_size,
                                 spline_order=spline_order,
                                 ferro_num_basis=ferro_num_basis,
                                 noise_std=noise_std, **kw)


class FerroelectricBasis:
    """``FerroelectricBasis(in_dim, out_dim, num_basis, ...)``
    (``ferro_class.py:329-424``) — vectorised over batch by construction."""

    def __init__(self, in_dim: int, out_dim: int, num_basis: int,
                 use_noise: bool = False, gate_slope: float = 10.0,
                 alpha: float = 0.8, noise_std: float = 0.05):
        self.cfg = FerroConfig(in_dim, out_dim, num_basis,
                               gate_slope=gate_slope, alpha=alpha,
                               noise_std=noise_std if use_noise else 0.0)

    def init(self, key, dtype=jnp.float32):
        return ferro_init(key, self.cfg, dtype)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return ferro_state_init(batch_shape, self.cfg, dtype)

    # reset_state == init_state: state is a value, not module memory
    reset_state = init_state

    def __call__(self, params, state, x, *, noise_key=None,
                 return_activations: bool = False):
        if isinstance(params, dict):
            params = FerroParams(**params)
        return ferro_apply(params, state, x, self.cfg, noise_key=noise_key,
                           return_activations=return_activations)


class NoisyFerroelectricBasis(FerroelectricBasis):
    """Always-on device noise, default std 0.2 (``ferro_class.py:427-523``)."""

    def __init__(self, in_dim, out_dim, num_basis, noise_std: float = 0.2,
                 **kw):
        super().__init__(in_dim, out_dim, num_basis, use_noise=True,
                         noise_std=noise_std, **kw)


class TwoDimensionFerroelectricBasis:
    """Per-feature basis, params (in, K), returns the weighted basis tensor
    (``ferro_class.py:526-596``)."""

    def __init__(self, in_dim: int, num_basis: int, gate_slope: float = 10.0,
                 alpha: float = 0.8, noise_std: float = 0.0):
        self.in_dim, self.num_basis = in_dim, num_basis
        self.gate_slope, self.alpha, self.noise_std = gate_slope, alpha, noise_std

    def init(self, key, dtype=jnp.float32):
        return ferro_feature_init(key, self.in_dim, self.num_basis, dtype)

    def init_state(self, batch_shape=(), dtype=jnp.float32):
        return ferro_feature_state(batch_shape, self.in_dim, self.num_basis,
                                   dtype)

    def __call__(self, params, state, x, *, noise_key=None):
        return ferro_feature_basis(params, state, x,
                                   gate_slope=self.gate_slope,
                                   alpha=self.alpha,
                                   noise_std=self.noise_std,
                                   noise_key=noise_key)


class FerroelectricBasisConv2d:
    """Hysteresis conv layer (``ferro_class.py:601-944``); pass
    ``out_chunk`` for the memory-bounded variant."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size=3,
                 num_basis: int = 3, stride: int = 1, padding: int = 0,
                 use_noise: bool = False, noise_std: float = 0.2,
                 gate_slope: float = 10.0, alpha: float = 0.8,
                 stateful: bool = False, out_chunk: int = 0):
        ks = kernel_size if isinstance(kernel_size, tuple) \
            else (kernel_size, kernel_size)
        self.cfg = FerroConv2DConfig(
            in_channels, out_channels, ks, num_basis, stride, padding,
            gate_slope, alpha, noise_std if use_noise else 0.0, stateful,
            out_chunk)

    def init(self, key, dtype=jnp.float32):
        return ferro_conv2d_init(key, self.cfg, dtype)

    def init_state(self, batch_shape, out_hw, dtype=jnp.float32):
        return ferro_conv2d_state(batch_shape, self.cfg, out_hw, dtype)

    def __call__(self, params, x, state=None, *, noise_key=None):
        return ferro_conv2d_apply(params, self.cfg, x, state,
                                  noise_key=noise_key)
