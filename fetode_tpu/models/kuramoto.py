"""Kuramoto-oscillator image front-end + KAN classifier (MNIST workload).

Capability parity with ``/root/reference/mnist_kuramoto_kan.py:145-283``:
each pixel is an oscillator with phase ``theta = pi*(2x - 1)``; a
4-neighbour lattice couples phases through

    dtheta/dt = omega + K * (cos(theta)*sum sin(theta_n)
                             - sin(theta)*sum cos(theta_n))

integrated with ``steps`` Euler steps of size ``dt`` (a `lax.scan`).
Features are ``[cos(theta), sin(theta)]`` flattened, classified by one
``KANLinear`` with the logistic branch enabled.

TPU notes: the neighbour sums are a fixed 3x3 cross convolution — XLA maps
it onto the conv unit; the phase update is fully fused elementwise VPU
work; the feature matmul (B, 2HW) x (2HW, 10) rides the MXU.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from fetode_tpu.nn.kan import KANLinearConfig, kan_linear_apply, kan_linear_init


class KuramotoSpec(NamedTuple):
    H: int = 28
    W: int = 28
    steps: int = 10
    dt: float = 0.15
    num_classes: int = 10
    num_basis: int = 8
    grid_size: int = 5
    # "scan" = lax.scan + cross conv (XLA); "pallas" = whole-rollout kernel
    # with in-kernel discrete adjoint (ops/pallas_kuramoto.py)
    rollout: str = "scan"

    @property
    def head_cfg(self) -> KANLinearConfig:
        return KANLinearConfig(2 * self.H * self.W, self.num_classes,
                               grid_size=self.grid_size,
                               logistic_num_basis=self.num_basis)


_CROSS = jnp.asarray([[0.0, 1.0, 0.0],
                      [1.0, 0.0, 1.0],
                      [0.0, 1.0, 0.0]])


def kuramoto_init(key, spec: KuramotoSpec, dtype=jnp.float32):
    return {
        "K": jnp.asarray(0.5, dtype),
        "omega": jnp.zeros((spec.H, spec.W), dtype),
        "head": kan_linear_init(key, spec.head_cfg, dtype),
    }


def _neighbor_sum(x):
    """(B, H, W) -> 4-neighbour sums via a fixed cross conv."""
    k = _CROSS.astype(x.dtype)[None, None]
    y = jax.lax.conv_general_dilated(
        x[:, None], k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y[:, 0]


def kuramoto_features(params, spec: KuramotoSpec, x_img: jax.Array):
    """x_img (B, H, W) or (B, 1, H, W) in [0, 1] -> (B, 2*H*W) features."""
    if spec.rollout not in ("scan", "pallas", "pallas_fused"):
        # A typo must not silently benchmark the scan path.
        raise ValueError(f"KuramotoSpec.rollout={spec.rollout!r}: expected "
                         "'scan', 'pallas' or 'pallas_fused'")
    if spec.rollout in ("pallas", "pallas_fused"):
        # Feature-level calls use the rollout kernel either way; the head
        # fusion of 'pallas_fused' only exists at the classifier level
        # (kuramoto_kan_apply), where the features never leave VMEM.
        from fetode_tpu.ops.pallas_kuramoto import pallas_kuramoto_features

        return pallas_kuramoto_features(params, spec, x_img)
    if x_img.ndim == 4:
        x_img = x_img[:, 0]
    theta0 = math.pi * (2.0 * x_img - 1.0)

    def step(theta, _):
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        sin_n = _neighbor_sum(sin_t)
        cos_n = _neighbor_sum(cos_t)
        coupling = cos_t * sin_n - sin_t * cos_n
        theta = theta + spec.dt * (params["omega"][None] + params["K"] * coupling)
        return theta, None

    theta, _ = jax.lax.scan(step, theta0, None, length=spec.steps)
    feat = jnp.concatenate([jnp.cos(theta), jnp.sin(theta)], axis=1)
    return feat.reshape(x_img.shape[0], -1)


def kuramoto_kan_apply(params, spec: KuramotoSpec, x_img: jax.Array):
    """Full classifier: oscillator features -> KANLinear logits.

    ``rollout='pallas_fused'`` evaluates rollout AND head in one kernel
    (ops/pallas_kuramoto.py: pallas_kuramoto_logits) — the spline/logistic
    basis tensors stay in VMEM, which is the inference win; gradients
    route through the rollout kernel's adjoint + the XLA head.
    """
    if spec.rollout == "pallas_fused":
        from fetode_tpu.ops.pallas_kuramoto import pallas_kuramoto_logits

        return pallas_kuramoto_logits(params, spec, x_img)
    feat = kuramoto_features(params, spec, x_img)
    logits, _ = kan_linear_apply(params["head"], spec.head_cfg, feat)
    return logits
