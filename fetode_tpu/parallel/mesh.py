"""Device mesh construction and sharding rules.

The reference is single-process/single-device (SURVEY.md §2.5); this module
is the TPU-native scaling layer it lacks: a named mesh over ICI (with an
optional DCN axis for multi-slice), batch/trajectory sharding over the
``data`` axis, and tensor sharding of KAN layer weights over the ``model``
axis.  Collectives (psum of the per-feature contraction partials,
all-gathers of replicated activations) are inserted by GSPMD from the
shardings — there is no hand-written communication code to maintain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults to all visible devices on the data axis (pure DP).  ``model``
    splits off a tensor-parallel axis; ``data`` is inferred as
    ``n_devices // model`` when not given.
    """
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data * model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / trajectory) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch_leaves(tree, mesh: Mesh, *, batch_axis: int = 0,
                       axis: str = "data"):
    """device_put every array leaf with ``batch_axis`` sharded over the
    mesh ``axis`` (all other axes replicated).

    Leaves whose ``batch_axis`` does not exist or does not divide the axis
    size are placed replicated instead — this keeps ragged eval splits and
    per-step PRNG-key stacks (shape ``(n_batches, 2)``) legal without the
    caller special-casing them.
    """
    n_shards = mesh.shape[axis]

    def put(x):
        if (hasattr(x, "ndim") and x.ndim > batch_axis
                and x.shape[batch_axis] % n_shards == 0):
            spec = P(*([None] * batch_axis + [axis]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def parse_mesh_flag(flag: str):
    """Parse a ``--mesh`` value: ``"data=4,model=2"``, ``"4"`` (pure DP)
    or ``"auto"`` (all devices, pure DP).  Returns ``(n_devices, model)``.
    """
    flag = flag.strip()
    if flag in ("auto", ""):
        return len(jax.devices()), 1
    if "=" not in flag:
        return int(flag), 1
    kv = dict(part.split("=") for part in flag.split(","))
    data = int(kv.get("data", 1))
    model = int(kv.get("model", 1))
    return data * model, model


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def kan_param_specs(params_layer: dict) -> dict:
    """PartitionSpec tree for one KAN layer: shard output features over
    the ``model`` axis, replicate everything small.

    base_weight (out, in)      -> ('model', None)
    spline_weight (out, in, C) -> ('model', None, None)
    spline_scaler (out, in)    -> ('model', None)
    logistic.weight (out, inK) -> ('model', None)
    ferro.* (in, out, K)       -> (None, 'model', None)
    grid (in, knots)           -> replicated
    """
    specs: dict = {}
    for name, leaf in params_layer.items():
        if name == "_buffers":
            specs[name] = {k: P() for k in leaf}
        elif name in ("base_weight", "spline_scaler"):
            specs[name] = P("model", None)
        elif name == "spline_weight":
            specs[name] = P("model", None, None)
        elif name == "logistic":
            specs[name] = {
                k: (P("model", None) if k == "weight"
                    else P("model") if k == "scaler" else P())
                for k in leaf
            }
        elif name == "ferro":
            specs[name] = {k: P(None, "model", None) for k in leaf}
        else:
            specs[name] = jax.tree_util.tree_map(lambda _: P(), leaf)
    return specs


def kan_stack_param_specs(params: list) -> list:
    return [kan_param_specs(layer) for layer in params]


def model_param_specs(tree, mesh: Mesh, *, axis: str = "model"):
    """Generic tensor-parallel placement for an arbitrary parameter tree:
    shard axis 0 (output features, by this repo's (out, in) weight
    convention) of every float leaf with ndim >= 2 whose leading dim
    divides the model-axis size; replicate everything else (biases,
    grids, scalars, int buffers).

    This is the column-parallel (Megatron-style) rule expressed as
    shardings only — GSPMD derives the all-gathers/reduce-scatters the
    downstream matmuls imply, so it is semantics-preserving for ANY
    model, including ones (ferro (in, out, K) tables) where axis 0 is an
    input axis and the compiler ends up partitioning a contraction
    instead.  Use ``kan_param_specs`` when the tree is a KAN stack and
    the hand-tuned layout matters.
    """
    n = mesh.shape[axis]

    def spec(x):
        if (n > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and np.issubdtype(x.dtype, np.floating)
                and x.shape[0] % n == 0):
            return P(axis, *([None] * (x.ndim - 1)))
        return P()

    return jax.tree_util.tree_map(spec, tree)


def shard_params(params, mesh: Mesh, specs=None):
    """Place a parameter pytree on the mesh (replicated by default)."""
    if specs is None:
        specs = jax.tree_util.tree_map(lambda _: P(), params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
