"""Multi-host / multi-slice initialisation.

SURVEY.md §5.8: the TPU-native distributed backend is
``jax.distributed.initialize`` + a mesh whose inner axes ride ICI within a
slice and whose outer (data) axis crosses slices over DCN.  There is no
NCCL/MPI analogue to manage — the XLA runtime owns transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialise the JAX distributed runtime (no-op on a single process;
    on TPU pods the arguments are auto-detected from the environment)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multislice_mesh(model: int = 1) -> Mesh:
    """('dcn', 'data', 'model') mesh: the DCN axis spans slices (device
    granule boundaries), ICI axes stay inside a slice.  Falls back to a
    trivial dcn=1 mesh on a single slice."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    try:
        slices = sorted({d.slice_index for d in devices.flat})
        n_slices = len(slices)
    except AttributeError:
        n_slices = 1
    per_slice = n // n_slices
    if per_slice % model:
        raise ValueError(f"{per_slice} devices/slice not divisible by "
                         f"model={model}")
    dev = devices.reshape(n_slices, per_slice // model, model)
    return Mesh(dev, ("dcn", "data", "model"))


def global_batch_sharding(mesh: Mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    return NamedSharding(mesh, P(axes))
