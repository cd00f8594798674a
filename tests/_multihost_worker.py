"""Worker for the 2-process jax.distributed CPU smoke test.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>

Each process exposes 2 virtual CPU devices; together they form a 4-device
('data', 'model') mesh. The worker builds a global sharded array from
process-local shards, runs a jitted global reduction (GSPMD inserts the
cross-process collective), and prints the result for the parent to check.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from fetode_tpu.parallel.multihost import initialize_distributed  # noqa: E402

initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()

mesh = Mesh(np.asarray(jax.devices()).reshape(2 * nproc, 1),
            ("data", "model"))
sharding = NamedSharding(mesh, P("data"))

# Global (4,) array assembled from process-local shards: [0, 1, 2, 3].
global_shape = (2 * nproc,)
arr = jax.make_array_from_callback(
    global_shape, sharding, lambda idx: np.arange(4.0)[idx])

total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
print(f"proc{pid} SUM {float(total):.1f}", flush=True)
jax.distributed.shutdown()
