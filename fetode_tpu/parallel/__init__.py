"""Device-mesh construction and sharding rules (TPU scaling layer)."""

from fetode_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    kan_param_specs,
    kan_stack_param_specs,
    make_mesh,
    model_param_specs,
    parse_mesh_flag,
    replicated,
    shard_batch_leaves,
    shard_params,
)

from fetode_tpu.parallel.multihost import (  # noqa: F401
    global_batch_sharding,
    initialize_distributed,
    make_multislice_mesh,
)
