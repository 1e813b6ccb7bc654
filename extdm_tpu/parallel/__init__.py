from extdm_tpu.parallel.mesh import (
    batch_sharding,
    make_data_mesh,
    make_hybrid_mesh,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding",
    "make_data_mesh",
    "make_hybrid_mesh",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_params",
]
