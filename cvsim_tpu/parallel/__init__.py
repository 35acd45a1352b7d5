from cvsim_tpu.parallel.mesh import (
    make_mesh,
    field_sharding,
    shard_fields,
    run_sharded_chain,
)

__all__ = ["make_mesh", "field_sharding", "shard_fields", "run_sharded_chain"]
