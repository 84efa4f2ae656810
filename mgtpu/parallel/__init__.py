from mgtpu.parallel.mesh import (
    fetch_global,
    gather_tree,
    is_primary,
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
    shard_opt_zero1,
    shard_params_tp,
    tp_sharding,
    zero1_spec,
)
