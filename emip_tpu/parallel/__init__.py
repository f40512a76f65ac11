from emip_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from emip_tpu.parallel.sharding import (
    leaf_partition_spec,
    state_shardings,
    shard_pytree,
    sharded_state_and_batch,
)
