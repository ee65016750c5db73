from chambers_tpu.parallel.mesh import create_mesh
from chambers_tpu.parallel.sharding import (
    VIT_TENSOR_PARALLEL_RULES,
    batch_sharding,
    make_param_shardings,
    replicate,
    shard_batch,
    shard_params,
)
