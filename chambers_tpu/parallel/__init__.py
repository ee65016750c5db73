from chambers_tpu.parallel.mesh import create_mesh
from chambers_tpu.parallel.distributed import (
    host_local_batch_to_global,
    init_distributed,
)
from chambers_tpu.parallel.collective_eval import (
    distributed_pairwise_scores,
    distributed_recall_at_k,
)
from chambers_tpu.parallel.context_parallel import context_parallel_attention
from chambers_tpu.parallel.expert_parallel import moe_expert_parallel_rules
from chambers_tpu.parallel.fsdp import fsdp_rules
from chambers_tpu.parallel.pipeline_parallel import (
    group_layers_into_stages,
    pipeline_apply,
    shard_pipeline_params,
    stack_pipeline_stages,
)
from chambers_tpu.parallel.sharding import (
    SEQ2SEQ_TENSOR_PARALLEL_RULES,
    VIT_TENSOR_PARALLEL_RULES,
    batch_sharding,
    make_param_shardings,
    replicate,
    shard_batch,
    shard_params,
    shard_quantized,
)
