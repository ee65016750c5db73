"""Expert parallelism: sharding rules for Mixture-of-Experts layers.

Companion to ``chambers_tpu.layers.moe`` (SURVEY.md §2.8 EP row — absent
from the single-device reference; supplied here TPU-natively). The MoE
layer keeps every expert weight stacked on a leading ``[n_experts, ...]``
axis and expresses dispatch/combine as einsums, so expert parallelism is
*pure sharding*: annotate that leading axis over a mesh axis and XLA's
SPMD partitioner splits the expert matmuls across devices and inserts the
all-to-all-shaped collectives where the ``[tokens, experts, capacity]``
dispatch tensors meet the expert-sharded operands. The router stays
replicated (it is ``[d, n_experts]`` — tiny).

No shard_map, no hand-written collectives: this is the "annotate and let
XLA partition" recipe, the same mechanism the DP/TP layer uses
(``chambers_tpu.parallel.sharding``).
"""

from typing import List, Tuple

from jax.sharding import PartitionSpec as P


def moe_expert_parallel_rules(axis: str = "model") -> List[Tuple[str, P]]:
    """Param-path regex -> PartitionSpec rules sharding every MoE expert
    weight's leading (expert) axis over ``axis``.

    Compose with the TP rules when running TP x EP on one ``model`` axis,
    or pass a dedicated ``expert`` mesh axis::

        rules = VIT_TENSOR_PARALLEL_RULES + moe_expert_parallel_rules("model")
        shardings = make_param_shardings(params, mesh, rules)

    ``n_experts`` must be divisible by the mesh axis size.
    """
    # w1/b1/w2/b2/w_router are MoEMLP-specific param names (no other layer
    # in the package uses them), so match them at any nesting depth
    return [
        (r"(^|/)w1$", P(axis, None, None)),
        (r"(^|/)b1$", P(axis, None)),
        (r"(^|/)w2$", P(axis, None, None)),
        (r"(^|/)b2$", P(axis, None)),
        # router replicated (explicit, so composed rule lists stay readable)
        (r"(^|/)w_router$", P()),
    ]
