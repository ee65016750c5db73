"""Multi-host (multi-process) utilities.

SURVEY.md §2.8/§5.8: the TPU-native distribution story is
``jax.distributed.initialize`` + a mesh over all devices + per-host data
loading feeding ``jax.make_array_from_process_local_data`` — XLA emits every
collective. These helpers wrap that recipe; in a single-process run they
degrade to no-ops, so the same training script runs on one chip, one host
with N chips, or a multi-host slice.
"""

from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-process JAX when launched on a multi-host slice.

    With no arguments, relies on the TPU environment's auto-detection
    (``jax.distributed.initialize()``); single-process (or already
    initialized) environments are left untouched.

    :return: summary dict with process_index/process_count/device counts.

    Must run before anything initializes the XLA backend (jax refuses to go
    distributed afterwards) — call it first in your main. With explicit
    arguments, failures propagate loudly (a multi-host job silently falling
    back to per-host training produces wrong gradients); only the
    auto-detect path tolerates "not a distributed environment".
    """
    if coordinator_address or num_processes:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process (CPU tests, one-host runs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def host_local_batch_to_global(batch, mesh, axis: str = "data",
                               batch_axis: int = 0):
    """Assemble per-host batch shards into one global sharded array.

    Each process passes its *local* slice of the global batch (e.g. from a
    per-host data pipeline); the result is a global ``jax.Array`` sharded
    over ``axis`` — the multi-host equivalent of
    ``chambers_tpu.parallel.shard_batch``.

    ``batch_axis``: which array axis carries the batch (sharded) dimension;
    0 for ordinary ``[batch, ...]`` arrays (every in-repo caller, including
    the Trainer's per-batch placement — its ``steps_per_execution``
    ``[n_steps, batch, ...]`` window stack happens INSIDE the jitted
    program, where the axis-1 sharding propagates from these axis-0
    placements rather than through this function).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(*([None] * batch_axis), axis))

    def convert(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(convert, batch)
