"""Device mesh construction.

The reference has no distribution layer (SURVEY.md §2.8: zero
``tf.distribute``/NCCL/MPI usage — single process, single device). This
module supplies the TPU-native equivalent: a ``jax.sharding.Mesh`` over the
slice's devices with named axes; parameters and batches are annotated with
``NamedSharding`` (see ``chambers_tpu.parallel.sharding``) and XLA emits the
collectives (gradient psum over ``data``, activation all-reduce over
``model``) — no hand-written communication layer.
"""

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(axes: Optional[Dict[str, int]] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Create a named device mesh.

    :param axes: mapping axis name → size, e.g. ``{"data": 4, "model": 2}``.
        A size of ``-1`` absorbs the remaining devices. Defaults to a pure
        data-parallel mesh over all devices.
    :param devices: devices to use (defaults to ``jax.devices()``).

    Example::

        mesh = create_mesh({"data": -1})              # DP over all chips
        mesh = create_mesh({"data": 2, "model": 4})   # 2-way DP x 4-way TP
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)

    if axes is None:
        axes = {"data": n}
    axes = dict(axes)

    unknown = [k for k, v in axes.items() if v == -1]
    if len(unknown) > 1:
        raise ValueError("At most one axis may have size -1.")
    if unknown:
        known = int(np.prod([v for v in axes.values() if v != -1]))
        if n % known:
            raise ValueError(
                f"{n} devices not divisible by fixed axes product {known}."
            )
        axes[unknown[0]] = n // known

    total = int(np.prod(list(axes.values())))
    if total != n:
        raise ValueError(
            f"Mesh axes {axes} require {total} devices but {n} are available."
        )

    device_array = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(device_array, tuple(axes.keys()))
