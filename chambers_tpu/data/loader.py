"""Device-feeding utilities: overlap host→device transfer with compute.

The reference relies on tf.data's internal prefetching into TF's runtime;
the JAX-native equivalent is explicit: keep ``size`` batches in flight on
device while the current step computes (transfers are async in JAX, so
issuing ``device_put`` ahead of use is enough — no thread needed on the
device side; host-side production is already covered by
``Dataset.prefetch``).
"""

from collections import deque
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(iterable: Iterable, size: int = 2,
                    sharding=None) -> Iterator:
    """Iterate batches with ``size`` transfers in flight ahead of use.

    :param sharding: optional ``jax.sharding.Sharding`` (e.g.
        ``batch_sharding(mesh)``) applied to every array leaf; defaults to
        the default device.
    """
    if size < 1:
        raise ValueError("size must be >= 1")

    def put(batch):
        if sharding is None:
            return jax.tree.map(jax.device_put, batch)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue = deque()
    it = iter(iterable)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass

    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
