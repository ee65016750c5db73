"""Pytree path utilities shared by the optimizer decay masks and the
parallel sharding rules (both match regexes against the same
``/``-joined key-path format)."""

import jax


def param_paths(params):
    """Flattened ``/``-joined key paths of a params pytree, in
    ``tree_flatten_with_path`` leaf order."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = []
    for key_path, _ in flat:
        parts = []
        for k in key_path:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        paths.append("/".join(parts))
    return paths
