"""Tensor utilities.

Parity: reference ``chambers/utils/tensor.py:6-34``.
"""

import jax.numpy as jnp


def remove_indices(x, indices, axis=0):
    """Drop the given ``indices`` along ``axis``.

    Note: ``indices`` must be a static (Python) list for XLA shape inference.
    """
    length = x.shape[axis]
    mask = jnp.ones((length,), dtype=bool).at[jnp.asarray(indices)].set(False)
    keep = jnp.arange(length)[mask]
    return jnp.take(x, keep, axis=axis)


def remove_diagonal(mat):
    """Remove the diagonal of an ``[n, m]`` matrix, giving ``[n, m-1]``."""
    n, m = mat.shape
    mask = ~jnp.eye(n, m, dtype=bool)
    return mat[mask].reshape(n, m - 1)


def take_along_rows(mat, indices):
    """Gather ``mat[i, indices[i, j]]`` — the dense equivalent of the
    reference's ``arg_to_gather_nd`` + ``gather_nd`` pattern
    (utils/tensor.py:28-34, utils/ranking.py:20-23)."""
    return jnp.take_along_axis(mat, indices, axis=1)
