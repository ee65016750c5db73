"""Tensor utilities.

Parity: reference ``chambers/utils/tensor.py:6-34``.
"""

import jax.numpy as jnp
import numpy as np


def remove_indices(x, indices, axis=0):
    """Drop the given ``indices`` along ``axis``.

    ``indices`` must be a static (Python) list; the keep-index set is built
    in NumPy so the op stays shape-static and jittable.
    """
    length = x.shape[axis]
    mask = np.ones((length,), dtype=bool)
    mask[np.asarray(indices)] = False
    keep = jnp.asarray(np.arange(length)[mask])
    return jnp.take(x, keep, axis=axis)


def remove_diagonal(mat):
    """Remove the diagonal of an ``[n, m]`` matrix, giving ``[n, m-1]``
    (shape-static: indices computed in NumPy, gather under jit)."""
    n, m = mat.shape
    mask = ~np.eye(n, m, dtype=bool)
    rows, cols = np.nonzero(mask)
    return mat[jnp.asarray(rows), jnp.asarray(cols)].reshape(n, m - 1)


def arg_to_gather_nd(arg):
    """Turn per-row indices ``[n, k]`` into flat ``[n*k, 2]`` (row, col)
    coordinate pairs — the reference's helper for feeding argsort output to
    ``gather_nd`` (utils/tensor.py:28-34). On jnp prefer
    :func:`take_along_rows`, which gathers directly; this exists for users
    porting code that builds explicit coordinate lists."""
    arg = jnp.asarray(arg)
    n = arg.shape[0]
    rows = jnp.broadcast_to(jnp.arange(n, dtype=arg.dtype)[:, None],
                            arg.shape)
    return jnp.stack([rows, arg], axis=-1).reshape(-1, 2)


def take_along_rows(mat, indices):
    """Gather ``mat[i, indices[i, j]]`` — the dense equivalent of the
    reference's ``arg_to_gather_nd`` + ``gather_nd`` pattern
    (utils/tensor.py:28-34, utils/ranking.py:20-23)."""
    return jnp.take_along_axis(mat, indices, axis=1)
