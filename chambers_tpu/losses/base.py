"""Keras ``Loss`` call contract: ``sample_weight`` and ``reduction``.

Every reference loss subclasses ``tf.keras.losses.Loss``
(reference ``chambers/losses/metric_learning.py:9``), which brings the public
call contract with it::

    loss_obj = SomeLoss(reduction="sum_over_batch_size")   # | "sum" | "none"
    value = loss_obj(y_true, y_pred, sample_weight=w)

Semantics (pinned against the installed ``tf.keras.losses.Loss`` in
``tests/losses/test_loss_contract.py``):

- ``call(y_true, y_pred)`` returns the PER-SAMPLE loss vector (shape ``[n]``
  or finer); ``__call__`` weights and reduces it.
- ``sample_weight`` broadcasts against the per-sample losses — a scalar, a
  ``[n]`` vector, or a ``[n, 1]`` column all weight sample ``i``'s loss.
- ``reduction="sum_over_batch_size"`` (default): ``sum(w * losses) /
  losses.size`` — Keras divides by the NUMBER OF LOSS ELEMENTS, not by the
  sum of weights.
- ``reduction="sum"``: ``sum(w * losses)``.
- ``reduction="none"`` (or ``None``): the weighted per-sample losses.
"""

import jax.numpy as jnp

_REDUCTIONS = ("sum_over_batch_size", "sum", "none")


def reduce_weighted_loss(losses, sample_weight=None,
                         reduction="sum_over_batch_size"):
    """Apply Keras ``compute_weighted_loss`` semantics to per-sample losses.

    Broadcast rules match Keras's squeeze-or-expand: a weight with one MORE
    trailing length-1 axis than the losses is squeezed; a weight with FEWER
    axes is expanded with trailing length-1 axes (leading-axes broadcast).
    """
    losses = jnp.asarray(losses)
    if not jnp.issubdtype(losses.dtype, jnp.floating):
        losses = losses.astype(jnp.float32)
    if sample_weight is not None:
        w = jnp.asarray(sample_weight).astype(losses.dtype)
        if w.ndim == losses.ndim + 1 and w.shape[-1] == 1:
            w = jnp.squeeze(w, axis=-1)
        elif w.ndim and w.ndim < losses.ndim:
            w = w.reshape(w.shape + (1,) * (losses.ndim - w.ndim))
        losses = losses * w
    if reduction == "none":
        return losses
    total = jnp.sum(losses)
    if reduction == "sum":
        return total
    # sum_over_batch_size: divide by the element count of the (unreduced)
    # per-sample losses — with no weights this is the plain mean
    return total / losses.size


class Loss:
    """Base class giving any per-sample ``call`` the Keras ``Loss`` contract.

    Subclasses implement ``call(y_true, y_pred) -> per-sample losses``;
    ``__call__(y_true, y_pred, sample_weight=None)`` weights and reduces per
    the constructor's ``reduction``. Matches the contract of
    ``tf.keras.losses.Loss`` that the reference's losses inherit
    (reference ``chambers/losses/metric_learning.py:9``).
    """

    def __init__(self, reduction="sum_over_batch_size", name=None):
        if reduction is None:
            reduction = "none"
        if reduction == "auto":  # tf.keras legacy alias for the default
            reduction = "sum_over_batch_size"
        if reduction not in _REDUCTIONS:
            raise ValueError(
                f"reduction={reduction!r}: use one of {_REDUCTIONS} "
                "(or None, an alias for 'none')"
            )
        self.reduction = reduction
        self.name = name

    def call(self, y_true, y_pred):
        """Per-sample loss values (the unreduced ``[n]``-or-finer tensor)."""
        raise NotImplementedError

    def __call__(self, y_true, y_pred, sample_weight=None):
        return reduce_weighted_loss(
            self.call(y_true, y_pred), sample_weight, self.reduction
        )
