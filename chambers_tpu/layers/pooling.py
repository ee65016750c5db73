"""Pooling layers: generalized-mean (GeM) and ROI pooling.

Parity: reference ``chambers/layers/pooling.py``.

- ``GlobalGeneralizedMean`` (pooling.py:9-62): trainable-``p`` generalized mean
  over spatial dims, shared or per-channel ``p``. The reference pins this layer
  to float32 under mixed precision (pooling.py:22-23) because ``x**p`` is
  unstable in half precision — replicated here by computing in float32.
- ``RoiPooling`` (pooling.py:65-122): ROI max-pooling. The reference crops each
  ROI with ``map_fn`` (host-serialized); here each ROI becomes a masked max
  over the full feature map — static shapes, fully batched, XLA-fusible on
  TPU (no dynamic crops).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPSILON = 1e-7  # tf.keras.backend.epsilon()


class GlobalGeneralizedMean(nn.Module):
    """Generalized-mean pooling over spatial dims of ``[b, h, w, c]`` inputs.

    ``p=1`` is average pooling; ``p → inf`` approaches max pooling.
    Reference: Radenović et al., "Fine-tuning CNN Image Retrieval with No
    Human Annotation" (arXiv:1711.02512).
    """

    p: float = 3.0
    shared: bool = True
    trainable: bool = True
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        p_shape = (1,) if self.shared else (inputs.shape[-1],)
        p = self.param(
            "p", nn.initializers.constant(self.p), p_shape, self.param_dtype
        )
        if not self.trainable:
            p = jax.lax.stop_gradient(p)

        x = inputs.astype(jnp.float32)
        x = jnp.clip(x, _EPSILON, jnp.max(x))
        x = jnp.power(x, p)
        x = jnp.mean(x, axis=(1, 2))
        x = jnp.power(x, 1.0 / p)
        return x


def roi_max_pool(x, roi_boxes):
    """Max-pool rectangular ROIs of a feature map via masked reduction.

    :param x: ``[batch, H, W, C]`` feature maps.
    :param roi_boxes: ``[batch, num_rois, 4]`` int boxes ``(x, y, w, h)``
        (column offset, row offset, width, height) — the reference's ordering
        (pooling.py:99-110).
    :return: ``[batch, num_rois, C]`` per-ROI channel maxima.
    """
    h, w = x.shape[1], x.shape[2]
    rows = jnp.arange(h)[:, None]  # [H, 1]
    cols = jnp.arange(w)[None, :]  # [1, W]

    boxes = roi_boxes.astype(jnp.int32)
    ox, oy = boxes[..., 0], boxes[..., 1]
    tw, th = boxes[..., 2], boxes[..., 3]

    # [batch, num_rois, H, W] membership mask
    row_in = (rows[None, None] >= oy[..., None, None]) & (
        rows[None, None] < (oy + th)[..., None, None]
    )
    col_in = (cols[None, None] >= ox[..., None, None]) & (
        cols[None, None] < (ox + tw)[..., None, None]
    )
    mask = row_in & col_in

    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    masked = jnp.where(mask[..., None], x[:, None], neg_inf)  # [b, R, H, W, C]
    return jnp.max(masked, axis=(2, 3))


class RoiPooling:
    """ROI max-pooling layer over ``[x_img, x_roi]`` input lists."""

    def __call__(self, inputs):
        x, roi_boxes = inputs
        return roi_max_pool(x, roi_boxes)


def spatial_pyramid_roi_pool(x, rois, pool_list):
    """SPP-style multi-scale ROI pooling (the reference's ``RoiPooling_OG``,
    pooling.py:125-236; He et al., Spatial Pyramid Pooling).

    Each ROI is divided into ``i x i`` grids for every ``i`` in ``pool_list``
    and each cell max-pooled — fully vectorized masked-max over (batch, roi,
    cell) instead of the reference's Python cell loops.

    :param x: ``[b, H, W, C]`` feature maps.
    :param rois: ``[b, R, 4]`` boxes ``(x, y, w, h)``.
    :return: ``[b, R, C * sum(i*i for i in pool_list)]``.
    """
    b, H, W, C = x.shape
    rois = rois.astype(jnp.float32)
    bx, by = rois[..., 0], rois[..., 1]   # [b, R]
    bw, bh = rois[..., 2], rois[..., 3]

    rows = jnp.arange(H)[:, None]  # [H, 1]
    cols = jnp.arange(W)[None, :]  # [1, W]
    outputs = []
    for n in pool_list:
        # cell edge coordinates, rounded like the reference (K.round)
        steps = jnp.arange(n + 1, dtype=jnp.float32)  # [n+1]
        # reference: col_length = h/n applied to y, row_length = w/n to x
        x_edges = jnp.round(bx[..., None] + steps * (bw[..., None] / n))
        y_edges = jnp.round(by[..., None] + steps * (bh[..., None] / n))
        x0, x1 = x_edges[..., :-1], x_edges[..., 1:]   # [b, R, n]
        y0, y1 = y_edges[..., :-1], y_edges[..., 1:]

        col_in = (cols[None, None, None] >= x0[..., None, None]) & (
            cols[None, None, None] < x1[..., None, None]
        )  # [b, R, n, 1, W] -> note broadcasting below
        row_in = (rows[None, None, None] >= y0[..., None, None]) & (
            rows[None, None, None] < y1[..., None, None]
        )  # [b, R, n, H, 1]

        # mask [b, R, ny, nx, H, W]
        mask = row_in[:, :, :, None] & col_in[:, :, None, :]
        neg_inf = jnp.asarray(-jnp.inf, x.dtype)
        masked = jnp.where(
            mask[..., None], x[:, None, None, None], neg_inf
        )  # [b, R, ny, nx, H, W, C]
        pooled = jnp.max(masked, axis=(4, 5))  # [b, R, ny, nx, C]
        # empty cells (rounding collapse) -> 0 instead of -inf
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
        outputs.append(pooled.reshape(b, rois.shape[1], -1))

    return jnp.concatenate(outputs, axis=-1)


class RoiPooling_OG:
    """SPP ROI-pooling layer over ``[x_img, x_roi]`` (reference name kept)."""

    def __init__(self, pool_list, num_rois=None):
        self.pool_list = list(pool_list)
        self.num_rois = num_rois  # kept for signature parity; inferred at call

    def __call__(self, inputs):
        x, rois = inputs
        return spatial_pyramid_roi_pool(x, rois, self.pool_list)
