"""R-MAC image descriptor.

Parity: reference ``chambers/layers/descriptors.py``.

``rmac_regions`` reproduces the multi-scale region grid of Tolias et al.
("Particular object retrieval with integral max-pooling of CNN activations"):
square regions of side ``2*min(W,H)/(l+1)`` at scales ``l = 1..L`` with ~40%
overlap, extra regions along the long dimension (descriptors.py:6-63).

The reference pools each region with a ``map_fn`` crop (descriptors.py:100-115,
host-serialized). On TPU the region grid is static — it is computed once in
numpy at trace time and baked into boolean masks, so pooling is a single
batched masked-max, fully fused by XLA.
"""

import jax.numpy as jnp
import numpy as np


def _axis_offsets(extent: int, side: int, slots: int) -> np.ndarray:
    """Top-left coordinates of ``slots`` side-``side`` squares spread evenly
    over ``[0, extent)``: ``floor(k * (extent - side) / (slots - 1))``."""
    if slots <= 1:
        return np.zeros(1, dtype=np.int64)
    stride = (extent - side) / (slots - 1)
    return np.floor(np.arange(slots) * stride).astype(np.int64)


def rmac_regions(W: int, H: int, L: int) -> np.ndarray:
    """Compute the R-MAC region grid (Tolias et al., sec. 3.2).

    Scale ``l`` tiles the map with squares of side ``floor(2*min(W,H)/(l+1))``
    in an ``(l + extra_y) x (l + extra_x)`` grid, where the longer axis gets
    ``extra`` additional slots chosen so that scale-1 neighbors overlap by
    ~40% of a square side.

    :param W: feature-map extent along the first grid axis.
    :param H: extent along the second.
    :param L: number of scales.
    :return: ``[n_regions, 4]`` int array of ``(x, y, side, side)`` boxes.
    """
    short, long_side = min(W, H), max(W, H)
    # candidate slot counts 2..7 along the long axis at scale 1 (side=short):
    # stride/side closest to 0.6 == overlap closest to 0.4
    candidates = np.arange(2, 8)
    stride_over_side = (long_side - short) / (candidates - 1) / short
    extra = int(np.argmin(np.abs(stride_over_side - 0.6))) + 1

    extra_x = extra if W > H else 0
    extra_y = extra if H > W else 0

    boxes = []
    for scale in range(1, L + 1):
        side = 2 * short // (scale + 1)
        if side == 0:  # degenerate squares are dropped, not emitted
            continue
        xs = _axis_offsets(W, side, scale + extra_x)
        ys = _axis_offsets(H, side, scale + extra_y)
        grid_x, grid_y = np.meshgrid(xs, ys)  # y-major, x-minor emission order
        for x0, y0 in zip(grid_x.ravel(), grid_y.ravel()):
            boxes.append((x0, y0, side, side))
    return np.asarray(boxes, dtype=np.int64)


def _region_masks(regions: np.ndarray, H: int, W: int) -> np.ndarray:
    """[n_regions, H, W] boolean membership masks for a static region grid."""
    rows = np.arange(H)[None, :, None]
    cols = np.arange(W)[None, None, :]
    ox = regions[:, 0, None, None]
    oy = regions[:, 1, None, None]
    tw = regions[:, 2, None, None]
    th = regions[:, 3, None, None]
    return (rows >= oy) & (rows < oy + th) & (cols >= ox) & (cols < ox + tw)


class RMAC:
    """Regional Maximum Activation of Convolutions descriptor.

    Maps ``[batch, H, W, C]`` feature maps to ``[batch, n_regions, C]``
    per-region channel maxima. Typically followed by L2-norm + sum + L2-norm.
    """

    def __init__(self, scales: int = 3):
        self.scales = scales
        self._masks = None
        self._spatial = None

    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        if self._masks is None or self._spatial != (H, W):
            # Note: reference passes (w, h) = (input_shape[1], input_shape[2])
            # into rmac_regions(W=dim1, H=dim2) (descriptors.py:79-87), i.e.
            # its "W" is the first spatial axis. Replicated here.
            regions = rmac_regions(H, W, self.scales)
            self._masks = _region_masks(regions, H, W)
            self._spatial = (H, W)

        masks = jnp.asarray(self._masks)
        neg_inf = jnp.asarray(-jnp.inf, x.dtype)
        # [b, R, H, W, C] masked features -> [b, R, C]
        masked = jnp.where(masks[None, :, :, :, None], x[:, None], neg_inf)
        return jnp.max(masked, axis=(2, 3))
