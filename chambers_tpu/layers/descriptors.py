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


def rmac_regions(W: int, H: int, L: int) -> np.ndarray:
    """Compute the R-MAC region grid.

    :param W: feature-map width.
    :param H: feature-map height.
    :param L: number of scales.
    :return: ``[n_regions, 4]`` int array of ``(x, y, w, h)`` boxes.
    """
    ovr = 0.4  # desired overlap of neighboring regions
    steps = np.array([2, 3, 4, 5, 6, 7], dtype=np.float64)

    w = min(W, H)
    b = (max(H, W) - w) / (steps - 1)
    # number of extra regions for the long dimension that best matches overlap
    idx = np.argmin(np.abs(((w ** 2 - w * b) / w ** 2) - ovr))

    Wd, Hd = 0, 0
    if H < W:
        Wd = idx + 1
    elif H > W:
        Hd = idx + 1

    regions = []
    for l in range(1, L + 1):
        wl = np.floor(2 * w / (l + 1))
        wl2 = np.floor(wl / 2 - 1)

        b = 0 if (l + Wd - 1) == 0 else (W - wl) / (l + Wd - 1)
        cen_w = np.floor(wl2 + np.arange(0, l + Wd) * b) - wl2

        b = 0 if (l + Hd - 1) == 0 else (H - wl) / (l + Hd - 1)
        cen_h = np.floor(wl2 + np.arange(0, l + Hd) * b) - wl2

        for i_ in cen_h:
            for j_ in cen_w:
                box = np.array([j_, i_, wl, wl], dtype=np.int64)
                if not min(box[2:]):
                    continue
                regions.append(box)

    return np.asarray(regions)


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
