"""Pallas TPU kernel for the separable (barrel-shift) affine warp.

`image_ops.transform_affine_separable` lowers a det-1 affine warp to three
shear passes of ceil(log2(L)) conditional static rolls. As plain XLA each
roll+select is an HBM sweep of the padded uint8 buffer — ~26 sweeps, ~320 MB
of traffic for a batch-32 224² warp, which leaves the op bandwidth-bound at
~1.6 ms in the fused RandAugment pipeline (BASELINE.md config-1 tail).

This kernel runs all three passes over one image resident in VMEM: one HBM
read of the image, one write of the cropped result (~12 MB per batch instead
of ~320 MB). The channel axis is folded into the lane dimension
(``[h, wp·c]`` uint8, channel-minor), so an x-shift of ``s`` pixels is a
lane-roll of ``c·s`` bytes and the y-pass is a sublane-roll — both static
per stage, with the per-row/per-column stage masks selecting which rows
take each power-of-two roll, exactly as the XLA path does. Bit-identical to
`image_ops._barrel_shift` by construction (same stage order, same masks,
same fill semantics); `tests/augmentations/test_warp_pallas.py` holds the
equality over random det-1 transforms.

The reference's counterpart is tfa's dense gather warp
(``ImageProjectiveTransformV3``, used by image_augmentations.py:120-160,
316-406); the separable formulation and this kernel are the TPU-native
replacements (gathers run ~300M elem/s on v5e — 20x slower).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from chambers_tpu.ops.image_ops import decompose_affine_shears


def _warp_kernel(img_ref, n1_ref, n1m_ref, n2e_ref, n2me_ref, n3_ref,
                 n3m_ref, o_ref, *, h, wp, c, pad, w, fill):
    # pad in VMEM (the input block is the unpadded [h, w*c] image): a
    # host-side jnp.pad would write and re-read a padded HBM copy — ~40%
    # extra traffic on top of the kernel's one-read-one-write design
    fill_cols = jnp.full((h, pad * c), jnp.uint8(fill), jnp.uint8)
    buf = jnp.concatenate([fill_cols, img_ref[0], fill_cols], axis=1)

    # padded-x pixel index per folded lane ([1, wp*c]) and row index ([h, 1])
    xidx = jax.lax.broadcasted_iota(jnp.int32, (1, wp * c), 1) // c
    yidx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)

    def x_pass(buf, nraw, nmod):
        # nraw/nmod: [h, 1] per-row shifts (pixels); lane roll is c bytes/px
        out = buf
        k = 0
        while (1 << k) < wp:
            take = ((nmod >> k) & 1) != 0
            out = jnp.where(take, jnp.roll(out, -(c << k), axis=1), out)
            k += 1
        valid = (xidx + nraw >= 0) & (xidx + nraw < wp)
        return jnp.where(valid, out, jnp.uint8(fill))

    def y_pass(buf, nraw, nmod):
        # nraw/nmod: [1, wp*c] per-column shifts (rows)
        out = buf
        k = 0
        while (1 << k) < h:
            take = ((nmod >> k) & 1) != 0
            out = jnp.where(take, jnp.roll(out, -(1 << k), axis=0), out)
            k += 1
        valid = (yidx + nraw >= 0) & (yidx + nraw < h)
        return jnp.where(valid, out, jnp.uint8(fill))

    buf = x_pass(buf, n1_ref[0], n1m_ref[0])
    buf = y_pass(buf, n2e_ref[0], n2me_ref[0])
    buf = x_pass(buf, n3_ref[0], n3m_ref[0])
    o_ref[0] = buf[:, pad * c:(pad + w) * c]


def transform_affine_separable_pallas(images, transforms, fill_value, pad,
                                      interpret=None):
    """VMEM-resident three-shear warp; drop-in for the XLA separable path.

    :param images: ``[b, h, w, c]`` uint8.
    :param transforms: ``[b, 8]`` det-1 affine matrices (output→input).
    :param fill_value: static Python scalar fill.
    :param pad: fill columns kept per side for intermediate shear excursions.
    """
    b, h, w, c = images.shape
    wp = w + 2 * pad
    t = jnp.asarray(transforms, jnp.float32)
    if t.ndim == 1:
        t = jnp.broadcast_to(t[None], (b, 8))
    A1, B1, A2, B2, A3, B3 = decompose_affine_shears(t)

    ys = jnp.arange(h, dtype=jnp.float32)[None, :]         # [1, h]
    xs = jnp.arange(wp, dtype=jnp.float32)[None, :] - pad  # [1, wp] true x
    n1 = jnp.floor(A1[:, None] * ys + B1[:, None] + 0.5).astype(jnp.int32)
    n2 = jnp.floor(A2[:, None] * xs + B2[:, None] + 0.5).astype(jnp.int32)
    n3 = jnp.floor(A3[:, None] * ys + B3[:, None] + 0.5).astype(jnp.int32)
    n1m, n2m, n3m = n1 % wp, n2 % h, n3 % wp
    # fold the x-direction vectors out to channel-minor lanes
    n2e = jnp.repeat(n2, c, axis=-1)[:, None, :]    # [b, 1, wp*c]
    n2me = jnp.repeat(n2m, c, axis=-1)[:, None, :]

    # resolve the static fill through the same dtype conversion the XLA
    # path applies (`jnp.asarray(fill_value, images.dtype)`), in pure numpy
    # so it works under an outer jit trace: Python scalars are range-checked
    # (OverflowError, as jax's weak-scalar conversion raises), numpy scalars
    # C-cast — tests/augmentations/test_warp_pallas.py pins both
    if isinstance(fill_value, (bool, int, float)):
        fill_value = int(np.asarray(fill_value, images.dtype))
    else:
        fill_value = int(np.asarray(fill_value).astype(images.dtype))

    img = images.reshape(b, h, w * c)  # channel-minor lane fold (free)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    row_spec = pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0))
    col_spec = pl.BlockSpec((1, 1, wp * c), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        partial(_warp_kernel, h=h, wp=wp, c=c, pad=pad, w=w,
                fill=int(fill_value)),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.uint8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0)),
            row_spec, row_spec, col_spec, col_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(img, n1[:, :, None], n1m[:, :, None], n2e, n2me,
      n3[:, :, None], n3m[:, :, None])
    return out.reshape(b, h, w, c)
