"""Pallas TPU kernels for the separable warp and the fused RandAugment round.

`image_ops.transform_affine_separable` lowers a det-1 affine warp to three
shear passes of ceil(log2(L)) conditional static rolls. As plain XLA each
roll+select is an HBM sweep of the padded uint8 buffer — ~26 sweeps, ~320 MB
of traffic for a batch-32 224² warp, which leaves the op bandwidth-bound at
~1.6 ms in the fused RandAugment pipeline (BASELINE.md config-1 tail).

Two kernels share the same layout trick — the channel axis folds into the
lane dimension (``[h, w·c]`` uint8, channel-minor), so an x-shift of ``s``
pixels is a lane-roll of ``c·s`` bytes and a y-shift is a sublane-roll:

- :func:`transform_affine_separable_pallas` — the warp alone: all three
  shear passes over one image resident in VMEM (one HBM read, one write,
  padding built in VMEM). Bit-identical to `image_ops._barrel_shift` by
  construction (same stage order, same masks, same fill semantics);
  `tests/augmentations/test_warp_pallas.py` holds the equality.

- :func:`fused_round_pallas` — one whole elementwise-RandAugment round for
  the non-LUT ops: each image *dispatches* on its sampled op (scalar-
  prefetched class id, `pl.when`-predicated branches) and computes ONLY
  that op — warp, Color, Sharpness, CutOut, or passthrough — instead of
  the XLA formulation's compute-all-then-select. This is the TPU-native
  analogue of the per-image `tf.cond` dispatch the reference runs on CPU
  (image_augmentations.py:606-617): same per-image semantics, but as
  predicated VMEM-resident branches rather than host control flow. Every
  branch mirrors its `image_ops` op's arithmetic order exactly (Color's
  255.5-truncating grayscale, Sharpness's 9-term int32 sum with
  round-half-to-even ÷13, blend's clip-then-truncate), so outputs are
  bit-identical to the unfused composition.

The reference's counterpart is tfa's dense gather warp
(``ImageProjectiveTransformV3``, used by image_augmentations.py:120-160,
316-406); the separable formulation and these kernels are the TPU-native
replacements (gathers run ~300M elem/s on v5e — 20x slower).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chambers_tpu.ops.image_ops import decompose_affine_shears

# ITU-R 601 grayscale weights — must match image_ops._GRAY_WEIGHTS
_GRAY_W = (0.299, 0.587, 0.114)

# op-class ids for fused_round_pallas (kernel-internal contract)
PASSTHROUGH, WARP, COLOR, SHARPNESS, CUTOUT = range(5)

# fused_round_pallas pointwise branches: if a whole-image f32 plane set
# (~6 live) stays under this budget the branch compiles as one chunk
# (224px: 3.6 MB); above it, 128-row strips keep the scoped-VMEM stack
# under the 16 MB limit (384px whole-image measured 17.01 MB). Tests
# shrink the budget to force the multi-chunk path on small images.
_POINTWISE_WHOLE_IMAGE_BUDGET = 8 * 1024 * 1024


def _resolve_fill(fill_value, dtype):
    """Static fill via the same dtype conversion as the XLA path's
    `jnp.asarray(fill_value, images.dtype)`, in pure numpy so it works under
    an outer jit trace: Python scalars are range-checked (OverflowError, as
    jax's weak-scalar conversion raises), numpy scalars C-cast —
    tests/augmentations/test_warp_pallas.py pins both."""
    if isinstance(fill_value, (bool, int, float)):
        return int(np.asarray(fill_value, dtype))
    return int(np.asarray(fill_value).astype(dtype))


def _warp_body(img, n1, n1m, n2e, n2me, n3, n3m, *, h, wp, c, pad, w, fill):
    """Three barrel-shift shear passes on a ``[h, w*c]`` VMEM block.

    Pads in VMEM (a host-side jnp.pad would write and re-read a padded HBM
    copy — ~40% extra traffic on top of the one-read-one-write design).
    """
    fill_cols = jnp.full((h, pad * c), jnp.uint8(fill), jnp.uint8)
    buf = jnp.concatenate([fill_cols, img, fill_cols], axis=1)

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

    buf = x_pass(buf, n1, n1m)
    buf = y_pass(buf, n2e, n2me)
    buf = x_pass(buf, n3, n3m)
    return buf[:, pad * c:(pad + w) * c]


def _warp_kernel(img_ref, n1_ref, n1m_ref, n2e_ref, n2me_ref, n3_ref,
                 n3m_ref, o_ref, *, h, wp, c, pad, w, fill):
    o_ref[0] = _warp_body(
        img_ref[0], n1_ref[0], n1m_ref[0], n2e_ref[0], n2me_ref[0],
        n3_ref[0], n3m_ref[0], h=h, wp=wp, c=c, pad=pad, w=w, fill=fill,
    )


def _shift_vectors(transforms, b, h, w, c, pad):
    """Per-pass integer shift vectors for the three-shear decomposition
    (identical arithmetic to `image_ops.transform_affine_separable`)."""
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
    return (n1[:, :, None], n1m[:, :, None], n2e, n2me,
            n3[:, :, None], n3m[:, :, None])


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
    n1, n1m, n2e, n2me, n3, n3m = _shift_vectors(transforms, b, h, w, c, pad)
    fill = _resolve_fill(fill_value, images.dtype)

    img = images.reshape(b, h, w * c)  # channel-minor lane fold (free)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    row_spec = pl.BlockSpec((1, h, 1), lambda i: (i, 0, 0))
    col_spec = pl.BlockSpec((1, 1, wp * c), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        partial(_warp_kernel, h=h, wp=wp, c=c, pad=pad, w=w, fill=fill),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.uint8),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0)),
            row_spec, row_spec, col_spec, col_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(img, n1, n1m, n2e, n2me, n3, n3m)
    return out.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# fused per-image-dispatch round kernel
# ---------------------------------------------------------------------------

def _fused_round_kernel(meta_ref, factors_ref, img_ref, n1_ref, n1m_ref,
                        n2e_ref, n2me_ref, n3_ref, n3m_ref, o_ref, *, h, wp,
                        c, pad, w, fill, cut_half, cut_fill):
    """One augmentation round for one image: dispatch on the sampled op.

    ``meta_ref`` is scalar-prefetched ``[b, 3]`` int32: (op class, cutout
    center y, cutout center x); ``factors_ref`` is ``[b, 2]`` float32
    per-image (Color, Sharpness) blend factors. Exactly one `pl.when`
    branch runs per image; every branch writes the full output block.
    """
    i = pl.program_id(0)
    opc = meta_ref[i, 0]
    img = img_ref[0]  # [h, w*c] uint8

    # unpadded pixel x / channel / row indices per folded lane
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w * c), 1)
    xpix = lane // c
    ch = lane - c * xpix
    yrow = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)

    @pl.when(opc == PASSTHROUGH)
    def _():
        o_ref[0] = img

    @pl.when(opc == WARP)
    def _():
        o_ref[0] = _warp_body(
            img, n1_ref[0], n1m_ref[0], n2e_ref[0], n2me_ref[0],
            n3_ref[0], n3m_ref[0], h=h, wp=wp, c=c, pad=pad, w=w, fill=fill,
        )

    # The COLOR / SHARPNESS branches strip-mine over static row chunks:
    # their temporaries are f32/i32 planes (4 bytes/px vs the warp's u8),
    # and with ~6 of them live a whole-image formulation busts the 16 MB
    # scoped-VMEM stack at 384px (Mosaic measured 17.01 MB). Both ops are
    # row-local (sharpness needs a ±1-row halo, provided below), so
    # chunking changes no pixel's arithmetic. Small images keep the
    # single whole-image chunk (unchanged codegen — chunking 224px
    # measured ~2% off on config 1); big ones take 128-row strips
    # (each plane ≤ ~0.6 MB at 384px).
    _CHUNK = (h if 6 * h * w * c * 4 <= _POINTWISE_WHOLE_IMAGE_BUDGET
              else 128)

    @pl.when(opc == COLOR)
    def _():
        # image_ops.color == blend(to_grayscale(x) broadcast, x, factor),
        # arithmetic order mirrored exactly: unit-scale, ITU-R 601 weighted
        # sum, ×255.5 clip truncate, then blend's clip-truncate
        f = factors_ref[i, 0]
        for r0 in range(0, h, _CHUNK):
            rows = min(_CHUNK, h - r0)
            sub = img[r0:r0 + rows]
            inv = jnp.float32(1.0) / jnp.float32(255.0)
            # Mosaic has no direct u8->f32 cast; i32 is the supported route
            unit = sub.astype(jnp.int32).astype(jnp.float32) * inv
            # products pinned + left-associated to mirror
            # image_ops.to_grayscale bit-for-bit (see _pin_product there:
            # FMA contraction of a product into the adds would flip
            # boundary pixels' gray level)
            big = jnp.float32(3.0e38)
            g = (jnp.minimum(jnp.float32(_GRAY_W[0]) * unit, big)
                 + jnp.minimum(
                     jnp.float32(_GRAY_W[1]) * jnp.roll(unit, -1, axis=1),
                     big)
                 ) + jnp.minimum(
                     jnp.float32(_GRAY_W[2]) * jnp.roll(unit, -2, axis=1),
                     big)
            g = jnp.where(ch == 0, g, 0.0)  # valid at r-lanes only
            gray = g + jnp.roll(g, 1, axis=1) + jnp.roll(g, 2, axis=1)
            degen = jnp.floor(
                jnp.clip(gray * jnp.float32(255.5), 0.0, 255.0)
            )  # == uint8 truncation, kept in f32 for the blend
            imgf = sub.astype(jnp.int32).astype(jnp.float32)
            # minimum = identity that blocks FMA contraction of f*diff into
            # the add — keeps mul-then-add rounding, matching
            # image_ops.blend (which pins the same way; see the note there)
            temp = degen + jnp.minimum(f * (imgf - degen),
                                       jnp.float32(3.0e38))
            # f32->u8 routes via i32; truncation toward zero == uint8 cast
            o_ref[0, r0:r0 + rows] = (jnp.clip(temp, 0.0, 255.0)
                                      .astype(jnp.int32).astype(jnp.uint8))

    @pl.when(opc == SHARPNESS)
    def _():
        # image_ops.sharpness: 9-term int32 neighborhood sum on the
        # interior, exact round-half-to-even ÷13, blend toward original.
        # x-neighbors are ±c lane-rolls, y-neighbors ±1 sublane-rolls.
        f = factors_ref[i, 1]
        for r0 in range(0, h, _CHUNK):
            rows = min(_CHUNK, h - r0)
            # ±1-row halo: written rows' y-neighbors are real image rows
            # (the roll's wrap only ever lands on a halo row, never on a
            # written one); global borders stay original via `interior`.
            lo = max(r0 - 1, 0)
            hi = min(r0 + rows + 1, h)
            sub = img[lo:hi]
            x32 = sub.astype(jnp.int32)

            def nb(dy, dx, x32=x32):
                out = x32
                if dy:
                    out = jnp.roll(out, -dy, axis=0)
                if dx:
                    out = jnp.roll(out, -dx * c, axis=1)
                return out

            s = (nb(-1, -1) + nb(-1, 0) + nb(-1, 1)
                 + nb(0, -1) + 5 * x32 + nb(0, 1)
                 + nb(1, -1) + nb(1, 0) + nb(1, 1))
            n = s // 13
            r = s - 13 * n
            degen = n + (2 * r > 13).astype(jnp.int32)
            ysub = lo + jax.lax.broadcasted_iota(jnp.int32, (hi - lo, 1), 0)
            interior = ((ysub >= 1) & (ysub <= h - 2)
                        & (xpix >= 1) & (xpix <= w - 2))
            result = jnp.where(interior, degen, x32).astype(jnp.float32)
            imgf = sub.astype(jnp.int32).astype(jnp.float32)
            # same contraction pin as the COLOR branch / image_ops.blend
            temp = result + jnp.minimum(f * (imgf - result),
                                        jnp.float32(3.0e38))
            out8 = (jnp.clip(temp, 0.0, 255.0)
                    .astype(jnp.int32).astype(jnp.uint8))
            o_ref[0, r0:r0 + rows] = out8[r0 - lo:r0 - lo + rows]

    @pl.when(opc == CUTOUT)
    def _():
        # image_ops.cutout: square mask at (cy, cx), clipped at borders
        cy = meta_ref[i, 1]
        cx = meta_ref[i, 2]
        in_y = (yrow >= cy - cut_half) & (yrow < cy + cut_half)
        in_x = (xpix >= cx - cut_half) & (xpix < cx + cut_half)
        o_ref[0] = jnp.where(in_y & in_x, jnp.uint8(cut_fill), img)


def fused_round_pallas(images, transforms, op_class, cut_cy, cut_cx, *,
                       fill_value, pad, color_factor, sharp_factor,
                       cut_half, cut_fill, interpret=None):
    """One elementwise-RandAugment round over the non-LUT ops, per-image
    dispatched: each image computes only its sampled op.

    :param images: ``[b, h, w, c]`` uint8.
    :param transforms: ``[b, 8]`` det-1 affines (identity for non-warp
        images).
    :param op_class: ``[b]`` int32 in {PASSTHROUGH, WARP, COLOR, SHARPNESS,
        CUTOUT}. LUT-class images pass through unchanged (the caller
        overwrites them with the batched LUT result).
    :param cut_cy, cut_cx: ``[b]`` int32 cutout centers (ignored for other
        classes; derived by the caller from the op's PRNG key so the random
        stream matches the unfused path exactly).
    :param color_factor, sharp_factor: blend factors — a static scalar
        (RandAugment: one magnitude) or a ``[b]`` per-image array
        (AutoAugment: each sub-policy carries its own magnitude). The
        arithmetic is identical either way (the factor rides scalar memory
        and enters the same f32 blend).
    :param cut_half: static half side of the cutout square.
    :param cut_fill: static cutout fill value.
    """
    b, h, w, c = images.shape
    wp = w + 2 * pad
    n1, n1m, n2e, n2me, n3, n3m = _shift_vectors(transforms, b, h, w, c, pad)
    fill = _resolve_fill(fill_value, images.dtype)

    meta = jnp.stack(
        [jnp.asarray(op_class, jnp.int32),
         jnp.asarray(cut_cy, jnp.int32),
         jnp.asarray(cut_cx, jnp.int32)], axis=1,
    )  # [b, 3]
    factors = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(color_factor, jnp.float32), (b,)),
         jnp.broadcast_to(jnp.asarray(sharp_factor, jnp.float32), (b,))],
        axis=1,
    )  # [b, 2]
    img = images.reshape(b, h, w * c)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # index maps under scalar prefetch receive the prefetched arrays as
    # trailing arguments
    row_spec = pl.BlockSpec((1, h, 1), lambda i, meta, factors: (i, 0, 0))
    col_spec = pl.BlockSpec((1, 1, wp * c),
                            lambda i, meta, factors: (i, 0, 0))
    img_spec = pl.BlockSpec((1, h, w * c),
                            lambda i, meta, factors: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            img_spec,
            row_spec, row_spec, col_spec, col_spec, row_spec, row_spec,
        ],
        out_specs=img_spec,
    )
    out = pl.pallas_call(
        partial(_fused_round_kernel, h=h, wp=wp, c=c, pad=pad, w=w,
                fill=fill, cut_half=int(cut_half), cut_fill=int(cut_fill)),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), jnp.uint8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, factors, img, n1, n1m, n2e, n2me, n3, n3m)
    return out.reshape(b, h, w, c)
