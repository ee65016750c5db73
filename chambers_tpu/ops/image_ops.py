"""Batched, branchless image-augmentation primitives for TPU.

These are the device-side equivalents of the 16 AutoAugment/RandAugment ops of
reference ``chambers/augmentations/image_augmentations.py`` (:63-507). The
reference implements them as per-image TF/tfa CPU ops dispatched through
``tf.cond``/``tf.map_fn``; here every op consumes a whole uint8 NHWC batch
``[b, h, w, c]``, takes *per-image* parameter vectors where the reference used
scalars, and lowers to pure XLA (elementwise VPU work + gathers) — no host
round-trips, no data-dependent control flow (SURVEY.md §3.5 names this as the
performance-critical redesign).

uint8 semantics follow the reference exactly: blends compute in float32 and
truncate back to uint8 (``tf.cast`` truncation, image_augmentations.py:28-49),
clipping only on the extrapolation path.

Geometry ops implement the tfa ``ImageProjectiveTransform`` contract: an
8-parameter projective matrix maps *output* coordinates to input coordinates;
out-of-bounds samples take the constant fill value.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_GRAY_WEIGHTS = np.array([0.299, 0.587, 0.114], np.float32)  # ITU-R 601


# ---------------------------------------------------------------------------
# blending / tonal ops
# ---------------------------------------------------------------------------

def _pin_product(x):
    """Identity that pins a float32 product's rounding.

    Without it the backend may contract ``a * b`` into a following add as an
    FMA, and whether it does depends on the fusion context — the same
    expression then rounds differently between programs (observed on
    XLA:CPU: 144 + 1.72*(69-144) is 15.0 as mul-then-add, 14.999998 fused,
    which truncates to a different uint8). Contraction cannot cross a
    ``minimum``, so every backend computes round(mul) then round(add) — the
    reference's (TF/Eigen) arithmetic. The bound is an identity for any
    finite f32 value below ~3.4e38."""
    return jnp.minimum(x, jnp.float32(3.0e38))


def blend(image1, image2, factor):
    """Blend two uint8 images: ``image1 + factor * (image2 - image1)``.

    ``factor`` may be a scalar or per-image ``[b]`` vector. Values in (0, 1)
    interpolate (plain truncating cast — always in range); other values
    extrapolate and clip to [0, 255] first (image_augmentations.py:28-49).
    """
    factor = jnp.asarray(factor, jnp.float32)
    if factor.ndim == 1:
        factor = factor[:, None, None, None]
    img1 = image1.astype(jnp.float32)
    img2 = image2.astype(jnp.float32)
    temp = img1 + _pin_product(factor * (img2 - img1))
    # The interpolation range check is static only for scalar factors; a
    # single clip is semantically identical for in-range results.
    return jnp.clip(temp, 0.0, 255.0).astype(jnp.uint8)


def to_grayscale(images):
    """RGB -> single-channel grayscale with tf.image.rgb_to_grayscale's
    arithmetic: scale to [0, 1] float32, weighted sum, then TF's
    ``convert_image_dtype`` float->uint8 contract — multiply by 255.5 and
    truncate (saturating).

    The weighted sum is written out left-associated with each product
    pinned (:func:`_pin_product`) instead of a ``tensordot``: a reduction's
    f32 rounding is backend- and context-dependent (XLA may FMA-contract or
    reorder it), and on boundary pixels where ``gray * 255.5`` lands within
    1 ulp of an integer that flips the truncated gray level. Pinning makes
    the result identical across CPU/TPU/Pallas so the fused-kernel paths
    (warp_pallas COLOR branch) can be bit-equal to this one. TF itself is
    only matched to ±1 gray level on such pixels (tests tolerate <5%)."""
    inv = jnp.float32(1.0) / jnp.float32(255.0)
    unit = images.astype(jnp.float32) * inv
    w = [jnp.float32(v) for v in np.asarray(_GRAY_WEIGHTS, np.float32)]
    gray = (_pin_product(w[0] * unit[..., 0])
            + _pin_product(w[1] * unit[..., 1])
            ) + _pin_product(w[2] * unit[..., 2])
    return (gray * jnp.float32(255.5)).clip(0, 255).astype(jnp.uint8)[..., None]


def invert(images):
    """255 - x (image_augmentations.py:107-116)."""
    return 255 - images


def solarize(images, threshold=128):
    """Invert pixels >= threshold (image_augmentations.py:186-201)."""
    threshold = _per_image(threshold, images)
    return jnp.where(images < threshold, images, 255 - images)


def solarize_add(images, addition=0, threshold=128):
    """Add ``addition`` to pixels below ``threshold`` (image_augmentations.py:205-223)."""
    addition = _per_image(addition, images)
    threshold = _per_image(threshold, images)
    x = images.astype(jnp.int32) + addition
    x = jnp.clip(x, 0, 255).astype(jnp.uint8)
    return jnp.where(images < threshold, x, images)


def posterize(images, bits):
    """Keep the top ``bits`` bits of each pixel (image_augmentations.py:164-182).

    ``bits`` may be per-image ``[b]``.
    """
    shift = 8 - _per_image(bits, images).astype(jnp.uint8)
    return jnp.left_shift(jnp.right_shift(images, shift), shift)


def autocontrast(images):
    """Per-image per-channel rescale to the full [0, 255] range
    (image_augmentations.py:63-90). Shares the scale/offset derivation with
    the fused-LUT path (``autocontrast_luts``) via ``_autocontrast_params``."""
    scale, offset = _autocontrast_params(images)
    b, c = images.shape[0], images.shape[3]
    scale = scale.reshape(b, c)[:, None, None, :]
    offset = offset.reshape(b, c)[:, None, None, :]
    x = images.astype(jnp.float32) * scale + offset
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def _autocontrast_params(images):
    """Per-(image, channel) rescale params, flattened ``[b*c]`` each
    (reference float32 arithmetic, image_augmentations.py:69-78)."""
    lo = jnp.min(images, axis=(1, 2)).astype(jnp.float32).reshape(-1)
    hi = jnp.max(images, axis=(1, 2)).astype(jnp.float32).reshape(-1)
    denom = hi - lo
    scale = jnp.where(denom > 0, 255.0 / jnp.where(denom == 0, 1.0, denom), 0.0)
    offset = -lo * scale
    mask = (hi > lo).astype(jnp.float32)
    return scale * mask + (1 - mask), offset * mask


def brightness(images, factor):
    """Blend with black (image_augmentations.py:277-293)."""
    return blend(jnp.zeros_like(images), images, factor)


def color(images, factor):
    """Blend with the grayscale degenerate (image_augmentations.py:227-243)."""
    degenerate = jnp.broadcast_to(to_grayscale(images), images.shape)
    return blend(degenerate, images, factor)


def contrast(images, factor):
    """Blend with the mean-gray degenerate (image_augmentations.py:247-273).

    Compatibility note: the reference computes the blend target as
    ``sum(histogram) / 256`` — i.e. ``h*w/256``, *independent of pixel
    content* (a bug vs. the original AutoAugment code, which averages actual
    gray values). Replicated faithfully so outputs are bit-identical; use
    :func:`contrast_true_mean` for the corrected content-dependent mean.
    """
    h, w = images.shape[1], images.shape[2]
    mean = jnp.clip(jnp.asarray(h * w / 256.0, jnp.float32), 0.0, 255.0)
    degenerate = jnp.full_like(images, mean.astype(jnp.uint8))
    return blend(degenerate, images, factor)


def contrast_true_mean(images, factor):
    """Content-dependent contrast (the original AutoAugment formulation)."""
    gray = to_grayscale(images).astype(jnp.float32)
    mean = jnp.mean(gray, axis=(1, 2, 3))  # [b]
    degenerate = jnp.broadcast_to(
        jnp.round(mean)[:, None, None, None].clip(0, 255).astype(jnp.uint8),
        images.shape,
    )
    return blend(degenerate, images, factor)


def channel_histograms(images):
    """Per-(image, channel) 256-bin histograms → ``[b*c, 256]`` int32.

    Nibble-factored compare-and-reduce: ``hist[hi, lo] = Σ_p (hi(p)==hi)
    (lo(p)==lo)`` is a batched [16, hw] @ [hw, 16] matmul of the two nibble
    one-hots — 2×16 compare-ops per pixel on the MXU instead of a 256-wide
    compare-reduce on the VPU (which itself is ~50x faster than scatter-add;
    scatters serialize on the TPU). bf16 products accumulated in f32 are
    exact (counts ≤ hw ≪ 2²⁴).
    """
    b, h, w, c = images.shape
    bc, hw = b * c, h * w
    flat = images.transpose(0, 3, 1, 2).reshape(bc, hw)
    # Pack 8 (image, channel) rows per matmul: a batched [16, hw] @ [hw, 16]
    # leaves the 128x128 MXU tile 98% idle; stacking 8 rows' hi one-hots as
    # [128, hw] against their lo one-hots [hw, 128] computes an 8x8 grid of
    # 16x16 blocks in one full tile — the 8 diagonal blocks are the wanted
    # histograms (off-diagonal cross-image products are discarded; 8x the
    # FLOPs at 64x the utilization). Bench: config-1 13.8 -> 13.2 ms/batch.
    pad = (-bc) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, hw), flat.dtype)], 0)
    g = (bc + pad) // 8
    vals = jnp.arange(16, dtype=flat.dtype)
    oh_hi = ((flat >> 4)[:, None, :] == vals[None, :, None])  # [bc, 16, hw]
    lhs = oh_hi.astype(jnp.bfloat16).reshape(g, 128, hw)
    lo_t = (flat & 15).reshape(g, 8, hw).transpose(0, 2, 1)   # [g, hw, 8]
    oh_lo = (lo_t[:, :, :, None] == vals[None, None, None, :])
    rhs = oh_lo.astype(jnp.bfloat16).reshape(g, hw, 128)
    grid = jax.lax.dot_general(
        lhs, rhs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [g, 128, 128]
    blocks = grid.reshape(g, 8, 16, 8, 16)
    i8 = jnp.arange(8)
    diag = blocks[:, i8, :, i8, :]                 # [8, g, 16, 16]
    hist = diag.transpose(1, 0, 2, 3).reshape(g * 8, 256)
    return hist[:bc].astype(jnp.int32)


def equalize_luts(images, hist=None):
    """Equalization lookup tables per (image, channel) → ``[b*c, 256]`` uint8
    (identity where the AutoAugment algorithm's ``step == 0``)."""
    bc = images.shape[0] * images.shape[3]
    if hist is None:
        hist = channel_histograms(images)

    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[:, ::-1], axis=1)  # [bc]
    last_count = jnp.take_along_axis(hist, last_idx[:, None], axis=1)[:, 0]
    step = (jnp.sum(hist, axis=1) - last_count) // 255  # [bc]

    # lut[v] = (cumsum(hist)[v-1] + step//2) // step, lut[0] = 0
    cums = jnp.cumsum(hist, axis=1)
    shifted = jnp.concatenate(
        [jnp.zeros((bc, 1), jnp.int32), cums[:, :-1]], axis=1
    )
    safe_step = jnp.where(step == 0, 1, step)
    lut = (shifted + (step // 2)[:, None]) // safe_step[:, None]
    lut = jnp.clip(lut, 0, 255).astype(jnp.uint8)

    identity = jnp.arange(256, dtype=jnp.uint8)[None]
    return jnp.where((step == 0)[:, None], identity, lut)


def autocontrast_luts(images):
    """Autocontrast lookup tables per (image, channel) → ``[b*c, 256]``
    uint8 (same derivation as :func:`autocontrast`)."""
    scale, offset = _autocontrast_params(images)
    v = jnp.arange(256, dtype=jnp.float32)[None]
    lut = v * scale[:, None] + offset[:, None]
    return jnp.clip(lut, 0.0, 255.0).astype(jnp.uint8)


def apply_channel_luts(images, luts):
    """Apply per-(image, channel) LUTs: ``out[b,y,x,ch] = lut[b*ch][pixel]``.

    Implemented as a fused compare-multiply-reduce (one-hot contraction)
    rather than a gather: on TPU, gathers from *runtime-computed* tables are
    ~7x slower than this formulation (XLA streams the [bc, hw, 256]
    comparison without materializing it). Exactly one term per pixel is
    nonzero, so the uint8 sum is exact.

    Note: ``channel_histograms``/``*_luts`` index (image, channel) as
    ``b * c + ch`` after a NCHW transpose — this applies the same layout.
    """
    b, h, w, c = images.shape
    flat = images.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    # nibble-factored lookup: the pixel's 16-entry hi-row of the table comes
    # from a one-hot(hi) @ table matmul on the MXU ([bc, hw, 16] @
    # [bc, 16, 16] — M=hw keeps the systolic array busy), then the
    # low-nibble one-hot contracts it on the VPU (16 compare-mult-adds).
    # Replaces a 16-step select chain that marched the [bc, hw, 16] tensor
    # on the VPU 16 times: config-1 bench 16.2 -> 13.6 ms/batch,
    # bit-identical (255 is exact in bf16's 8 significand bits; f32 accum).
    # Runtime-table gathers remain ~7x slower than either formulation.
    hi = (flat >> 4).astype(jnp.int32)
    lo = (flat & 15).astype(jnp.int32)
    table = luts.reshape(b * c, 16, 16).astype(jnp.bfloat16)
    vals = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[:, :, None] == vals).astype(jnp.bfloat16)    # [bc, hw, 16]
    row = jax.lax.dot_general(
        oh_hi, table, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [bc, hw, 16]
    out = jnp.sum(jnp.where(lo[:, :, None] == vals[None, None, :], row, 0.0),
                  axis=-1).astype(jnp.uint8)
    return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)


def equalize(images):
    """Per-channel histogram equalization (tfa.image.equalize semantics;
    the AutoAugment-paper ``scale_channel`` algorithm)."""
    return apply_channel_luts(images, equalize_luts(images))


def sharpness(images, factor):
    """Blend with a 3x3-smoothed degenerate; only the interior is smoothed
    (tfa.image.sharpness semantics).

    The [[1,1,1],[1,5,1],[1,1,1]]/13 smoothing runs as 9 shifted int32 adds
    with exact round-half-to-even division — bit-identical to the f32
    depthwise conv + ``jnp.round`` it replaces (13 is odd so no quotient is
    a half-way case; equality verified exhaustively over every possible
    3x3 uint8 sum 0..3315) and cheaper than an f32 conv on the VPU
    (config-1 bench 14.2 -> 13.8 ms/batch).
    """
    x = images.astype(jnp.int32)
    s = (x[:, :-2, :-2] + x[:, :-2, 1:-1] + x[:, :-2, 2:]
         + x[:, 1:-1, :-2] + 5 * x[:, 1:-1, 1:-1] + x[:, 1:-1, 2:]
         + x[:, 2:, :-2] + x[:, 2:, 1:-1] + x[:, 2:, 2:])
    n, r = s // 13, s % 13
    degenerate = (n + (2 * r > 13)).astype(jnp.uint8)
    # paste the smoothed interior back over the original
    padded = jnp.pad(
        jnp.ones_like(degenerate, jnp.bool_),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    padded_degenerate = jnp.pad(degenerate, ((0, 0), (1, 1), (1, 1), (0, 0)))
    result = jnp.where(padded, padded_degenerate, images)
    return blend(result, images, factor)


# ---------------------------------------------------------------------------
# geometry ops — projective transform core
# ---------------------------------------------------------------------------

def transform(images, transforms, interpolation="nearest", fill_value=0.0):
    """Apply per-image projective transforms (tfa.image.transform contract).

    :param transforms: ``[8]`` or ``[b, 8]`` — ``[a0, a1, a2, b0, b1, b2,
        c0, c1]`` mapping output ``(x, y)`` to input
        ``((a0 x + a1 y + a2) / k, (b0 x + b1 y + b2) / k)`` with
        ``k = c0 x + c1 y + 1``.
    :param fill_value: constant fill for out-of-bounds samples.
    """
    b, h, w, c = images.shape
    t = jnp.asarray(transforms, jnp.float32)
    if t.ndim == 1:
        t = jnp.broadcast_to(t[None], (b, 8))

    ox = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # [1, 1, w]
    oy = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # [1, h, 1]

    a0, a1, a2 = t[:, 0, None, None], t[:, 1, None, None], t[:, 2, None, None]
    b0, b1, b2 = t[:, 3, None, None], t[:, 4, None, None], t[:, 5, None, None]
    c0, c1 = t[:, 6, None, None], t[:, 7, None, None]

    k = c0 * ox + c1 * oy + 1.0
    sx = (a0 * ox + a1 * oy + a2) / k  # [b, h, w]
    sy = (b0 * ox + b1 * oy + b2) / k

    batch_idx = jnp.arange(b)[:, None, None]
    fill = jnp.asarray(fill_value, images.dtype)

    if interpolation == "nearest":
        ix = jnp.floor(sx + 0.5).astype(jnp.int32)
        iy = jnp.floor(sy + 0.5).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        gathered = images[batch_idx, iyc, ixc]  # [b, h, w, c]
        return jnp.where(valid[..., None], gathered, fill)

    if interpolation == "bilinear":
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]

        def tap(xi, yi):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            g = images[batch_idx, jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            return jnp.where(
                valid[..., None], g.astype(jnp.float32), jnp.float32(fill_value)
            )

        out = (
            tap(x0, y0) * (1 - fx) * (1 - fy)
            + tap(x0 + 1, y0) * fx * (1 - fy)
            + tap(x0, y0 + 1) * (1 - fx) * fy
            + tap(x0 + 1, y0 + 1) * fx * fy
        )
        if jnp.issubdtype(images.dtype, jnp.integer):
            out = jnp.round(jnp.clip(out, 0, 255))
        return out.astype(images.dtype)

    raise ValueError(f"Unknown interpolation '{interpolation}'")


def identity_matrices(batch):
    """[b, 8] identity projective transforms."""
    base = jnp.asarray([1.0, 0, 0, 0, 1.0, 0, 0, 0], jnp.float32)
    return jnp.broadcast_to(base[None], (batch, 8))


# ---------------------------------------------------------------------------
# separable (gather-free) affine warp
# ---------------------------------------------------------------------------
#
# XLA's general gather runs ~300M elem/s on v5e regardless of index structure,
# which made the per-round policy warp the dominant cost of the fused
# AutoAugment/RandAugment pipelines (~16 ms per batch-32 224px warp). Every
# warp those policies emit is a determinant-1 affine (shear / translate /
# rotate / identity), and with *nearest* interpolation (the reference default,
# image_augmentations.py:124/320/406) an axis-aligned resample is an integer
# per-row (or per-column) shift. Any det-1 affine factors into three shears
#   M = Sx(A1, B1) . Sy(A2, B2) . Sx(A3, B3)
# so the warp becomes three shift passes, each implemented as a barrel
# shifter: ceil(log2(L)) stages of static `jnp.roll` + per-row masked select.
# That is pure VPU data movement — no gather — and runs ~20x faster.
#
# Exactness: shear-x/y and translate-x/y occupy a single pass, so their
# rounding matches the dense gather warp bit-for-bit. Rotation rounds once
# per pass instead of once for the composite map, giving occasional ±1-pixel
# source picks near rounding boundaries (divergence documented where used,
# augmentation_schemes.py). Intermediate shear passes can carry content
# beyond the frame, so the x-axis is padded by `pad` columns per side
# (max excursion = tan(theta/2) * (W-1)/2; 30 deg policy cap -> 0.134 * W).


def decompose_affine_shears(transforms):
    """Factor ``[b, 8]`` det-1 affine transforms into three shear passes.

    Returns ``(A1, B1, A2, B2, A3, B3)``, each ``[b]``, such that applying
    x-shift pass ``x -> x + A1*y + B1``, then y-shift pass
    ``y -> y + A2*x + B2``, then x-shift pass ``x -> x + A3*y + B3``
    reproduces ``source = M @ (x, y, 1)``.

    Preconditions (hold for every matrix the policy schemes build): the
    projective row is zero, ``det == 1``, and ``a0 == 1`` whenever ``b0 == 0``.
    """
    t = jnp.asarray(transforms, jnp.float32)
    a0, a1, a2 = t[:, 0], t[:, 1], t[:, 2]
    b0, b1, b2 = t[:, 3], t[:, 4], t[:, 5]
    nz = jnp.abs(b0) > 1e-8
    safe = jnp.where(nz, b0, 1.0)
    A2 = b0
    A1 = jnp.where(nz, (a0 - 1.0) / safe, 0.0)
    A3 = jnp.where(nz, (b1 - 1.0) / safe, a1)
    B3 = jnp.where(nz, 0.0, a2)
    B2 = b2 - A2 * B3
    B1 = a2 - a0 * B3 - A1 * B2
    return A1, B1, A2, B2, A3, B3


def _barrel_shift(buf, shifts, axis, valid_len, fill):
    """``out[..., i, ...] = buf[..., i + shifts, ...]`` along ``axis``.

    ``shifts`` is int32 shaped like ``buf`` with the ``axis`` and channel
    dims removed (per-image, per-orthogonal-row shift amounts). Reads with
    ``i + shift`` outside ``[0, valid_len)`` yield ``fill``. Implemented as
    ceil(log2(L)) conditional static rolls — no gather.
    """
    L = buf.shape[axis]
    # broadcast shape for masks: insert 1s at `axis` and the channel dim
    expand = list(shifts.shape)
    expand.insert(axis, 1)
    expand.append(1)
    n = jnp.mod(shifts, L)
    out = buf
    k = 0
    while (1 << k) < L:
        take = ((n >> k) & 1).astype(bool).reshape(expand)
        out = jnp.where(take, jnp.roll(out, -(1 << k), axis=axis), out)
        k += 1
    idx_shape = [1] * buf.ndim
    idx_shape[axis] = L
    src = jnp.arange(L, dtype=jnp.int32).reshape(idx_shape) + \
        shifts.reshape(expand)
    valid = (src >= 0) & (src < valid_len)
    return jnp.where(valid, out, jnp.asarray(fill, buf.dtype))


def transform_affine_separable(images, transforms, fill_value=0.0, pad=None):
    """Nearest-neighbor warp for det-1 affine ``[b, 8]`` transforms with no
    gather: three barrel-shift shear passes (see module notes above).

    Matches :func:`transform`'s nearest path exactly for single-shear maps
    (shear/translate/identity); rotations differ by per-pass rounding
    (<= 1 source pixel). ``pad`` columns of fill are kept on each side of the
    x-axis for intermediate shear excursions; the default covers rotations up
    to 30 degrees.
    """
    b, h, w, c = images.shape
    t = jnp.asarray(transforms, jnp.float32)
    if t.ndim == 1:
        t = jnp.broadcast_to(t[None], (b, 8))

    if pad is None:
        pad = int(np.ceil(0.2680 * (max(h, w) - 1) / 2.0)) + 2

    # On TPU the same three passes run ~40% faster as a single Pallas kernel
    # holding each image in VMEM across all ~26 roll stages (one HBM read +
    # one write instead of a sweep per stage) — bit-identical by
    # construction (ops/warp_pallas.py; equality held by
    # tests/augmentations/test_warp_pallas.py). Static scalar fill only:
    # the kernel bakes the fill value into the program.
    if (jax.default_backend() == "tpu" and images.dtype == jnp.uint8
            and isinstance(fill_value,
                           (int, float, np.integer, np.floating))):
        from chambers_tpu.ops.warp_pallas import (
            transform_affine_separable_pallas,
        )
        return transform_affine_separable_pallas(
            images, t, fill_value=fill_value, pad=pad
        )

    A1, B1, A2, B2, A3, B3 = decompose_affine_shears(t)
    fill = jnp.asarray(fill_value, images.dtype)
    buf = jnp.pad(images, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                  constant_values=fill)
    wp = w + 2 * pad

    ys = jnp.arange(h, dtype=jnp.float32)[None, :]       # [1, h]
    xs = jnp.arange(wp, dtype=jnp.float32)[None, :] - pad  # [1, wp] true x

    def x_pass(buf, A, B):
        n = jnp.floor(A[:, None] * ys + B[:, None] + 0.5).astype(jnp.int32)
        return _barrel_shift(buf, n, axis=2, valid_len=wp, fill=fill)

    def y_pass(buf, A, B):
        n = jnp.floor(A[:, None] * xs + B[:, None] + 0.5).astype(jnp.int32)
        return _barrel_shift(buf, n, axis=1, valid_len=h, fill=fill)

    buf = x_pass(buf, A1, B1)
    buf = y_pass(buf, A2, B2)
    buf = x_pass(buf, A3, B3)
    return buf[:, :, pad:pad + w, :]


def rotation_matrices(radians, h, w):
    """tfa ``angles_to_projective_transforms``: rotation about image center."""
    radians = jnp.atleast_1d(jnp.asarray(radians, jnp.float32))
    cos, sin = jnp.cos(radians), jnp.sin(radians)
    x_offset = ((w - 1) - (cos * (w - 1) - sin * (h - 1))) / 2.0
    y_offset = ((h - 1) - (sin * (w - 1) + cos * (h - 1))) / 2.0
    zeros = jnp.zeros_like(cos)
    return jnp.stack(
        [cos, -sin, x_offset, sin, cos, y_offset, zeros, zeros], axis=1
    )


_rotation_matrices = rotation_matrices  # backward-compat alias


def shear_x_matrices(level):
    level = jnp.atleast_1d(jnp.asarray(level, jnp.float32))
    z, o = jnp.zeros_like(level), jnp.ones_like(level)
    return jnp.stack([o, level, z, z, o, z, z, z], axis=1)


def shear_y_matrices(level):
    level = jnp.atleast_1d(jnp.asarray(level, jnp.float32))
    z, o = jnp.zeros_like(level), jnp.ones_like(level)
    return jnp.stack([o, z, z, level, o, z, z, z], axis=1)


def translate_x_matrices(pixels):
    """Reference TranslateX semantics: content moves left by ``pixels``."""
    pixels = jnp.atleast_1d(jnp.asarray(pixels, jnp.float32))
    z, o = jnp.zeros_like(pixels), jnp.ones_like(pixels)
    return jnp.stack([o, z, pixels, z, o, z, z, z], axis=1)


def translate_y_matrices(pixels):
    pixels = jnp.atleast_1d(jnp.asarray(pixels, jnp.float32))
    z, o = jnp.zeros_like(pixels), jnp.ones_like(pixels)
    return jnp.stack([o, z, z, z, o, pixels, z, z], axis=1)


def rotate(images, radians, interpolation="nearest", fill_value=0.0):
    """Rotate about the center; ``radians`` scalar or per-image ``[b]``
    (image_augmentations.py:120-160 via tfa.image.rotate)."""
    h, w = images.shape[1], images.shape[2]
    return transform(
        images, _rotation_matrices(radians, h, w),
        interpolation=interpolation, fill_value=fill_value,
    )


def shear_x(images, level, interpolation="nearest", fill_value=0.0):
    """Horizontal shear (image_augmentations.py:316-355)."""
    return transform(images, shear_x_matrices(level),
                     interpolation=interpolation, fill_value=fill_value)


def shear_y(images, level, interpolation="nearest", fill_value=0.0):
    """Vertical shear (image_augmentations.py:359-398)."""
    return transform(images, shear_y_matrices(level),
                     interpolation=interpolation, fill_value=fill_value)


def translate(images, translations, interpolation="nearest", fill_value=0.0):
    """Translate by ``[dx, dy]`` (tfa convention: shifts the image content by
    +dx/+dy; the projective matrix uses the negated values)."""
    tr = jnp.asarray(translations, jnp.float32)
    if tr.ndim == 1:
        tr = jnp.broadcast_to(tr[None], (images.shape[0], 2))
    zeros = jnp.zeros_like(tr[:, 0])
    ones = jnp.ones_like(tr[:, 0])
    t = jnp.stack(
        [ones, zeros, -tr[:, 0], zeros, ones, -tr[:, 1], zeros, zeros], axis=1
    )
    return transform(images, t, interpolation=interpolation, fill_value=fill_value)


def translate_x(images, pixels, interpolation="nearest", fill_value=0.0):
    """Reference TranslateX: content moves by ``-pixels`` horizontally
    (image_augmentations.py:419-427 passes ``[-pixels, 0]``)."""
    return transform(images, translate_x_matrices(pixels),
                     interpolation=interpolation, fill_value=fill_value)


def translate_y(images, pixels, interpolation="nearest", fill_value=0.0):
    """Reference TranslateY: content moves by ``-pixels`` vertically."""
    return transform(images, translate_y_matrices(pixels),
                     interpolation=interpolation, fill_value=fill_value)


def cutout(images, key, mask_size, constant_values=0):
    """Zero out a random square per image (tfa.image.random_cutout semantics:
    uniform random centers, the mask clips at image borders).

    ``mask_size`` is the full square side (must be even, like tfa).
    """
    b, h, w, _ = images.shape
    half = mask_size // 2
    key_y, key_x = jax.random.split(key)
    cy = jax.random.randint(key_y, (b,), 0, h)
    cx = jax.random.randint(key_x, (b,), 0, w)

    rows = jnp.arange(h)[None, :, None]  # [1, h, 1]
    cols = jnp.arange(w)[None, None, :]
    in_y = (rows >= (cy[:, None, None] - half)) & (rows < (cy[:, None, None] + half))
    in_x = (cols >= (cx[:, None, None] - half)) & (cols < (cx[:, None, None] + half))
    mask = (in_y & in_x)[..., None]
    fill = jnp.asarray(constant_values, images.dtype)
    return jnp.where(mask, fill, images)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _per_image(value, images):
    """Broadcast a scalar or [b] vector against [b, h, w, c] images."""
    v = jnp.asarray(value)
    if v.ndim == 1:
        return v[:, None, None, None]
    return v


def random_sign(key, shape=()):
    """±1 with equal probability (the reference's ``_randomly_negate_value``,
    image_augmentations.py:52-56)."""
    return jnp.where(jax.random.uniform(key, shape) < 0.5, -1.0, 1.0)
