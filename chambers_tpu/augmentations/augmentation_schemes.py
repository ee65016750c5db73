"""AutoAugment / RandAugment policies as fused on-device transforms.

Parity: reference ``chambers/augmentations/augmentation_schemes.py``. The
policy V0 table (:12-39) and the magnitude→kwargs translators (:42-102) are
reproduced value-for-value. ``_FILL_VALUE = 128``, nearest interpolation,
``_MAX_MAGNITUDE = 10`` (:7-10).

TPU redesign (BASELINE.json north star): policies run on device over whole
uint8 batches. ``elementwise=False`` (the reference default, kept here for
parity) samples per batch via ``lax.switch``/``lax.cond`` — only the chosen
branch executes. ``elementwise=True`` (recommended on TPU for augmentation
diversity; cheap now that per-image work is batched rather than ``tf.map_fn``)
gives every image its own sampled ops via compute-all-and-gather selection.

AutoAugment additionally deduplicates repeated (op, magnitude) instances
across the 25 sub-policy pairs so the elementwise path computes each unique
kernel once per stage instead of 25 times.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from chambers_tpu.augmentations import image_augmentations
from chambers_tpu.ops import image_ops

_INTERPOLATION_MODE = "nearest"
_FILL_MODE = "constant"
_FILL_VALUE = 128
_MAX_MAGNITUDE = 10.0


def _fused_round_applicable(scheme, images) -> bool:
    """The per-image-dispatch Pallas round kernel applies on TPU for uint8
    RGB batches whose working set fits scoped VMEM;
    ``scheme.fused_round_kernel = True/False`` forces it (tests run it in
    interpret mode on CPU, where no VMEM limit exists)."""
    forced = getattr(scheme, "fused_round_kernel", None)
    if forced is not None:
        return forced
    return (jax.default_backend() == "tpu"
            and images.dtype == jnp.uint8 and images.shape[-1] == 3
            and _fused_round_fits_vmem(images))


def _fused_round_fits_vmem(images) -> bool:
    """Whether ``fused_round_pallas``'s per-image working set fits the TPU's
    16 MB scoped-VMEM stack.

    The pointwise branches strip-mine their f32 temporaries over 128-row
    chunks (warp_pallas._fused_round_kernel), so the scaling term is the
    WARP branch: ~6 live uint8 planes of the fill-padded folded image
    (pad sized for the worst-case 30-degree rotation, as in
    ``_policy_warp``), plus the chunked f32 planes. Calibrated on-chip:
    224px and 384px compile and run (the pre-chunking kernel measured a
    17.01 MB stack at 384px in Mosaic's accounting). Oversized images fall
    back to the masked compute-all composition (bit-identical by
    construction)."""
    h, w, c = images.shape[1], images.shape[2], images.shape[3]
    d = max(h, w)
    theta = 30.0 * math.pi / 180.0
    pad = int(np.ceil(np.tan(theta / 2.0) * (d - 1) / 2.0)) + 2
    est_bytes = (6 * h * (w + 2 * pad) * c          # warp: u8 padded planes
                 + 6 * min(h, 128) * w * c * 4)     # chunked f32 planes
    return est_bytes <= 14 * 1024 * 1024


def _policy_warp(images, mats, max_rotation_rad=None):
    """One warp per policy round, per-image affine ``mats`` [b, 8].

    With nearest interpolation (the reference mode) this takes the gather-free
    separable path — three barrel-shift shear passes, ~20x faster than XLA's
    general gather on v5e. Shear/translate/identity matrices reproduce the
    dense warp exactly; Rotate rounds per pass instead of once for the
    composite map, so individual source picks can differ by one pixel from
    ``tfa.image.rotate`` (the op remains a true rotation; the policies only
    ever sample rotation magnitudes, never fixed angles, so this changes no
    documented output contract — divergence noted here per CLAUDE.md parity
    conventions).

    ``max_rotation_rad`` sizes the fill-padded x-extent that absorbs
    intermediate shear excursions (pad = tan(θ/2)·(d−1)/2): callers pass
    their actual rotation cap so magnitudes beyond the standard 10 don't
    silently clip shear intermediates to fill; default 30° (magnitude 10).
    """
    if _INTERPOLATION_MODE == "nearest":
        theta = (max_rotation_rad if max_rotation_rad is not None
                 else 30.0 * math.pi / 180.0)
        d = max(images.shape[1], images.shape[2])
        pad = int(np.ceil(np.tan(abs(theta) / 2.0) * (d - 1) / 2.0)) + 2
        return image_ops.transform_affine_separable(
            images, mats, fill_value=_FILL_VALUE, pad=pad
        )
    return image_ops.transform(
        images, mats, interpolation=_INTERPOLATION_MODE, fill_value=_FILL_VALUE
    )

# [(Transform, Probability, Magnitude), (Transform, Probability, Magnitude)]
_AUTO_AUGMENT_POLICY_V0 = [
    [("Equalize", 0.8, None), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, None)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, None)],
    [("Equalize", 0.4, None), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, None)],
    [("Invert", 0.4, None), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, None), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, None)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, None)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateY", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, None), ("Equalize", 0.0, None)],
    [("Equalize", 1.0, None), ("AutoContrast", 0.6, None)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]


def _magnitude_to_enhance_kwargs(magnitude):
    return {"factor": magnitude / _MAX_MAGNITUDE * 1.8 + 0.1}


def _magnitude_to_shear_kwargs(magnitude):
    return {
        "level": magnitude / _MAX_MAGNITUDE * 0.3,
        "interpolation": _INTERPOLATION_MODE,
        "fill_mode": _FILL_MODE,
        "fill_value": _FILL_VALUE,
    }


def _magnitude_to_translate_kwargs(magnitude):
    return {
        "pixels": magnitude / _MAX_MAGNITUDE * 100,
        "interpolation": _INTERPOLATION_MODE,
        "fill_mode": _FILL_MODE,
        "fill_value": _FILL_VALUE,
    }


def _magnitude_to_posterize_kwargs(magnitude):
    return {"bits": int(magnitude / _MAX_MAGNITUDE * 4)}


def _magnitude_to_solarize_kwargs(magnitude):
    return {"threshold": int(magnitude / _MAX_MAGNITUDE * 256)}


def _magnitude_to_solarizeadd_kwargs(magnitude):
    return {"addition": int(magnitude / _MAX_MAGNITUDE * 110)}


def _magnitude_to_rotate_kwargs(magnitude):
    return {
        "degrees": magnitude / _MAX_MAGNITUDE * 30.0,
        "interpolation": _INTERPOLATION_MODE,
        "fill_mode": _FILL_MODE,
        "fill_value": _FILL_VALUE,
    }


def _magnitude_to_cutout_kwargs(magnitude):
    return {"mask_size": int(magnitude / _MAX_MAGNITUDE * 80),
            "constant_values": _FILL_VALUE}


_MAGNITUDE_FN_MAP = {
    "AutoContrast": lambda magnitude: {},
    "Equalize": lambda magnitude: {},
    "Invert": lambda magnitude: {},
    "Brightness": _magnitude_to_enhance_kwargs,
    "Contrast": _magnitude_to_enhance_kwargs,
    "Color": _magnitude_to_enhance_kwargs,
    "Sharpness": _magnitude_to_enhance_kwargs,
    "ShearX": _magnitude_to_shear_kwargs,
    "ShearY": _magnitude_to_shear_kwargs,
    "TranslateX": _magnitude_to_translate_kwargs,
    "TranslateY": _magnitude_to_translate_kwargs,
    "Posterize": _magnitude_to_posterize_kwargs,
    "Solarize": _magnitude_to_solarize_kwargs,
    "SolarizeAdd": _magnitude_to_solarizeadd_kwargs,
    "CutOut": _magnitude_to_cutout_kwargs,
    "Rotate": _magnitude_to_rotate_kwargs,
}


def _get_transform(transform_name, magnitude):
    transform_cls = getattr(image_augmentations, transform_name)
    kwargs = _MAGNITUDE_FN_MAP[transform_name](magnitude)
    return transform_cls(**kwargs)


def _static_pointwise_table(name, magnitude, h, w):
    """uint8 ``[256]`` lookup table for a per-pixel-value op, or None.

    Every op that maps pixel value -> pixel value independently of position
    composes into a single table lookup; this derives each family's table
    with the exact arithmetic of its ``image_ops`` counterpart (same
    trunc/clip/threshold-wrap semantics), so LUT application is bit-identical
    to running the op. Tables are NumPy (trace-independent constants).
    Contrast's blend target is the reference's content-independent gray
    ``h*w/256`` (see image_ops.contrast), hence the image-size arguments.
    """
    v = np.arange(256, dtype=np.float32)
    vu8 = np.arange(256, dtype=np.uint8)
    if name == "Invert":
        return 255 - vu8
    if name == "Brightness":
        f = np.float32(_magnitude_to_enhance_kwargs(magnitude)["factor"])
        return np.clip(f * v, 0, 255).astype(np.uint8)
    if name == "Posterize":
        shift = 8 - _magnitude_to_posterize_kwargs(magnitude)["bits"]
        return ((vu8 >> shift) << shift).astype(np.uint8)
    if name == "Solarize":
        # thresholds wrap to uint8 (TF semantics: magnitude 10 gives
        # threshold 256 -> 0 -> full inversion)
        thr = _magnitude_to_solarize_kwargs(magnitude)["threshold"]
        return np.where(vu8 < np.uint8(thr % 256), v, 255 - v).astype(np.uint8)
    if name == "SolarizeAdd":
        add = _magnitude_to_solarizeadd_kwargs(magnitude)["addition"]
        return np.where(vu8 < np.uint8(128),
                        np.clip(v + add, 0, 255), v).astype(np.uint8)
    if name == "Contrast":
        f = np.float32(_magnitude_to_enhance_kwargs(magnitude)["factor"])
        gray = np.float32(np.uint8(np.clip(h * w / 256.0, 0, 255)))
        return np.clip(gray + f * (v - gray), 0, 255).astype(np.uint8)
    return None


class AutoAugment:
    """Applies one random (chance₁∘chance₂) sub-policy pair per call
    (augmentation_schemes.py:132-171)."""

    def __init__(self, elementwise: bool = False):
        self.elementwise = elementwise
        # Deduplicate op instances: policy entries index into a unique table.
        self._unique = {}  # (name, magnitude) -> index
        self._ops = []
        self._op_specs = []  # [(name, magnitude), ...] parallel to _ops
        self.policies = []  # [((op_idx, p), (op_idx, p)), ...]
        for (t1, p1, m1), (t2, p2, m2) in _AUTO_AUGMENT_POLICY_V0:
            self.policies.append(
                ((self._intern(t1, m1), p1), (self._intern(t2, m2), p2))
            )

    _PROJECTIVE_NAMES = ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate")

    def _intern(self, name, magnitude):
        key = (name, magnitude)
        if key not in self._unique:
            self._unique[key] = len(self._ops)
            self._ops.append(_get_transform(name, magnitude))
            self._op_specs.append((name, magnitude))
        return self._unique[key]

    def __call__(self, images, key=None, training: bool = True):
        if not training:
            return images
        if key is None:
            raise ValueError("AutoAugment requires a PRNG `key` when training.")
        key_policy, key_s1, key_s2 = jax.random.split(key, 3)
        if self.elementwise:
            return self._apply_elementwise(images, key_policy, key_s1, key_s2)
        return self._apply_batch(images, key_policy, key_s1, key_s2)

    def _apply_batch(self, images, key_policy, key_s1, key_s2):
        idx = jax.random.randint(key_policy, (), 0, len(self.policies))

        def make_branch(policy):
            (op1, p1), (op2, p2) = policy

            def branch(imgs, k1, k2):
                c1 = image_augmentations.RandomChance(self._ops[op1], p1)
                c2 = image_augmentations.RandomChance(self._ops[op2], p2)
                return c2(c1(imgs, key=k1), key=k2)

            return branch

        branches = [make_branch(p) for p in self.policies]
        return jax.lax.switch(idx, branches, images, key_s1, key_s2)

    def _apply_elementwise(self, images, key_policy, key_s1, key_s2):
        """Per-image sub-policy selection with all projective candidates fused
        into a single warp per stage (see RandAugment for the rationale:
        warps are general gathers, the expensive op class on TPU).

        On TPU the stage's non-LUT work (warp / Color / passthrough — the
        V0 table samples no other non-LUT op) runs as one per-image-dispatch
        Pallas kernel: each image computes only its sampled op, so images
        that drew a pointwise op (or failed the probability gate) skip the
        warp entirely instead of warping through an identity matrix.
        Bit-identical to the masked composition
        (tests/augmentations/test_warp_pallas.py)."""
        from chambers_tpu.ops import image_ops

        b, h, w = images.shape[0], images.shape[1], images.shape[2]
        n_pol = len(self.policies)
        policy_idx = jax.random.randint(key_policy, (b,), 0, n_pol)
        use_kernel = _fused_round_applicable(self, images)

        for stage, stage_key in ((0, key_s1), (1, key_s2)):
            op_of_policy = jnp.asarray([p[stage][0] for p in self.policies])
            prob_of_policy = jnp.asarray(
                [p[stage][1] for p in self.policies], jnp.float32
            )
            op_idx = op_of_policy[policy_idx]          # [b]
            prob = prob_of_policy[policy_idx]          # [b]

            key_chance, key_sign, key_ops = jax.random.split(stage_key, 3)
            do = jax.random.uniform(key_chance, (b,)) < prob
            sign = image_ops.random_sign(key_sign, (b,))

            # single fused warp for every projective candidate op
            mats = image_ops.identity_matrices(b)
            any_projective = False
            for k_i, (name, magnitude) in enumerate(self._op_specs):
                if name not in self._PROJECTIVE_NAMES:
                    continue
                any_projective = True
                if name == "Rotate":
                    rad = (magnitude or 0) / _MAX_MAGNITUDE * 30.0 * math.pi / 180.0
                    cand = image_ops.rotation_matrices(sign * rad, h, w)
                elif name == "ShearX":
                    lvl = (magnitude or 0) / _MAX_MAGNITUDE * 0.3
                    cand = image_ops.shear_x_matrices(sign * lvl)
                elif name == "ShearY":
                    lvl = (magnitude or 0) / _MAX_MAGNITUDE * 0.3
                    cand = image_ops.shear_y_matrices(sign * lvl)
                elif name == "TranslateX":
                    px = (magnitude or 0) / _MAX_MAGNITUDE * 100
                    cand = image_ops.translate_x_matrices(sign * px)
                else:  # TranslateY
                    px = (magnitude or 0) / _MAX_MAGNITUDE * 100
                    cand = image_ops.translate_y_matrices(sign * px)
                mats = jnp.where((op_idx == k_i)[:, None], cand, mats)

            max_rot = max(
                ((m or 0) / _MAX_MAGNITUDE * 30.0 * math.pi / 180.0
                 for n_, m in self._op_specs if n_ == "Rotate"),
                default=0.0,
            )
            if use_kernel:
                result = self._fused_stage(images, mats, op_idx, do, max_rot)
            elif any_projective:
                result = _policy_warp(images, mats, max_rotation_rad=max_rot)
            else:
                result = images

            # pointwise candidates mask-selected over the warp result.
            # Every per-pixel-value op composes into ONE [b*c, 256] table
            # applied by a single batched lookup; all Color@m specs share one
            # grayscale pass with a per-image blend factor — instead of one
            # full-batch pass per unique (op, magnitude) spec.
            c = images.shape[3]
            op_keys = jax.random.split(key_ops, len(self._ops))
            identity = jnp.arange(256, dtype=jnp.uint8)[None]
            lut = jnp.broadcast_to(identity, (b * c, 256))
            is_lut_op = jnp.zeros((b,), bool)
            eq_tables = ac_tables = None
            color_factor = jnp.zeros((b,), jnp.float32)
            is_color_op = jnp.zeros((b,), bool)
            for k_i, ((name, magnitude), op, op_key) in enumerate(
                zip(self._op_specs, self._ops, op_keys)
            ):
                if name in self._PROJECTIVE_NAMES:
                    continue
                sel = op_idx == k_i
                if name == "Equalize":
                    if eq_tables is None:
                        eq_tables = image_ops.equalize_luts(images)
                    cand = eq_tables
                elif name == "AutoContrast":
                    if ac_tables is None:
                        ac_tables = image_ops.autocontrast_luts(images)
                    cand = ac_tables
                else:
                    table = _static_pointwise_table(name, magnitude, h, w)
                    if table is None:
                        if name == "Color":
                            f = _magnitude_to_enhance_kwargs(magnitude)["factor"]
                            color_factor = jnp.where(sel, f, color_factor)
                            is_color_op = is_color_op | sel
                        else:
                            # spatial / stochastic op (Sharpness, CutOut, ...):
                            # full-batch pass, masked in
                            result = jnp.where(
                                sel[:, None, None, None],
                                op(images, key=op_key), result,
                            )
                        continue
                    cand = jnp.asarray(table[None])  # [1, 256]
                lut = jnp.where(jnp.repeat(sel, c)[:, None], cand, lut)
                is_lut_op = is_lut_op | sel

            lut_out = image_ops.apply_channel_luts(images, lut)
            result = jnp.where(is_lut_op[:, None, None, None], lut_out, result)
            if (not use_kernel
                    and bool(np.any([s[0] == "Color"
                                     for s in self._op_specs]))):
                # kernel mode colors in-kernel; only the masked composition
                # needs the shared full-batch Color pass
                color_out = image_ops.color(images, color_factor)
                result = jnp.where(
                    is_color_op[:, None, None, None], color_out, result
                )

            images = jnp.where(do[:, None, None, None], result, images)
        return images

    def _fused_stage(self, images, mats, op_idx, do, max_rot):
        """One stage's non-LUT ops through the per-image-dispatch kernel.

        Op classes and Color factors are static per op spec, gathered by the
        sampled op index (constant-table gathers are cheap on TPU); images
        whose chance gate failed dispatch as PASSTHROUGH — the final
        ``where(do, ...)`` would discard their result anyway, so skipping
        the compute changes nothing. LUT-class images also pass through;
        the batched LUT pass overwrites them."""
        from chambers_tpu.ops import warp_pallas as wpk

        d = max(images.shape[1], images.shape[2])
        pad = int(np.ceil(np.tan(abs(max_rot) / 2.0) * (d - 1) / 2.0)) + 2

        classes = np.full(len(self._op_specs), wpk.PASSTHROUGH, np.int32)
        color_f = np.zeros(len(self._op_specs), np.float32)
        for k_i, (name, magnitude) in enumerate(self._op_specs):
            if name in self._PROJECTIVE_NAMES:
                classes[k_i] = wpk.WARP
            elif name == "Color":
                classes[k_i] = wpk.COLOR
                color_f[k_i] = _magnitude_to_enhance_kwargs(
                    magnitude)["factor"]
        op_class = jnp.where(do, jnp.asarray(classes)[op_idx],
                             wpk.PASSTHROUGH)
        b = images.shape[0]
        zeros = jnp.zeros((b,), jnp.int32)
        return wpk.fused_round_pallas(
            images, mats, op_class, zeros, zeros,
            fill_value=_FILL_VALUE, pad=pad,
            color_factor=jnp.asarray(color_f)[op_idx], sharp_factor=0.0,
            cut_half=0, cut_fill=0,
        )


class RandAugment:
    """N random ops at fixed magnitude M over the 16-op pool
    (augmentation_schemes.py:175-225).

    Performance: the five projective ops (Shear/Translate/Rotate) are the
    expensive ones on TPU (a warp is a general gather). In elementwise mode
    each image applies exactly one op per round, so all projective candidates
    fuse into a *single* warp with per-image matrices (identity for images
    that sampled a pointwise op) — one gather per round instead of five.
    """

    OP_NAMES = (
        "AutoContrast", "Equalize", "Invert", "Brightness", "Contrast",
        "Color", "Sharpness", "ShearX", "ShearY", "TranslateX", "TranslateY",
        "Posterize", "Solarize", "SolarizeAdd", "CutOut", "Rotate",
    )
    _PROJECTIVE = {"ShearX": 7, "ShearY": 8, "TranslateX": 9,
                   "TranslateY": 10, "Rotate": 15}

    def __init__(self, n_transforms: int, magnitude: float,
                 elementwise: bool = False):
        self.n_transforms = n_transforms
        self.magnitude = magnitude
        self.elementwise = elementwise
        self.transforms = [_get_transform(n, magnitude) for n in self.OP_NAMES]
        self._choice = image_augmentations.RandomChoice(
            self.transforms, n_transforms=n_transforms, elementwise=False
        )
        # raw geometry magnitudes for the fused elementwise path
        self._shear_level = magnitude / _MAX_MAGNITUDE * 0.3
        self._translate_px = magnitude / _MAX_MAGNITUDE * 100
        self._rotate_rad = magnitude / _MAX_MAGNITUDE * 30.0 * math.pi / 180.0

    def __call__(self, images, key=None, training: bool = True):
        if not training:
            return images
        if key is None:
            raise ValueError("RandAugment requires a PRNG `key` when training.")
        if self.elementwise:
            return self._apply_elementwise_fused(images, key)
        return self._choice(images, key=key)

    def _use_fused_round_kernel(self, images):
        return _fused_round_applicable(self, images)

    def _apply_elementwise_fused(self, images, key):
        from chambers_tpu.ops import image_ops

        b = images.shape[0]
        use_kernel = self._use_fused_round_kernel(images)
        for key_round in jax.random.split(key, self.n_transforms):
            kd, ks, ko = jax.random.split(key_round, 3)
            idx = jax.random.randint(kd, (b,), 0, len(self.transforms))
            sign = image_ops.random_sign(ks, (b,))

            # one fused warp for all projective candidates
            h, w = images.shape[1], images.shape[2]
            mats = image_ops.identity_matrices(b)

            def pick(op_index, candidate):
                sel = (idx == op_index)[:, None]
                return jnp.where(sel, candidate, mats)

            mats = pick(self._PROJECTIVE["ShearX"],
                        image_ops.shear_x_matrices(sign * self._shear_level))
            mats = pick(self._PROJECTIVE["ShearY"],
                        image_ops.shear_y_matrices(sign * self._shear_level))
            mats = pick(self._PROJECTIVE["TranslateX"],
                        image_ops.translate_x_matrices(sign * self._translate_px))
            mats = pick(self._PROJECTIVE["TranslateY"],
                        image_ops.translate_y_matrices(sign * self._translate_px))
            mats = pick(self._PROJECTIVE["Rotate"],
                        image_ops.rotation_matrices(sign * self._rotate_rad, h, w))

            op_keys = jax.random.split(ko, len(self.transforms))
            if use_kernel:
                # one Pallas kernel for ALL non-LUT candidates: each image
                # dispatches on its sampled op and computes only that op
                # (warp / Color / Sharpness / CutOut / passthrough) — the
                # TPU-native form of the reference's per-image tf.cond;
                # bit-identical to the masked composition below
                # (tests/augmentations/test_warp_pallas.py)
                result = self._fused_round(images, mats, idx, op_keys)
            else:
                result = _policy_warp(images, mats,
                                      max_rotation_rad=self._rotate_rad)

            # LUT-able pointwise candidates (8 of 11): every per-pixel-value
            # op composes into ONE combined [b*c, 256] table applied by a
            # single batched lookup instead of 8 full-image passes
            result = self._apply_lut_ops(images, idx, result)

            if not use_kernel:
                # remaining non-LUT pointwise ops (cross-channel / spatial)
                projective_idx = set(self._PROJECTIVE.values())
                for k_i, (t, op_key) in enumerate(
                        zip(self.transforms, op_keys)):
                    if (k_i in projective_idx or k_i in self._LUT_BUILDERS
                            or k_i == 4):  # 4 = Contrast, LUT'd lazily
                        continue
                    sel = (idx == k_i)[:, None, None, None]
                    result = jnp.where(sel, t(images, key=op_key), result)
            images = result
        return images

    def _fused_round(self, images, mats, idx, op_keys):
        """Run one round's non-LUT ops through the per-image-dispatch
        kernel. PRNG use matches the unfused path exactly: CutOut's centers
        derive from the same per-op key split `image_ops.cutout` performs."""
        from chambers_tpu.ops import warp_pallas as wpk

        b, h, w, _ = images.shape
        d = max(h, w)
        pad = int(np.ceil(np.tan(abs(self._rotate_rad) / 2.0)
                          * (d - 1) / 2.0)) + 2

        i_color = self.OP_NAMES.index("Color")
        i_sharp = self.OP_NAMES.index("Sharpness")
        i_cut = self.OP_NAMES.index("CutOut")
        cut = self.transforms[i_cut]

        classes = np.full(len(self.transforms), wpk.PASSTHROUGH, np.int32)
        for k_i in self._PROJECTIVE.values():
            classes[k_i] = wpk.WARP
        classes[i_color] = wpk.COLOR
        classes[i_sharp] = wpk.SHARPNESS
        if cut.mask_size:  # mask_size == 0 is the identity (CutOut.__call__)
            classes[i_cut] = wpk.CUTOUT
        op_class = jnp.asarray(classes)[idx]

        key_y, key_x = jax.random.split(op_keys[i_cut])
        cy = jax.random.randint(key_y, (b,), 0, h)
        cx = jax.random.randint(key_x, (b,), 0, w)

        return wpk.fused_round_pallas(
            images, mats, op_class, cy, cx,
            fill_value=_FILL_VALUE, pad=pad,
            color_factor=self.transforms[i_color].factor,
            sharp_factor=self.transforms[i_sharp].factor,
            cut_half=cut.mask_size // 2,
            cut_fill=cut.constant_values,
        )

    @property
    def _LUT_BUILDERS(self):
        """op index -> LUT builder; static tables built in NumPy at first use
        (they must be trace-independent constants — jnp tables created inside
        one jit trace would leak as tracers into the next)."""
        if not hasattr(self, "_lut_builders_cache"):
            m = self.magnitude

            def static(name):
                # h/w only matter for Contrast, which is built lazily in
                # _contrast_lut where the image size is known
                table = _static_pointwise_table(name, m, 0, 0)[None]
                return lambda images: jnp.asarray(table)

            self._lut_builders_cache = {
                0: lambda images: image_ops.autocontrast_luts(images),
                1: lambda images: image_ops.equalize_luts(images),
                2: static("Invert"),
                3: static("Brightness"),
                11: static("Posterize"),
                12: static("Solarize"),
                13: static("SolarizeAdd"),
            }
        return self._lut_builders_cache

    def _contrast_lut(self, images):
        # Contrast blends toward the reference's content-independent gray
        # (h*w/256) — an image-size constant, so the table is NumPy-static
        h, w = images.shape[1], images.shape[2]
        return jnp.asarray(
            _static_pointwise_table("Contrast", self.magnitude, h, w)[None]
        )

    def _apply_lut_ops(self, images, idx, result):
        from chambers_tpu.ops import image_ops as iops

        b, c = images.shape[0], images.shape[3]
        identity = jnp.arange(256, dtype=jnp.uint8)[None]
        lut = jnp.broadcast_to(identity, (b * c, 256))
        is_lut_op = jnp.zeros((b,), bool)

        builders = dict(self._LUT_BUILDERS)
        builders[4] = self._contrast_lut  # Contrast (depends on image size)

        for k_i, builder in builders.items():
            cand = builder(images)  # [1, 256] or [b*c, 256]
            sel = idx == k_i
            sel_bc = jnp.repeat(sel, c)
            lut = jnp.where(sel_bc[:, None], cand, lut)
            is_lut_op = is_lut_op | sel

        lut_out = iops.apply_channel_luts(images, lut)
        return jnp.where(is_lut_op[:, None, None, None], lut_out, result)
