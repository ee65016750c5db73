"""BN-Inception backbone (Ioffe & Szegedy 2015, "Inception-BN").

Parity: reference ``chambers/models/backbones/inception.py:14-49`` ships no
architecture code — it downloads a stored full-model ``.h5``
(``bninception_imagenet_1000_no_top``, sha256-checked) and optionally appends
global pooling. Matching that *capability* requires the published BN-Inception
module graph so the stored weights have somewhere to land; this file
implements it (the canonical Caffe/BN-paper channel table) and imports the
stored file's weights by order-based stream matching with shape checks
(``h5_import_cnn.load_cnn_h5_weights`` reads full-model h5s via their
``model_weights`` group).

The no-top output is the ``[7, 7, 1024]`` feature map at 224 input;
``pooling="avg"|"max"`` appends global pooling (inception.py:41-45).
"""

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.models.model import Model

# Released-weight location + registry (inception.py:6-12).
BASE_WEIGHTS_PATH = (
    "https://github.com/chjort/chambers/releases/download/v1.0/")
WEIGHTS_HASHES = {
    "bninception":
        (None, "7eb8291a8e70fccbccc3bc2fff83311b35d2194ee584c1f1335bb9a240b94145"),
}

_BN_EPS = 1e-3  # Caffe BN-Inception epsilon


class _ConvBN(nn.Module):
    filters: int
    kernel: int
    strides: int = 1
    pad: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=((self.pad, self.pad), (self.pad, self.pad)),
                    use_bias=True, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         dtype=self.dtype)(x)
        return nn.relu(x)


def _pool2(x, kind):
    """3x3 stride-2 max pool with Caffe ceil-mode output size (pad
    right/bottom). Only max pooling exists here: an avg variant would have
    to exclude the explicit ceil-mode padding from its divisor, which
    ``nn.avg_pool(count_include_pad=False)`` cannot do (that flag only
    covers padding the pool op itself adds)."""
    assert kind == "max", kind
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                mode="constant", constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class _Inception(nn.Module):
    """One BN-Inception module: 1x1 | 1x1-3x3 | 1x1-3x3-3x3 | pool-proj.

    ``b1 is None`` marks the stride-2 grid-reduction variant (3c/4e): no 1x1
    branch, stride-2 on both conv branches, and a stride-2 max pool
    pass-through instead of a projected pool branch.
    """

    b1: Optional[int]
    b3_reduce: int
    b3: int
    bd_reduce: int
    bd: int
    pool_proj: int = 0
    pool_kind: str = "avg"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 1 if self.b1 is not None else 2
        branches = []
        if self.b1 is not None:
            branches.append(_ConvBN(self.b1, 1, dtype=self.dtype)(x, train))

        y = _ConvBN(self.b3_reduce, 1, dtype=self.dtype)(x, train)
        branches.append(_ConvBN(self.b3, 3, strides=stride, pad=1,
                                dtype=self.dtype)(y, train))

        z = _ConvBN(self.bd_reduce, 1, dtype=self.dtype)(x, train)
        z = _ConvBN(self.bd, 3, pad=1, dtype=self.dtype)(z, train)
        branches.append(_ConvBN(self.bd, 3, strides=stride, pad=1,
                                dtype=self.dtype)(z, train))

        if self.b1 is not None:
            if self.pool_kind == "max":
                p = nn.max_pool(x, (3, 3), strides=(1, 1),
                                padding=((1, 1), (1, 1)))
            else:
                p = nn.avg_pool(x, (3, 3), strides=(1, 1),
                                padding=((1, 1), (1, 1)),
                                count_include_pad=False)
            branches.append(_ConvBN(self.pool_proj, 1, dtype=self.dtype)(p, train))
        else:
            branches.append(_pool2(x, "max"))
        return jnp.concatenate(branches, axis=-1)


# (b1, b3_reduce, b3, bd_reduce, bd, pool_proj, pool_kind) per module —
# the published Inception-BN table; None b1 = stride-2 reduction module.
_MODULES = (
    (64, 64, 64, 64, 96, 32, "avg"),      # 3a
    (64, 64, 96, 64, 96, 64, "avg"),      # 3b
    (None, 128, 160, 64, 96, 0, "max"),   # 3c (stride 2)
    (224, 64, 96, 96, 128, 128, "avg"),   # 4a
    (192, 96, 128, 96, 128, 128, "avg"),  # 4b
    (160, 128, 160, 128, 160, 128, "avg"),  # 4c
    (96, 128, 192, 160, 192, 128, "avg"),   # 4d
    (None, 128, 192, 192, 256, 0, "max"),   # 4e (stride 2)
    (352, 192, 320, 160, 224, 128, "avg"),  # 5a
    (352, 192, 320, 192, 224, 128, "max"),  # 5b
)


class BNInceptionModule(nn.Module):
    """Feature extractor (no top): [b, 224, 224, 3] -> [b, 7, 7, 1024]."""

    dtype: Optional[Any] = None
    modules: Sequence = _MODULES

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _ConvBN(64, 7, strides=2, pad=3, dtype=self.dtype)(x, train)
        x = _pool2(x, "max")
        x = _ConvBN(64, 1, dtype=self.dtype)(x, train)
        x = _ConvBN(192, 3, pad=1, dtype=self.dtype)(x, train)
        x = _pool2(x, "max")
        for (b1, b3r, b3, bdr, bd, pp, pk) in self.modules:
            x = _Inception(b1, b3r, b3, bdr, bd, pp, pk,
                           dtype=self.dtype)(x, train)
        return x.astype(jnp.float32)


def BNInception(weights_path: Optional[str] = None,
                pooling: Optional[str] = None,
                input_shape=(224, 224, 3), dtype=None, seed=0) -> Model:
    """Build BN-Inception and load the stored reference model's weights.

    Mirrors reference inception.py:14-49: the released file is a *no-top*
    feature extractor; ``pooling`` optionally appends global avg/max pooling.
    Offline, ``weights_path`` must point at a local copy of the release file
    (or a ``Model.save_weights`` msgpack); pass ``weights_path=False`` for
    random init.
    """
    module = BNInceptionModule(dtype=dtype)
    variables = module.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1,) + tuple(input_shape)))
    model = Model(module, variables, preprocess=preprocess_input,
                  name="bninception")

    if weights_path is None:
        from chambers_tpu.models.backbones.vision_transformer import (
            weights_cache_dir,
        )

        expected = os.path.join(weights_cache_dir(),
                                "bninception_imagenet_1000_no_top.h5")
        if not os.path.exists(expected):
            raise FileNotFoundError(
                "BNInception ships as a stored model in the reference "
                "(chjort/chambers v1.0 release, sha256 "
                f"{WEIGHTS_HASHES['bninception'][1][:12]}…). Place it at "
                f"{expected} or pass weights_path; no network egress here. "
                "Pass weights_path=False for random initialization."
            )
        weights_path = expected
    if weights_path:
        if str(weights_path).endswith(".h5"):
            from chambers_tpu.models.backbones.h5_import_cnn import (
                load_convbn_h5_weights,
            )

            model.variables = load_convbn_h5_weights(str(weights_path),
                                                     model.variables)
        else:
            model.load_weights(weights_path)
    return with_pooling(model, pooling)


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
