"""ResNeXt-50/101 (32x4d) backbones.

Parity: reference ``chambers/models/backbones/resnext.py`` — thin wrappers
over Keras's private ResNet builder with ``stack3`` grouped stacks (stage
widths 128/256/512/1024, 32 groups, stage depths 3-4-6-3 / 3-4-23-3).

TPU-first: grouped 3x3 convs use ``feature_group_count`` — a single MXU conv
per block instead of Keras's depthwise-reshape emulation. Keras ResNet
conventions preserved for checkpoint parity: BN epsilon 1.001e-5, stem 7x7/2
with SAME-style explicit padding, stride-2 placed on the grouped 3x3 conv,
and ``stride1=1`` for stage 2 (pooling handles the reduction).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.models.model import Model
from chambers_tpu.quantization import QuantDense

_BN_EPS = 1.001e-5


class _ConvBN(nn.Module):
    filters: int
    kernel: int
    strides: int = 1
    groups: int = 1
    pad: int = 0
    relu: bool = True
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.filters, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class _Block3(nn.Module):
    """Keras ``block3``: 1x1 → grouped 3x3 → 1x1(expansion 2x width)."""

    filters: int
    strides: int = 1
    groups: int = 32
    conv_shortcut: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = (64 // self.groups) * self.filters
        if self.conv_shortcut:
            shortcut = _ConvBN(out_ch, 1, strides=self.strides, relu=False,
                               dtype=self.dtype)(x, train)
        else:
            shortcut = x

        y = _ConvBN(self.filters, 1, dtype=self.dtype)(x, train)
        y = _ConvBN(self.filters, 3, strides=self.strides, groups=self.groups,
                    pad=1, dtype=self.dtype)(y, train)
        y = _ConvBN(out_ch, 1, relu=False, dtype=self.dtype)(y, train)
        return nn.relu(y + shortcut)


class ResNeXtModule(nn.Module):
    stage_depths: tuple
    include_top: bool = True
    pooling: Optional[str] = None
    classes: int = 1000
    groups: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic
        if self.dtype is not None:
            x = x.astype(self.dtype)

        # Keras ResNeXt passes use_bias=False (reference resnext.py:20,41)
        x = _ConvBN(64, 7, strides=2, pad=3, use_bias=False,
                    dtype=self.dtype)(x, train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        widths = (128, 256, 512, 1024)
        for stage, (width, depth) in enumerate(zip(widths, self.stage_depths)):
            for block in range(depth):
                strides = 1 if (stage == 0 or block > 0) else 2
                x = _Block3(
                    filters=width, strides=strides, groups=self.groups,
                    conv_shortcut=(block == 0), dtype=self.dtype,
                )(x, train)

        if self.include_top:
            x = jnp.mean(x, axis=(1, 2))
            x = QuantDense(self.classes, dtype=self.dtype)(x)
            # Keras ResNet classifier_activation="softmax" default
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        elif self.pooling == "avg":
            x = jnp.mean(x, axis=(1, 2))
        elif self.pooling == "max":
            x = jnp.max(x, axis=(1, 2))
        return x.astype(jnp.float32)


def _build(name, depths, input_shape, include_top, weights, pooling, classes,
           dtype, seed):
    if input_shape is None:
        input_shape = (224, 224, 3)
    module = ResNeXtModule(
        stage_depths=depths, include_top=include_top, pooling=pooling,
        classes=classes, dtype=dtype,
    )
    variables = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1,) + tuple(input_shape))
    )
    model = Model(module, variables, preprocess=preprocess_input, name=name)
    if weights == "imagenet":
        import os

        from chambers_tpu.models.backbones.vision_transformer import (
            weights_cache_dir,
        )

        suffix = ".h5" if include_top else "_notop.h5"
        path = os.path.join(weights_cache_dir(), f"{name}{suffix}")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Pretrained weights expect {path}; download the keras-team "
                "release file the reference uses (resnext.py:6-51; no "
                "network egress here), or pass weights=None."
            )
        weights = path
    if weights is not None:
        if str(weights).endswith(".h5"):
            # keras-applications h5: name-keyed import (grouped convs are
            # stored as depthwise kernels) — validated against real reference
            # saves in tests/models/test_reference_h5_parity.py
            from chambers_tpu.models.backbones.h5_import_cnn import (
                load_resnext_h5_weights,
            )

            model.variables = load_resnext_h5_weights(
                str(weights), model.variables, depths)
        else:
            model.load_weights(weights)
    return model


def ResNeXt50(include_top=True, weights="imagenet", input_shape=None,
              pooling=None, classes=1000, dtype=None, seed=0) -> Model:
    return _build("resnext50", (3, 4, 6, 3), input_shape, include_top,
                  weights, pooling, classes, dtype, seed)


def ResNeXt101(include_top=True, weights="imagenet", input_shape=None,
               pooling=None, classes=1000, dtype=None, seed=0) -> Model:
    return _build("resnext101", (3, 4, 23, 3), input_shape, include_top,
                  weights, pooling, classes, dtype, seed)


def preprocess_input(x):
    """'torch'-mode ImageNet scaling (resnext.py:48)."""
    from chambers_tpu.augmentations import ImageNetNormalization

    return ImageNetNormalization(mode="torch")(x)
