"""SE-ResNet / SE-ResNeXt / SENet-154 backbones.

Parity: reference ``chambers/models/backbones/senet.py`` (the qubvel
classification-models SENet family): stem (7x7 or triple-3x3 for SENet-154),
4 stages of SE residual bottlenecks, GAP + optional dropout + softmax head.
``MODELS_PARAMS`` reproduces the 6 presets (senet.py:481-511); BatchNorm
epsilon is the reference's 1e-5 (senet.py:43), padding follows the reference's
explicit ZeroPadding2D(1)+VALID convention.

TPU-first redesign: the reference implements grouped convolution as a Python
loop of per-group slice→Conv2D→concat (``GroupConv2D``, senet.py:65-127) —
32-64 separate convs per block. Here grouped conv is a single
``feature_group_count`` convolution (SURVEY.md §7.9), one fused MXU op.
Weight layout note: a Keras-style per-group kernel list concatenates along
the output-channel axis into exactly the ``feature_group_count`` layout, so
checkpoint import is a plain concat.
"""

import collections
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.models.model import Model
from chambers_tpu.quantization import QuantDense

ModelParams = collections.namedtuple(
    "ModelParams",
    ["model_name", "repetitions", "residual_block", "groups",
     "reduction", "init_filters", "input_3x3", "dropout"],
)

# Released-weight location (senet.py:16-17) and registry (senet.py:18-31):
# model -> (top_md5, no_top_md5)
BASE_WEIGHTS_PATH = (
    "https://github.com/chjort/chambers/releases/download/v1.0/")
WEIGHTS_HASHES = {
    "seresnet50":
        ("ff0ce1ed5accaad05d113ecef2d29149", "043777781b0d5ca756474d60bf115ef1"),
    "seresnet101":
        ("5c31adee48c82a66a32dee3d442f5be8", "1c373b0c196918713da86951d1239007"),
    "seresnet152":
        ("96fc14e3a939d4627b0174a0e80c7371", "f58d4c1a511c7445ab9a2c2b83ee4e7b"),
    "seresnext50":
        ("5310dcd58ed573aecdab99f8df1121d5", "b0f23d2e1cd406d67335fb92d85cc279"),
    "seresnext101":
        ("be5b26b697a0f7f11efaa1bb6272fc84", "e48708cbe40071cc3356016c37f6c9c7"),
    "senet154":
        ("c8eac0e1940ea4d8a2e0b2eb0cdf4e75", "d854ff2cd7e6a87b05a8124cd283e0f2"),
}

_BN_EPS = 9.999999747378752e-06


def get_bn_params(**params):
    """BatchNorm defaults of the SENet family (senet.py:38-45).

    chambers_tpu is NHWC-only (the TPU-native layout), so the axis is always
    the trailing channel axis; the epsilon is the reference's exact float.
    Keyword overrides update the defaults as in the reference.
    """
    default_bn_params = {"axis": -1, "epsilon": _BN_EPS}
    default_bn_params.update(params)
    return default_bn_params


def get_num_channels(tensor):
    """Channel count of an NHWC tensor (senet.py:48-50)."""
    return tensor.shape[-1]


def slice_tensor(x, start, stop, axis):
    """Channel-range slice (senet.py:56-62). Kept for API parity; accepts
    the reference's Keras axis conventions (3 = channels_last, 1 =
    channels_first) alongside the native ``-1``."""
    if axis in (3, -1):
        return x[:, :, :, start:stop]
    elif axis == 1:
        return x[:, start:stop, :, :]
    raise ValueError("Slice axis should be in (1, 3), got {}.".format(axis))


def expand_dims(x, channels_axis):
    """``[b, c] -> [b, 1, 1, c]`` broadcast helper (senet.py:130-135)."""
    if channels_axis in (3, -1):
        return x[:, None, None, :]
    elif channels_axis == 1:
        return x[:, :, None, None]
    raise ValueError(
        "Slice axis should be in (1, 3), got {}.".format(channels_axis))


def GroupConv2D(filters, kernel_size, strides=(1, 1), groups=32,
                kernel_initializer="he_uniform", use_bias=True,
                activation="linear", padding="valid", **kwargs):
    """Grouped 2-D convolution (senet.py:65-127), TPU-native.

    The reference builds this as a Python loop of per-group slice → Conv2D →
    concat — ``groups`` separate convolutions per call, each too small to
    tile the MXU. Here it is one ``flax.linen.Conv`` with
    ``feature_group_count=groups``: a single fused convolution whose kernel
    layout ``[kh, kw, in/groups, filters]`` is exactly the concatenation of
    the reference's per-group kernels along the output-channel axis (see the
    module docstring's weight-layout note), so imported checkpoints land
    unchanged.

    Returns the Conv module (a callable, like the reference's closure).
    Only linear activation is supported, matching every reference call site.
    """
    if activation not in (None, "linear"):
        raise ValueError(
            f"GroupConv2D only supports linear activation, got {activation!r}"
            " (every reference call site uses the default)")
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(strides, int):
        strides = (strides, strides)
    initializers = {
        "he_uniform": nn.initializers.variance_scaling(
            2.0, "fan_in", "uniform"),
        "he_normal": nn.initializers.variance_scaling(
            2.0, "fan_in", "truncated_normal"),
        "glorot_uniform": nn.initializers.xavier_uniform(),
    }
    kernel_init = initializers.get(kernel_initializer, kernel_initializer)
    return nn.Conv(
        features=filters, kernel_size=kernel_size, strides=strides,
        feature_group_count=groups, use_bias=use_bias,
        padding=padding.upper(), kernel_init=kernel_init, **kwargs)


class _ConvBN(nn.Module):
    filters: int
    kernel: int
    strides: int = 1
    groups: int = 1
    pad: int = 0
    relu: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = ((self.pad, self.pad), (self.pad, self.pad))
        x = nn.Conv(
            self.filters, (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding=padding, use_bias=False,
            feature_group_count=self.groups,
            kernel_init=nn.initializers.he_uniform(),
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=_BN_EPS, momentum=0.99,
            dtype=self.dtype,
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ChannelSE(nn.Module):
    """Squeeze-and-excitation (senet.py:139-169): GAP → 1x1 reduce → relu →
    1x1 expand → sigmoid gate."""

    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(channels // self.reduction, (1, 1),
                     kernel_init=nn.initializers.he_uniform(),
                     dtype=self.dtype)(se)
        se = nn.relu(se)
        se = nn.Conv(channels, (1, 1),
                     kernel_init=nn.initializers.he_uniform(),
                     dtype=self.dtype)(se)
        se = nn.sigmoid(se)
        return x * se


class SEResNetBottleneck(nn.Module):
    """(senet.py:176-218): 1x1(strided)/3x3/1x1 bottleneck + SE + residual."""

    filters: int
    reduction: int = 16
    strides: int = 1
    groups: int = 1          # unused; kept for a uniform block signature
    is_first: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = _ConvBN(self.filters // 4, 1, strides=self.strides,
                    dtype=self.dtype)(x, train)
        y = _ConvBN(self.filters // 4, 3, pad=1, dtype=self.dtype)(y, train)
        y = _ConvBN(self.filters, 1, relu=False, dtype=self.dtype)(y, train)

        # SE before the shortcut conv: submodule creation order mirrors the
        # reference's call order (senet.py:176-218) so the legacy-h5
        # order-based importer sees tensors in Keras topological order.
        y = ChannelSE(self.reduction, dtype=self.dtype)(y)
        if self.strides != 1 or y.shape[-1] != residual.shape[-1]:
            residual = _ConvBN(self.filters, 1, strides=self.strides,
                               relu=False, dtype=self.dtype)(residual, train)
        return nn.relu(y + residual)


class SEResNeXtBottleneck(nn.Module):
    """(senet.py:221-267): grouped 3x3 with width = f/4 · base_width · g / 64."""

    filters: int
    reduction: int = 16
    strides: int = 1
    groups: int = 32
    base_width: int = 4
    is_first: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        width = (self.filters // 4) * self.base_width * self.groups // 64

        y = _ConvBN(width, 1, dtype=self.dtype)(x, train)
        y = _ConvBN(width, 3, strides=self.strides, groups=self.groups,
                    pad=1, dtype=self.dtype)(y, train)
        y = _ConvBN(self.filters, 1, relu=False, dtype=self.dtype)(y, train)

        y = ChannelSE(self.reduction, dtype=self.dtype)(y)  # SE before shortcut (import order)
        if self.strides != 1 or y.shape[-1] != residual.shape[-1]:
            residual = _ConvBN(self.filters, 1, strides=self.strides,
                               relu=False, dtype=self.dtype)(residual, train)
        return nn.relu(y + residual)


class SEBottleneck(nn.Module):
    """SENet-154 block (senet.py:270-318): f/2 1x1, grouped 3x3, 1x1; the
    downsample shortcut uses a 3x3 (padded) conv except in the first stage."""

    filters: int
    reduction: int = 16
    strides: int = 1
    groups: int = 64
    is_first: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = _ConvBN(self.filters // 2, 1, dtype=self.dtype)(x, train)
        y = _ConvBN(self.filters, 3, strides=self.strides, groups=self.groups,
                    pad=1, dtype=self.dtype)(y, train)
        y = _ConvBN(self.filters, 1, relu=False, dtype=self.dtype)(y, train)

        y = ChannelSE(self.reduction, dtype=self.dtype)(y)  # SE before shortcut (import order)
        if self.strides != 1 or y.shape[-1] != residual.shape[-1]:
            if self.is_first:
                residual = _ConvBN(self.filters, 1, strides=self.strides,
                                   relu=False, dtype=self.dtype)(residual, train)
            else:
                residual = _ConvBN(self.filters, 3, strides=self.strides,
                                   pad=1, relu=False, dtype=self.dtype)(residual, train)
        return nn.relu(y + residual)


class SENetModule(nn.Module):
    """Full SENet body (senet.py:326-474)."""

    model_params: ModelParams
    include_top: bool = True
    classes: int = 1000
    dtype: Optional[Any] = None

    def get_config(self):
        """Config round-trip (``chambers_tpu.serialization``): the
        ``residual_block`` entry is a class — encode it by name."""
        params = self.model_params._asdict()
        params["residual_block"] = params["residual_block"].__name__
        return {"model_params": params, "include_top": self.include_top,
                "classes": self.classes, "dtype": self.dtype}

    @classmethod
    def from_config(cls, config):
        config = dict(config)
        params = dict(config.pop("model_params"))
        blocks = {c.__name__: c for c in
                  (SEResNetBottleneck, SEResNeXtBottleneck, SEBottleneck)}
        params["residual_block"] = blocks[params["residual_block"]]
        return cls(model_params=ModelParams(**params), **config)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.model_params
        train = not deterministic
        if self.dtype is not None:
            x = x.astype(self.dtype)

        if p.input_3x3:  # SENet-154 stem
            x = _ConvBN(p.init_filters, 3, strides=2, pad=1, dtype=self.dtype)(x, train)
            x = _ConvBN(p.init_filters, 3, pad=1, dtype=self.dtype)(x, train)
            x = _ConvBN(p.init_filters * 2, 3, pad=1, dtype=self.dtype)(x, train)
        else:
            x = _ConvBN(p.init_filters, 7, strides=2, pad=3, dtype=self.dtype)(x, train)

        # ZeroPadding2D(1) + VALID 3x3/2 max-pool (senet.py:421-422)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        filters = p.init_filters * 2
        for i, stage in enumerate(p.repetitions):
            filters *= 2
            for j in range(stage):
                strides = 2 if (i != 0 and j == 0) else 1
                x = p.residual_block(
                    filters=filters, reduction=p.reduction, strides=strides,
                    groups=p.groups, is_first=(i == 0 and j == 0),
                    dtype=self.dtype,
                )(x, train)

        if self.include_top:
            x = jnp.mean(x, axis=(1, 2))
            if p.dropout is not None:
                x = nn.Dropout(p.dropout)(x, deterministic=deterministic)
            x = QuantDense(self.classes, dtype=self.dtype)(x)
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        return x.astype(jnp.float32)


MODELS_PARAMS = {
    "seresnet50": ModelParams(
        "seresnet50", repetitions=(3, 4, 6, 3), residual_block=SEResNetBottleneck,
        groups=1, reduction=16, init_filters=64, input_3x3=False, dropout=None,
    ),
    "seresnet101": ModelParams(
        "seresnet101", repetitions=(3, 4, 23, 3), residual_block=SEResNetBottleneck,
        groups=1, reduction=16, init_filters=64, input_3x3=False, dropout=None,
    ),
    "seresnet152": ModelParams(
        "seresnet152", repetitions=(3, 8, 36, 3), residual_block=SEResNetBottleneck,
        groups=1, reduction=16, init_filters=64, input_3x3=False, dropout=None,
    ),
    "seresnext50": ModelParams(
        "seresnext50", repetitions=(3, 4, 6, 3), residual_block=SEResNeXtBottleneck,
        groups=32, reduction=16, init_filters=64, input_3x3=False, dropout=None,
    ),
    "seresnext101": ModelParams(
        "seresnext101", repetitions=(3, 4, 23, 3), residual_block=SEResNeXtBottleneck,
        groups=32, reduction=16, init_filters=64, input_3x3=False, dropout=None,
    ),
    "senet154": ModelParams(
        "senet154", repetitions=(3, 8, 36, 3), residual_block=SEBottleneck,
        groups=64, reduction=16, init_filters=64, input_3x3=True, dropout=0.2,
    ),
}


def SENet(model_params, input_shape=None, include_top=True, classes=1000,
          weights="imagenet", dtype=None, seed=0) -> Model:
    """Build a SENet-family model; local weight files load by path.

    The reference downloads released ``.h5`` weights (senet.py:458-472); this
    environment has no egress, so ``weights='imagenet'`` raises with the
    expected cache location unless the file exists.
    """
    if weights == "imagenet" and include_top and classes != 1000:
        raise ValueError(
            'If using `weights` as `"imagenet"` with `include_top` as true, '
            "`classes` should be 1000"
        )
    if input_shape is None:
        input_shape = (224, 224, 3)

    module = SENetModule(
        model_params=model_params, include_top=include_top, classes=classes,
        dtype=dtype,
    )
    dummy = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    variables = module.init(jax.random.PRNGKey(seed), dummy)
    model = Model(module, variables, preprocess=preprocess_input,
                  name=model_params.model_name)

    if weights == "imagenet":
        import os

        from chambers_tpu.models.backbones.vision_transformer import weights_cache_dir

        suffix = "_imagenet_1000.h5" if include_top else "_imagenet_1000_no_top.h5"
        path = os.path.join(weights_cache_dir(), model_params.model_name + suffix)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"Pretrained weights expect {path}; download from the "
                "chjort/chambers v1.0 release (no network egress here), or "
                "pass weights=None."
            )
        weights = path
    if weights is not None:
        if str(weights).endswith(".h5"):
            # legacy Keras h5 (the reference release format, senet.py:458-472):
            # order-based stream import, validated against real reference
            # saves in tests/models/test_reference_h5_parity.py
            from chambers_tpu.models.backbones.h5_import_cnn import (
                load_cnn_h5_weights,
            )

            model.variables = load_cnn_h5_weights(str(weights), model.variables)
        else:
            model.load_weights(weights)
    return model


def _preset(name):
    def build(input_shape=None, weights="imagenet", classes=1000,
              include_top=True, dtype=None, seed=0):
        return SENet(
            MODELS_PARAMS[name], input_shape=input_shape,
            include_top=include_top, classes=classes, weights=weights,
            dtype=dtype, seed=seed,
        )

    build.__name__ = name
    return build


SEResNet50 = _preset("seresnet50")
SEResNet101 = _preset("seresnet101")
SEResNet152 = _preset("seresnet152")
SEResNeXt50 = _preset("seresnext50")
SEResNeXt101 = _preset("seresnext101")
SENet154 = _preset("senet154")


def preprocess_input(x):
    """'torch'-mode ImageNet scaling (senet.py:585)."""
    from chambers_tpu.augmentations import ImageNetNormalization

    return ImageNetNormalization(mode="torch")(x)
