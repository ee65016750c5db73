"""Vision Transformer (ViT) and Distilled ViT (DeiT) backbones.

Parity: reference ``chambers/models/backbones/vision_transformer.py``.

Architecture (vision_transformer.py:194-292): Conv patch embedding
(kernel = stride = patch size) → token reshape → CLS ``ConcatEmbedding`` →
learned position embedding → dropout → pre-norm ``Encoder`` with output norm →
pooling (``cls``/``avg``/``max``/``sum``, :172-191) → optional tanh ``feature``
head (imagenet21k weights) → ``predictions`` Dense head. DeiT
(:295-400) adds a distillation token and a second ``predictions_dist`` head.

Presets (:403-652): ViTS16/B16/B32/L16/L32 and DeiTS16/B16 with the exact
(patch, dim, layers, heads, ff) configurations.

Weights: the reference downloads released ``.h5`` files from GitHub
(:15-96,149-169). This build resolves the same weight names against a local
cache directory (``CHAMBERS_TPU_WEIGHTS_DIR`` or ``~/.chambers_tpu/models``)
— the registry of valid names is kept so user-facing specs translate 1:1 —
and imports Keras-format ``.h5`` weight files into the Flax param tree
(see ``chambers_tpu.models.backbones.h5_import``). PyTorch ViT weights
(e.g. ``transformers`` / timm state dicts) import via
``load_torch_vit_weights`` — the same per-layer mapping the reference's
manual parity test uses (test_units/manual_test_vit_weights.py:27-76).

TPU notes: everything is a Flax module — jit/pjit the ``Model.apply_fn``.
Activations can run in bfloat16 (``dtype=jnp.bfloat16``) with float32 params;
the classifier output is always cast to float32 (mirrors the reference's
mixed-precision output cast, vision_transformer.py:395).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.layers.embedding import ConcatEmbedding, LearnedEmbedding1D
from chambers_tpu.layers.transformer import Encoder
from chambers_tpu.models.model import Model
from chambers_tpu.quantization import QuantDense

# Released-weight location (vision_transformer.py:15) and registry of
# released pretrained-weight specs (vision_transformer.py:16-96).
# model_name -> {weights_spec: (top_md5, no_top_md5, file_suffix)}
BASE_WEIGHTS_PATH = "https://github.com/chjort/chambers/releases/download/v1.1/"
WEIGHTS_HASHES = {
    "vits16": {
        "imagenet_224_deit": (
            "6df5bc5734ace3fc83e4a2e826cfe37c",
            "3ddca7413a039e9a8979c1718e33c597",
            "imagenet_1000_224_deit",
        ),
    },
    "vitb16": {
        "imagenet21k": (None, "7600a249df4c5460e16ee8637a104683", "imagenet_21k_224"),
        "imagenet21k+_224": (
            "6c987252c94ae15c34e4b2ef8b69b026",
            "fb29e40486b4dd1b82ac8635555bed65",
            "imagenet_21k_1000_224",
        ),
        "imagenet21k+_384": (
            "f189719ecc305d0ccd9525206f741409",
            "e69336a399b1a334adf72ad237df2c30",
            "imagenet_21k_1000_384",
        ),
        "imagenet_224_deit": (
            "b313ff9ff936ac4639199e8c28cf2ca4",
            "600c2033dc9f53181147596c867f62f6",
            "imagenet_21k_1000_224_deit",
        ),
        "imagenet_384_deit": (
            "134ee39f1a10c276f528b521a4353647",
            "e3a4c07722b7e3a62cbf4b2c137759e3",
            "imagenet_21k_1000_384_deit",
        ),
    },
    "vitb32": {
        "imagenet21k": (None, "14f8c10584cf61786a658723cc8d1b68", "imagenet_21k_224"),
        "imagenet21k+_384": (
            "d4b41bf765992566151f5915cc1b275b",
            "aa8863a833d9e3e592768c5c95d74361",
            "imagenet_21k_1000_384",
        ),
    },
    "vitl16": {
        "imagenet21k": (None, "ad70eb7a7a50daf3c96a790b2f7c38ca", "imagenet_21k_224"),
        "imagenet21k+_224": (
            "c39ee61dfd071a1e1a8994fed58dec35",
            "51dbbcabe79feb81237369909dc14d2e",
            "imagenet_21k_1000_224",
        ),
        "imagenet21k+_384": (
            "451f946387516c835f576dff7b5074f5",
            "a0775f7493bd816fcb0513fb813d180c",
            "imagenet_21k_1000_384",
        ),
    },
    "vitl32": {
        "imagenet21k": (None, "645d669250d87f5d8ba0a2fb1188c510", "imagenet_21k_224"),
        "imagenet21k+_384": (
            "8aacec1f38deaec287b2122ded1bbff4",
            "6aa0e4197259e0a369972221af546cf0",
            "imagenet_21k_1000_384",
        ),
    },
    "deits16": {
        "imagenet_224": (
            "309350442160f3e9bc325a0cdeac49ef",
            "bf207ba3aeb8ec578eb0c5157192f59c",
            "imagenet_1000_224",
        ),
    },
    "deitb16": {
        "imagenet_224": (
            "898b74940e3a61e90b802dae47af4428",
            "2ae45d564218b76fea4aa03cc0db279b",
            "imagenet_1000_224",
        ),
        "imagenet_384": (
            "ca3e7ca40e4b96ead9508ea1e5e35893",
            "1e3be99ad5acc90101f80e94469c815e",
            "imagenet_1000_384",
        ),
    },
}


def _are_weights_pretrained(weights, model_name):
    return (model_name in WEIGHTS_HASHES) and (weights in WEIGHTS_HASHES[model_name])


def _get_model_info(weights, model_name):
    """(default_size, has_feature) for a weight spec (reference :103-114)."""
    if _are_weights_pretrained(weights, model_name):
        suffix = WEIGHTS_HASHES[model_name][weights][2].replace("_deit", "")
        default_size = int(suffix.split("_")[-1])
        has_feature = "21k" in suffix and "1000" not in suffix
    else:
        default_size = 224
        has_feature = False
    return default_size, has_feature


def weights_cache_dir() -> str:
    return os.environ.get(
        "CHAMBERS_TPU_WEIGHTS_DIR",
        os.path.join(os.path.expanduser("~"), ".chambers_tpu", "models"),
    )


def _resolve_weights_path(model_name, weights, include_top):
    """Map a pretrained spec to a local cached file path (no network)."""
    top_hash, no_top_hash, suffix = WEIGHTS_HASHES[model_name][weights]
    if include_top:
        file_name = f"{model_name}_{suffix}.h5"
    else:
        file_name = f"{model_name}_{suffix}_no_top.h5"
    path = os.path.join(weights_cache_dir(), file_name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Pretrained weights '{weights}' for {model_name} expect the file "
            f"{file_name} in {weights_cache_dir()} (set CHAMBERS_TPU_WEIGHTS_DIR "
            f"to override). Download it from the chjort/chambers v1.1 release "
            f"and place it there; this environment has no network egress."
        )
    return path


class VisionTransformer(nn.Module):
    """ViT backbone as a Flax module over ``[batch, H, W, C]`` float images."""

    patch_size: int
    patch_dim: int
    n_encoder_layers: int
    n_heads: int
    ff_dim: int
    dropout_rate: float = 0.1
    include_top: bool = True
    pooling: Optional[str] = "cls"
    feature_dim: Optional[int] = None
    classes: int = 1000
    classifier_activation: Optional[Any] = None
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    remat: bool = False
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    gelu_approximate: bool = False
    norm_stats_dtype: Optional[Any] = None
    # V-MoE-style scaling knob (no reference counterpart): every n-th
    # encoder MLP becomes a Switch MoE — see chambers_tpu.layers.moe and
    # chambers_tpu.parallel.expert_parallel for the EP sharding rules
    moe_every_n: int = 0
    moe_n_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_router_z_loss_weight: float = 0.0
    moe_n_selected_experts: int = 1
    moe_group_size: Optional[int] = None

    def setup(self):
        self.patch_embeddings = nn.Conv(
            features=self.patch_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embeddings",
        )
        self.add_cls_token = ConcatEmbedding(
            n_embeddings=1,
            embedding_dim=self.patch_dim,
            side="left",
            axis=1,
            param_dtype=self.param_dtype,
            name="add_cls_token",
        )
        self.pos_embedding = LearnedEmbedding1D(
            param_dtype=self.param_dtype, name="pos_embedding"
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        self.encoder = Encoder(
            embed_dim=self.patch_dim,
            num_heads=self.n_heads,
            ff_dim=self.ff_dim,
            num_layers=self.n_encoder_layers,
            attention_dropout_rate=self.dropout_rate,
            dense_dropout_rate=self.dropout_rate,
            pre_norm=True,
            norm_output=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            remat=self.remat,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            gelu_approximate=self.gelu_approximate,
            norm_stats_dtype=self.norm_stats_dtype,
            moe_every_n=self.moe_every_n,
            moe_n_experts=self.moe_n_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_router_z_loss_weight=self.moe_router_z_loss_weight,
            moe_n_selected_experts=self.moe_n_selected_experts,
            moe_group_size=self.moe_group_size,
            name="encoder",
        )
        if self.feature_dim is not None:
            self.feature = QuantDense(
                self.feature_dim, dtype=self.dtype,
                param_dtype=self.param_dtype, name="feature",
            )
        if self.include_top:
            self.predictions = QuantDense(
                self.classes, dtype=self.dtype,
                param_dtype=self.param_dtype, name="predictions",
            )

    def embed(self, x, deterministic: bool = True):
        """images -> encoder token sequence ``[b, 1 + hw/p², d]``."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self.patch_embeddings(x)
        x = x.reshape(x.shape[0], -1, self.patch_dim)
        x = self.add_cls_token(x)
        x = self.pos_embedding(x)
        x = self.dropout(x, deterministic=deterministic)
        return self.encoder(x, deterministic=deterministic)

    def __call__(self, x, deterministic: bool = True):
        x = self.embed(x, deterministic=deterministic)
        x = _pool(x, self.pooling)
        if self.feature_dim is not None:
            x = jnp.tanh(self.feature(x))
        if self.include_top:
            x = self.predictions(x)
            if self.classifier_activation is not None:
                x = self.classifier_activation(x)
        return x.astype(jnp.float32)


class DistilledVisionTransformer(nn.Module):
    """DeiT: ViT with a distillation token and a second classifier head."""

    patch_size: int
    patch_dim: int
    n_encoder_layers: int
    n_heads: int
    ff_dim: int
    dropout_rate: float = 0.1
    return_dist_token: bool = True
    include_top: bool = True
    pooling: Optional[str] = None
    classes: int = 1000
    classifier_activation: Optional[Any] = None
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    remat: bool = False
    attention_impl: str = "xla"
    score_dtype: Optional[Any] = None
    gelu_approximate: bool = False
    norm_stats_dtype: Optional[Any] = None
    # V-MoE-style scaling knob (no reference counterpart): every n-th
    # encoder MLP becomes a Switch MoE — see chambers_tpu.layers.moe and
    # chambers_tpu.parallel.expert_parallel for the EP sharding rules
    moe_every_n: int = 0
    moe_n_experts: int = 8
    moe_capacity_factor: float = 1.25
    moe_router_z_loss_weight: float = 0.0
    moe_n_selected_experts: int = 1
    moe_group_size: Optional[int] = None

    def setup(self):
        self.patch_embeddings = nn.Conv(
            features=self.patch_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embeddings",
        )
        # token order after both prepends: [cls, dist, patches...]
        # (vision_transformer.py:337-352 prepends dist first, then cls)
        self.add_dist_token = ConcatEmbedding(
            n_embeddings=1, embedding_dim=self.patch_dim, side="left", axis=1,
            param_dtype=self.param_dtype, name="add_dist_token",
        )
        self.add_cls_token = ConcatEmbedding(
            n_embeddings=1, embedding_dim=self.patch_dim, side="left", axis=1,
            param_dtype=self.param_dtype, name="add_cls_token",
        )
        self.pos_embedding = LearnedEmbedding1D(
            param_dtype=self.param_dtype, name="pos_embedding"
        )
        self.dropout = nn.Dropout(self.dropout_rate)
        self.encoder = Encoder(
            embed_dim=self.patch_dim,
            num_heads=self.n_heads,
            ff_dim=self.ff_dim,
            num_layers=self.n_encoder_layers,
            attention_dropout_rate=self.dropout_rate,
            dense_dropout_rate=self.dropout_rate,
            pre_norm=True,
            norm_output=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            remat=self.remat,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            gelu_approximate=self.gelu_approximate,
            norm_stats_dtype=self.norm_stats_dtype,
            moe_every_n=self.moe_every_n,
            moe_n_experts=self.moe_n_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_router_z_loss_weight=self.moe_router_z_loss_weight,
            moe_n_selected_experts=self.moe_n_selected_experts,
            moe_group_size=self.moe_group_size,
            name="encoder",
        )
        if self.include_top:
            self.predictions = QuantDense(
                self.classes, dtype=self.dtype,
                param_dtype=self.param_dtype, name="predictions",
            )
            self.predictions_dist = QuantDense(
                self.classes, dtype=self.dtype,
                param_dtype=self.param_dtype, name="predictions_dist",
            )

    def __call__(self, x, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self.patch_embeddings(x)
        x = x.reshape(x.shape[0], -1, self.patch_dim)
        x = self.add_dist_token(x)
        x = self.add_cls_token(x)
        x = self.pos_embedding(x)
        x = self.dropout(x, deterministic=deterministic)
        x = self.encoder(x, deterministic=deterministic)

        x_cls = _pool(x, self.pooling)
        x_dist = x[:, 1]

        if self.include_top:
            x_cls = self.predictions(x_cls)
            x_dist = self.predictions_dist(x_dist)
            if self.classifier_activation is not None:
                x_cls = self.classifier_activation(x_cls)
                x_dist = self.classifier_activation(x_dist)

        x_cls = x_cls.astype(jnp.float32)
        x_dist = x_dist.astype(jnp.float32)
        if self.return_dist_token:
            return [x_cls, x_dist]
        return (x_cls + x_dist) / 2.0


def _pool(x, method: Optional[str]):
    """Token-sequence pooling (vision_transformer.py:172-191).

    ``avg``/``max``/``sum`` pool over the patch tokens (CLS cropped off);
    ``cls`` takes the first token; ``None`` returns the sequence.
    """
    if method == "avg":
        return jnp.mean(x[:, 1:], axis=1)
    if method == "max":
        return jnp.max(x[:, 1:], axis=1)
    if method == "sum":
        return jnp.sum(x[:, 1:], axis=1)
    if method == "cls":
        return x[:, 0]
    return x


def _build(
    module_cls,
    *,
    model_name,
    patch_size,
    patch_dim,
    n_encoder_layers,
    n_heads,
    ff_dim,
    dropout_rate,
    input_shape,
    include_top,
    weights,
    pooling,
    classes,
    classifier_activation,
    feature_dim=None,
    return_dist_token=None,
    dtype=None,
    attention_impl="xla",
    score_dtype=None,
    gelu_approximate=False,
    norm_stats_dtype=None,
    moe_every_n=0,
    moe_n_experts=8,
    moe_capacity_factor=1.25,
    seed: int = 0,
):
    weights_are_pretrained = _are_weights_pretrained(weights, model_name)
    if moe_every_n and weights_are_pretrained:
        raise ValueError(
            "moe_every_n adds expert weights the released checkpoints do "
            "not contain; use weights=None (train from scratch) or import "
            "a dense checkpoint first and upcycle manually."
        )
    default_size, has_feature = _get_model_info(weights, model_name)

    if module_cls is VisionTransformer:
        if weights_are_pretrained and feature_dim is not None:
            raise ValueError("'weights' and 'feature_dim' are mutually exclusive.")
        if weights_are_pretrained and has_feature:
            feature_dim = patch_dim
            if include_top:
                print(
                    f"Warning: weights '{weights}' has no top. "
                    "'include_top' will be set to False."
                )
                include_top = False

    if input_shape is None:
        input_shape = (default_size, default_size, 3)
    if weights_are_pretrained:
        expected = (default_size, default_size, input_shape[-1])
        if tuple(input_shape) != expected:
            raise ValueError(
                f"Weights '{weights}' require `input_shape` to be {expected}."
            )
    if None in input_shape:
        raise ValueError(
            f"Input shape must be fully specified; got input shape {input_shape}."
        )

    kwargs = dict(
        patch_size=patch_size,
        patch_dim=patch_dim,
        n_encoder_layers=n_encoder_layers,
        n_heads=n_heads,
        ff_dim=ff_dim,
        dropout_rate=dropout_rate,
        include_top=include_top,
        pooling=pooling,
        classes=classes,
        classifier_activation=classifier_activation,
        dtype=dtype,
        attention_impl=attention_impl,
        score_dtype=score_dtype,
        gelu_approximate=gelu_approximate,
        norm_stats_dtype=norm_stats_dtype,
        moe_every_n=moe_every_n,
        moe_n_experts=moe_n_experts,
        moe_capacity_factor=moe_capacity_factor,
    )
    if module_cls is VisionTransformer:
        kwargs["feature_dim"] = feature_dim
    else:
        kwargs["return_dist_token"] = return_dist_token

    module = module_cls(**kwargs)
    dummy = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    variables = module.init(jax.random.PRNGKey(seed), dummy)

    model = Model(module, variables, preprocess=preprocess_input, name=model_name)

    if weights_are_pretrained:
        from chambers_tpu.models.backbones.h5_import import load_vit_h5_weights

        path = _resolve_weights_path(model_name, weights, include_top)
        model.replace_variables(load_vit_h5_weights(path, variables))
    elif weights is not None:
        if str(weights).endswith(".h5"):
            from chambers_tpu.models.backbones.h5_import import (
                load_vit_h5_weights,
            )

            model.replace_variables(load_vit_h5_weights(str(weights), variables))
        else:
            model.load_weights(weights)

    return model


def _vit_preset(model_name, patch_size, patch_dim, n_layers, n_heads, ff_dim,
                default_weights):
    def preset(
        input_shape=None,
        include_top=True,
        weights=default_weights,
        pooling="cls",
        feature_dim=None,
        classes=1000,
        classifier_activation=None,
        dtype=None,
        attention_impl="xla",
        score_dtype=None,
        gelu_approximate=False,
        norm_stats_dtype=None,
        moe_every_n=0,
        moe_n_experts=8,
        moe_capacity_factor=1.25,
        seed: int = 0,
    ):
        return _build(
            VisionTransformer,
            model_name=model_name,
            patch_size=patch_size,
            patch_dim=patch_dim,
            n_encoder_layers=n_layers,
            n_heads=n_heads,
            ff_dim=ff_dim,
            dropout_rate=0.1,
            input_shape=input_shape,
            include_top=include_top,
            weights=weights,
            pooling=pooling,
            classes=classes,
            classifier_activation=classifier_activation,
            feature_dim=feature_dim,
            dtype=dtype,
            attention_impl=attention_impl,
            score_dtype=score_dtype,
            gelu_approximate=gelu_approximate,
            norm_stats_dtype=norm_stats_dtype,
            moe_every_n=moe_every_n,
            moe_n_experts=moe_n_experts,
            moe_capacity_factor=moe_capacity_factor,
            seed=seed,
        )

    preset.__name__ = model_name
    return preset


def _deit_preset(model_name, patch_size, patch_dim, n_layers, n_heads, ff_dim,
                 default_weights):
    def preset(
        return_dist_token=True,
        input_shape=None,
        include_top=True,
        weights=default_weights,
        pooling="cls",
        classes=1000,
        classifier_activation=None,
        dtype=None,
        attention_impl="xla",
        score_dtype=None,
        gelu_approximate=False,
        norm_stats_dtype=None,
        moe_every_n=0,
        moe_n_experts=8,
        moe_capacity_factor=1.25,
        seed: int = 0,
    ):
        return _build(
            DistilledVisionTransformer,
            model_name=model_name,
            patch_size=patch_size,
            patch_dim=patch_dim,
            n_encoder_layers=n_layers,
            n_heads=n_heads,
            ff_dim=ff_dim,
            dropout_rate=0.1,
            input_shape=input_shape,
            include_top=include_top,
            weights=weights,
            pooling=pooling,
            classes=classes,
            classifier_activation=classifier_activation,
            return_dist_token=return_dist_token,
            dtype=dtype,
            attention_impl=attention_impl,
            score_dtype=score_dtype,
            gelu_approximate=gelu_approximate,
            norm_stats_dtype=norm_stats_dtype,
            moe_every_n=moe_every_n,
            moe_n_experts=moe_n_experts,
            moe_capacity_factor=moe_capacity_factor,
            seed=seed,
        )

    preset.__name__ = model_name
    return preset


# Preset configurations (vision_transformer.py:403-652).
ViTS16 = _vit_preset("vits16", 16, 384, 12, 6, 1536, "imagenet_224_deit")
ViTB16 = _vit_preset("vitb16", 16, 768, 12, 12, 3072, "imagenet21k+_224")
ViTB32 = _vit_preset("vitb32", 32, 768, 12, 12, 3072, "imagenet21k+_384")
ViTL16 = _vit_preset("vitl16", 16, 1024, 24, 16, 4096, "imagenet21k+_224")
ViTL32 = _vit_preset("vitl32", 32, 1024, 24, 16, 4096, "imagenet21k+_384")
DeiTS16 = _deit_preset("deits16", 16, 384, 12, 6, 1536, "imagenet_224")
DeiTB16 = _deit_preset("deitb16", 16, 768, 12, 12, 3072, "imagenet_224")


def preprocess_input(x):
    """'tf'-mode ImageNet scaling to [-1, 1] (vision_transformer.py:655)."""
    from chambers_tpu.augmentations import ImageNetNormalization

    return ImageNetNormalization(mode="tf")(x)


def fold_imagenet_normalization(variables, mode: str = "tf"):
    """Fold ImageNet input normalization into the ViT patch-embed conv.

    All three ``preprocess_input`` modes (the contract at
    /root/reference/chambers/augmentations/image_augmentations.py:621-682)
    are per-channel affine maps ``y_c = s_c * x_c + o_c`` (caffe also flips
    RGB->BGR). Because the ViT patch embedding is a stride-``patch_size``
    VALID conv — every output sees exactly one full, unpadded kernel
    footprint — the normalization folds EXACTLY into the conv parameters::

        kernel'[kh, kw, c, d] = kernel[kh, kw, c, d] * s_c      (caffe: +flip)
        bias'[d]              = bias[d] + sum_khkwc kernel * o_c

    so the model consumes raw ``[0, 255]`` pixels directly: the separate
    full-image normalize pass (and its HBM round trip) disappears, and a
    uint8 batch casts straight to the conv's compute dtype ([0, 255] is
    exact in bfloat16). Folding is done in float32 and cast back to the
    kernel's dtype; exactness vs the unfused pipeline is pinned in
    ``tests/models/test_normalization_fold.py``.

    :param variables: a ViT/DeiT variables pytree (``model.variables``)
        whose ``params`` contain ``patch_embeddings/{kernel,bias}``.
    :param mode: ``"tf"`` | ``"torch"`` | ``"caffe"`` — which
        ``ImageNetNormalization`` to absorb.
    :return: a new variables pytree; the input is not mutated.
    """
    from chambers_tpu.augmentations import ImageNetNormalization

    if mode == "tf":
        scale = jnp.full((3,), 1.0 / 127.5, jnp.float32)
        offset = jnp.full((3,), -1.0, jnp.float32)
        flip = False
    elif mode == "torch":
        mean = jnp.asarray(ImageNetNormalization._TORCH_MEAN, jnp.float32)
        std = jnp.asarray(ImageNetNormalization._TORCH_STD, jnp.float32)
        scale = 1.0 / (255.0 * std)
        offset = -mean / std
        flip = False
    elif mode == "caffe":
        scale = jnp.ones((3,), jnp.float32)
        offset = -jnp.asarray(ImageNetNormalization._CAFFE_MEAN, jnp.float32)
        flip = True
    else:
        raise ValueError("Unknown mode " + str(mode))

    params = dict(variables["params"])
    if "patch_embeddings" not in params:
        raise ValueError(
            "variables have no 'patch_embeddings' params — "
            "fold_imagenet_normalization only applies to ViT/DeiT patch "
            f"embeddings; got {sorted(params)}"
        )
    pe = dict(params["patch_embeddings"])
    kernel = jnp.asarray(pe["kernel"], jnp.float32)  # [kh, kw, c, d]
    bias = jnp.asarray(pe["bias"], jnp.float32)  # [d]
    if kernel.ndim != 4 or kernel.shape[2] != 3:
        raise ValueError(
            f"expected a [kh, kw, 3, d] patch-embed kernel, got "
            f"{kernel.shape}"
        )
    # bias soaks up the offset against the ORIGINAL kernel/channel order
    # (the conv consumed normalize's output channels directly) ...
    new_bias = bias + jnp.einsum("hwcd,c->d", kernel, offset)
    # ... while the kernel is channel-flipped for caffe's RGB->BGR (the
    # flip is self-inverse: W'[c] = s_{2-c} * W[2-c] picks raw-RGB input).
    if flip:
        kernel = kernel[:, :, ::-1, :]
        scale = scale[::-1]
    new_kernel = kernel * scale[None, None, :, None]
    pe["kernel"] = new_kernel.astype(variables["params"]
                                     ["patch_embeddings"]["kernel"].dtype)
    pe["bias"] = new_bias.astype(variables["params"]
                                 ["patch_embeddings"]["bias"].dtype)
    params["patch_embeddings"] = pe
    new_variables = dict(variables)
    new_variables["params"] = params
    return new_variables
