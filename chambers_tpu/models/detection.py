"""DETR-style detection transformer.

BASELINE.json config 5 (stretch): the reference carries DETR's fingerprints —
``PositionalEncoding2D`` (embedding.py:74) and
``Decoder(return_sequence=True)`` for per-layer auxiliary losses
(transformer.py:410-426) — without the model or loss. This builder assembles
the full detector from this library's own pieces: a convolutional backbone
feature map + 2D sincos positions → transformer encoder → decoder over
learned object queries → class / box heads, trained with
:class:`chambers_tpu.losses.detection.DETRLoss`.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from chambers_tpu.layers.embedding import PositionalEncoding2D
from chambers_tpu.layers.transformer import Decoder, Encoder
from chambers_tpu.models.model import Model
from chambers_tpu.quantization import QuantDense


class DETR(nn.Module):
    """Minimal DETR over raw images (patchified conv stem as the backbone).

    Outputs ``{"logits": [b, (L,) q, classes+1], "boxes": [b, (L,) q, 4]}``
    with the aux-layer axis present when ``aux_loss=True``.
    """

    num_classes: int
    num_queries: int = 100
    embed_dim: int = 256
    num_heads: int = 8
    ff_dim: int = 2048
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dropout_rate: float = 0.1
    patch_size: int = 16
    aux_loss: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        self.backbone = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="backbone",
        )
        self.pos_encoding = PositionalEncoding2D(add_to_input=True)
        self.encoder = Encoder(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            ff_dim=self.ff_dim, num_layers=self.num_encoder_layers,
            attention_dropout_rate=self.dropout_rate,
            dense_dropout_rate=self.dropout_rate,
            pre_norm=False, dtype=self.dtype, name="encoder",
        )
        self.decoder = Decoder(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            ff_dim=self.ff_dim, num_layers=self.num_decoder_layers,
            attention_dropout_rate=self.dropout_rate,
            dense_dropout_rate=self.dropout_rate,
            pre_norm=False, causal=False, norm_output=True,
            return_sequence=self.aux_loss, dtype=self.dtype, name="decoder",
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (self.num_queries, self.embed_dim),
        )
        self.class_head = QuantDense(self.num_classes + 1, dtype=self.dtype,
                                   name="class_head")
        self.bbox_head = [
            QuantDense(self.embed_dim, dtype=self.dtype),
            QuantDense(self.embed_dim, dtype=self.dtype),
            QuantDense(4, dtype=self.dtype),
        ]

    def __call__(self, images, deterministic: bool = True):
        x = images
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = self.backbone(x)                       # [b, h', w', d]
        feats = self.pos_encoding(feats)
        tokens = feats.reshape(feats.shape[0], -1, self.embed_dim)
        memory = self.encoder(tokens, deterministic=deterministic)

        queries = jnp.broadcast_to(
            self.query_embed.astype(memory.dtype)[None],
            (memory.shape[0],) + self.query_embed.shape,
        )
        hs = self.decoder([queries, memory], deterministic=deterministic)
        # hs: [b, q, d] or [b, L, q, d] with aux_loss

        logits = self.class_head(hs).astype(jnp.float32)
        boxes = hs
        for i, dense in enumerate(self.bbox_head):
            boxes = dense(boxes)
            if i < len(self.bbox_head) - 1:
                boxes = nn.relu(boxes)
        boxes = jax.nn.sigmoid(boxes.astype(jnp.float32))
        return {"logits": logits, "boxes": boxes}


def build_detr(num_classes, input_shape=(224, 224, 3), num_queries=100,
               embed_dim=256, num_heads=8, ff_dim=2048,
               num_encoder_layers=6, num_decoder_layers=6, aux_loss=True,
               dtype=None, seed=0) -> Model:
    module = DETR(
        num_classes=num_classes, num_queries=num_queries, embed_dim=embed_dim,
        num_heads=num_heads, ff_dim=ff_dim,
        num_encoder_layers=num_encoder_layers,
        num_decoder_layers=num_decoder_layers, aux_loss=aux_loss, dtype=dtype,
    )
    variables = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1,) + tuple(input_shape))
    )
    return Model(module, variables, name="detr")
