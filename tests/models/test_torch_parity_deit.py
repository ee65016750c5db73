"""DeiT (distilled ViT) cross-framework parity vs transformers.

Extends the ViT parity gate to the distillation-token path: imports a
randomly-initialized HF DeiT (``DeiTForImageClassificationWithTeacher``) and
requires logit agreement on both heads — validating the dist-token concat
order ([cls, dist, patches...], vision_transformer.py:337-352) and the
predictions/predictions_dist head mapping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from chambers_tpu.models.backbones.h5_import import load_torch_vit_weights
from chambers_tpu.models.backbones.vision_transformer import (
    DistilledVisionTransformer,
)

HIDDEN, LAYERS, HEADS, FF, IMG, PATCH, CLASSES = 48, 2, 3, 96, 32, 16, 7


@pytest.fixture(scope="module")
def torch_deit():
    cfg = transformers.DeiTConfig(
        hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=FF, image_size=IMG,
        patch_size=PATCH, layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, num_labels=CLASSES,
    )
    model = transformers.DeiTForImageClassificationWithTeacher(cfg)
    model.eval()
    return model


def _rename(state_dict):
    """HF DeiT prefixes the backbone with ``deit.`` and names heads
    ``cls_classifier``/``distillation_classifier``."""
    out = {}
    for k, v in state_dict.items():
        k = k.replace("deit.", "")
        k = k.replace("cls_classifier.", "classifier.")
        out[k] = v
    return out


def test_deit_dual_head_parity(torch_deit):
    deit = DistilledVisionTransformer(
        patch_size=PATCH, patch_dim=HIDDEN, n_encoder_layers=LAYERS,
        n_heads=HEADS, ff_dim=FF, dropout_rate=0.0, classes=CLASSES,
        pooling="cls", return_dist_token=True,
    )
    dummy = jnp.zeros((1, IMG, IMG, 3))
    variables = deit.init(jax.random.PRNGKey(0), dummy)
    variables = load_torch_vit_weights(
        _rename(torch_deit.state_dict()), variables, num_heads=HEADS
    )

    rng = np.random.RandomState(0)
    x = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        torch_out = torch_deit(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    ours_cls, ours_dist = deit.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(ours_cls), torch_out.cls_logits.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours_dist), torch_out.distillation_logits.numpy(), atol=1e-4
    )

    # merged-head mode averages the two (reference return_dist_token=False)
    deit_avg = DistilledVisionTransformer(
        patch_size=PATCH, patch_dim=HIDDEN, n_encoder_layers=LAYERS,
        n_heads=HEADS, ff_dim=FF, dropout_rate=0.0, classes=CLASSES,
        pooling="cls", return_dist_token=False,
    )
    merged = deit_avg.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(merged), torch_out.logits.numpy(), atol=1e-4
    )
