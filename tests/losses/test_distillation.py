"""DeiT distillation loss: formula goldens + an end-to-end DeiT train run."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from chambers_tpu.losses import DistillationLoss


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _ce(logits, labels):
    logp = np.log(_softmax(logits))
    return -logp[np.arange(len(labels)), labels].mean()


@pytest.fixture
def logits():
    rng = np.random.RandomState(0)
    b, c = 6, 5
    return (rng.randn(b, c).astype(np.float32),   # cls
            rng.randn(b, c).astype(np.float32),   # dist
            rng.randn(b, c).astype(np.float32),   # teacher
            rng.randint(0, c, b))                 # labels


def test_hard_matches_manual(logits):
    cls, dist, teacher, labels = logits
    loss = DistillationLoss(kind="hard")
    got = float(loss((labels, teacher), [jnp.asarray(cls),
                                         jnp.asarray(dist)]))
    want = 0.5 * _ce(cls, labels) + 0.5 * _ce(dist, teacher.argmax(-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_soft_matches_manual(logits):
    cls, dist, teacher, labels = logits
    alpha, tau = 0.7, 2.0
    loss = DistillationLoss(kind="soft", alpha=alpha, tau=tau)
    got = float(loss((labels, teacher), [jnp.asarray(cls),
                                         jnp.asarray(dist)]))
    tp = _softmax(teacher / tau)
    sp = _softmax(dist / tau)
    kl = (tp * (np.log(tp) - np.log(sp))).sum(-1).mean()
    want = (1 - alpha) * _ce(cls, labels) + alpha * tau**2 * kl
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_soft_kl_zero_when_student_matches_teacher(logits):
    _, _, teacher, labels = logits
    loss = DistillationLoss(kind="soft", alpha=1.0, tau=3.0)
    got = float(loss((labels, teacher),
                     [jnp.asarray(teacher), jnp.asarray(teacher)]))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)


def test_validation():
    with pytest.raises(ValueError, match="kind"):
        DistillationLoss(kind="medium")
    with pytest.raises(ValueError, match="alpha"):
        DistillationLoss(kind="soft", alpha=1.5)
    with pytest.raises(ValueError, match="tau"):
        DistillationLoss(kind="soft", tau=0.0)
    cfg = DistillationLoss(kind="soft", alpha=0.3, tau=2.5).get_config()
    assert DistillationLoss.from_config(cfg).get_config() == cfg


def test_deit_trains_toward_teacher():
    """End-to-end: a tiny DeiT under the Trainer with hard distillation —
    the dist head learns the synthetic teacher's argmax."""
    from chambers_tpu.models import Model
    from chambers_tpu.models.backbones.vision_transformer import (
        DistilledVisionTransformer)
    from chambers_tpu.training import Trainer

    classes = 4
    module = DistilledVisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=2, n_heads=4,
        ff_dim=64, dropout_rate=0.0, classes=classes,
        return_dist_token=True, pooling="cls",
    )
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 3)))
    model = Model(module, variables)

    rng = np.random.RandomState(0)
    # teacher rule: class = the brightened quadrant (a strong, patch-aligned
    # signal — the 8px patch grid puts one patch per quadrant)
    def make_batch():
        x = 0.2 * rng.rand(16, 16, 16, 3).astype(np.float32)
        labels = rng.randint(0, classes, 16)
        for i, c in enumerate(labels):
            r, col = divmod(int(c), 2)
            x[i, r * 8:(r + 1) * 8, col * 8:(col + 1) * 8] += 0.8
        quads = np.stack([
            x[:, :8, :8].mean((1, 2, 3)), x[:, :8, 8:].mean((1, 2, 3)),
            x[:, 8:, :8].mean((1, 2, 3)), x[:, 8:, 8:].mean((1, 2, 3)),
        ], -1)
        teacher_logits = 8.0 * quads.astype(np.float32)
        return x, (labels, teacher_logits)

    data = [make_batch() for _ in range(6)]
    trainer = Trainer(model, loss=DistillationLoss(kind="hard"),
                      optimizer=optax.adam(3e-3))
    # the tiny ViT plateaus ~15 epochs before the attention locks on; by 40
    # it is essentially solved (loss < 0.1)
    history = trainer.fit(data, epochs=40, verbose=False)
    assert history[-1]["loss"] < 0.1, history[-1]

    # both heads now reproduce the teacher's rule
    x, (labels, _) = data[0]
    cls_logits, dist_logits = module.apply(trainer.variables,
                                           jnp.asarray(x))
    assert float(np.mean(np.asarray(dist_logits).argmax(-1) == labels)) > 0.9
    assert float(np.mean(np.asarray(cls_logits).argmax(-1) == labels)) > 0.9
