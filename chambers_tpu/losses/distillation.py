"""Knowledge-distillation loss for the distilled ViT (DeiT) family.

The reference ships ``DistilledVisionTransformer`` for *inference* only
(vision_transformer.py:227-318: the dual heads exist, their average is the
prediction, and the released weights come pre-distilled) — it has no
training recipe. This module completes the family the TPU-native way: the
DeiT loss (Touvron et al. 2021, "Training data-efficient image transformers
& distillation through attention") over the model's ``[x_cls, x_dist]``
output pair, jittable and Trainer-compatible.

Hard distillation (the paper's best variant)::

    L = 1/2 CE(cls_logits, y) + 1/2 CE(dist_logits, argmax teacher_logits)

Soft distillation::

    L = (1 - alpha) CE(cls_logits, y)
        + alpha tau^2 KL(softmax(teacher/tau) || softmax(dist/tau))

Trainer usage: batches are ``(images, (labels, teacher_logits))`` — run the
(frozen) teacher on the host pipeline or inside a custom ``apply_fn``; the
loss object only consumes its logits, so ANY teacher works (a CNN, a bigger
ViT, an int8-quantized serving copy)::

    loss = DistillationLoss(kind="hard")
    Trainer(deit_model, loss=loss, optimizer=...)
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from chambers_tpu.losses.base import Loss


class DistillationLoss(Loss):
    """DeiT dual-head distillation loss.

    :param kind: ``"hard"`` (CE against the teacher's argmax — the paper's
        default and strongest) or ``"soft"`` (temperature-scaled KL).
    :param alpha: soft-distillation mixing weight on the KL term (the hard
        variant fixes the mix at 1/2, as in the paper).
    :param tau: soft-distillation temperature.

    Call as ``loss(y_true, y_pred)`` with ``y_true = (labels,
    teacher_logits)`` (labels int ``[b]``, teacher logits float
    ``[b, classes]``) and ``y_pred = [cls_logits, dist_logits]`` — exactly
    what ``DistilledVisionTransformer(return_dist_token=True)`` returns.
    """

    def __init__(self, kind: str = "hard", alpha: float = 0.5,
                 tau: float = 3.0, name="distillation",
                 reduction="sum_over_batch_size"):
        super().__init__(reduction=reduction, name=name)
        if kind not in ("hard", "soft"):
            raise ValueError(f"kind must be 'hard'|'soft', got {kind!r}")
        if not 0.0 <= alpha <= 1.0:
            raise ValueError(f"alpha={alpha} must be in [0, 1]")
        if tau <= 0:
            raise ValueError(f"tau={tau} must be > 0")
        self.kind = kind
        self.alpha = float(alpha)
        self.tau = float(tau)

    def call(self, y_true, y_pred: Sequence[jax.Array]):
        """Per-sample loss vector ``[b]`` (Keras ``Loss`` contract; the
        default reduction's unweighted mean matches the paper's batch
        objective exactly)."""
        labels, teacher_logits = y_true
        cls_logits, dist_logits = y_pred
        labels = jnp.asarray(labels)
        cls_logits = cls_logits.astype(jnp.float32)
        dist_logits = dist_logits.astype(jnp.float32)
        teacher_logits = jnp.asarray(teacher_logits, jnp.float32)

        ce_cls = optax.softmax_cross_entropy_with_integer_labels(
            cls_logits, labels)

        if self.kind == "hard":
            teacher_labels = jnp.argmax(teacher_logits, axis=-1)
            ce_dist = optax.softmax_cross_entropy_with_integer_labels(
                dist_logits, teacher_labels)
            return 0.5 * ce_cls + 0.5 * ce_dist

        tau = self.tau
        teacher_probs = jax.nn.softmax(teacher_logits / tau, axis=-1)
        student_logp = jax.nn.log_softmax(dist_logits / tau, axis=-1)
        # KL(teacher || student); the teacher-entropy term is constant in
        # the student params but kept so the value IS the KL divergence
        kl = jnp.sum(
            teacher_probs * (jnp.log(jnp.clip(teacher_probs, 1e-12))
                             - student_logp), axis=-1)
        return (1.0 - self.alpha) * ce_cls + self.alpha * (tau ** 2) * kl

    def get_config(self):
        return {"kind": self.kind, "alpha": self.alpha, "tau": self.tau,
                "reduction": self.reduction}

    @classmethod
    def from_config(cls, config):
        return cls(**config)
