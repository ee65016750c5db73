"""DETR training example (BASELINE config 5, stretch beyond the reference).

Trains the detection transformer on a synthetic colored-rectangles task:
each image contains 1-3 axis-aligned colored boxes; the model must localize
and classify them through Hungarian-matched set prediction.

    python examples/train_detr.py
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from chambers_tpu.losses.detection import DETRLoss
from chambers_tpu.models.detection import build_detr


def synthetic_detection_batch(rng, batch, size, max_boxes=3, n_classes=3):
    """Images with colored rectangles; boxes in normalized cxcywh."""
    images = np.zeros((batch, size, size, 3), np.float32)
    labels = np.zeros((batch, max_boxes), np.int64)
    boxes = np.zeros((batch, max_boxes, 4), np.float32)
    mask = np.zeros((batch, max_boxes), bool)
    colors = np.eye(3, dtype=np.float32)

    for i in range(batch):
        n = rng.randint(1, max_boxes + 1)
        for j in range(n):
            cls = rng.randint(0, n_classes)
            w = rng.uniform(0.15, 0.4)
            h = rng.uniform(0.15, 0.4)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            x0, x1 = int((cx - w / 2) * size), int((cx + w / 2) * size)
            y0, y1 = int((cy - h / 2) * size), int((cy + h / 2) * size)
            images[i, y0:y1, x0:x1] = colors[cls]
            labels[i, j] = cls
            boxes[i, j] = [cx, cy, w, h]
            mask[i, j] = True
    return images, {"labels": labels, "boxes": boxes, "mask": mask}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    args = parser.parse_args()

    model = build_detr(
        num_classes=3, input_shape=(args.size, args.size, 3), num_queries=8,
        embed_dim=64, num_heads=4, ff_dim=128,
        num_encoder_layers=2, num_decoder_layers=2, aux_loss=True,
    )
    loss_fn = DETRLoss(num_classes=3)
    optimizer = optax.adamw(1e-3, weight_decay=1e-4)
    params = model.variables["params"]
    opt_state = optimizer.init(params)

    # Matching runs eagerly on host (some PJRT backends reject host
    # callbacks inside jit); forward/loss/backward are one jitted step.
    @jax.jit
    def forward(params, images):
        return model.module.apply({"params": params}, images,
                                  deterministic=True)

    @jax.jit
    def train_step(params, opt_state, images, targets, assignment):
        def loss_of(p):
            out = model.module.apply({"params": p}, images, deterministic=True)
            return loss_fn(out, targets, assignment=assignment)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(0)
    for step in range(args.steps):
        images, targets = synthetic_detection_batch(rng, args.batch, args.size)
        targets = jax.tree.map(jnp.asarray, targets)
        images = jnp.asarray(images)
        assignment = loss_fn.match(forward(params, images), targets)
        params, opt_state, loss = train_step(
            params, opt_state, images, targets, assignment
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {float(loss):.4f}")

    # quick qualitative check: does the top query find a real box class?
    images, targets = synthetic_detection_batch(rng, 4, args.size)
    out = model.module.apply({"params": params}, jnp.asarray(images),
                             deterministic=True)
    logits = np.asarray(out["logits"])[:, -1]  # final decoder layer
    pred_cls = logits.argmax(-1)
    n_object_preds = int((pred_cls != 3).sum())
    print(f"final-layer object predictions over 4 images x 8 queries: "
          f"{n_object_preds}")


if __name__ == "__main__":
    main()
