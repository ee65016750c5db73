"""Parameter-efficient fine-tuning: freeze a ViT backbone, train LoRA
adapters (plus the classification head), merge for serving.

The reference's fine-tuning story is full-model Keras ``fit`` on a
pretrained backbone (weights registry,
/root/reference/chambers/models/backbones/vision_transformer.py:15-96;
Keras users freeze layers with ``layer.trainable = False``). The TPU-native
equivalents are first-class here:

- ``Trainer(trainable=regex)`` — frozen params are excluded from
  differentiation entirely (backward skips their gradient matmuls, Adam
  moments cover only what trains);
- ``chambers_tpu.training.lora`` — rank-r adapters on every Dense/MHA
  projection, exact base equality at init, merged away for serving.

Run with pretrained weights when the release files are cached
(``--weights imagenet21k+imagenet2012``) or with a random backbone for a
synthetic smoke run:

    python examples/finetune_lora.py
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.training import Trainer, lora


def cross_entropy(y_true, logits):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, y_true).mean()


def synthetic_batches(n_classes, image_size, batch, steps, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        x = rng.rand(batch, image_size, image_size, 3).astype(np.float32)
        yield x, rng.randint(0, n_classes, batch)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--classes", type=int, default=10)
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--steps-per-epoch", type=int, default=8)
    parser.add_argument("--rank", type=int, default=8)
    parser.add_argument("--layers", type=int, default=4)
    args = parser.parse_args()

    vit = VisionTransformer(
        patch_size=16, patch_dim=192, n_encoder_layers=args.layers,
        n_heads=3, ff_dim=768, dropout_rate=0.0, include_top=True,
        classes=args.classes, pooling="cls",
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(1, args.image_size, args.image_size, 3),
                     jnp.float32)
    variables = vit.init(jax.random.PRNGKey(0), x0)
    from chambers_tpu.models import Model

    model = Model(vit, variables, name="ViT-LoRA")
    base_params = jax.tree.map(lambda a: np.asarray(a).copy(),
                               variables["params"])

    # adapters on every Dense/MHA projection; the head trains fully
    model = lora.apply_to_model(model, rank=args.rank,
                                rng=jax.random.PRNGKey(1))
    n_total = sum(int(np.prod(v.shape))
                  for v in jax.tree.leaves(model.variables["params"]))
    adapters = lora.extract_lora(model.variables["params"])
    n_lora = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(adapters))
    print(f"adapter params: {n_lora:,} of {n_total:,} "
          f"({100 * n_lora / n_total:.2f}%)")

    trainer = Trainer(
        model, loss=cross_entropy, optimizer=optax.adam(3e-3),
        trainable=[lora.TRAINABLE, r"predictions"],  # adapters + head
    )
    batches = synthetic_batches(args.classes, args.image_size, args.batch,
                                steps=args.epochs * args.steps_per_epoch)
    trainer.fit(batches, epochs=args.epochs,
                steps_per_epoch=args.steps_per_epoch)

    # frozen backbone untouched; adapters + head moved
    from flax.traverse_util import flatten_dict

    fb = flatten_dict(base_params)
    fa = flatten_dict(trainer.state.params)
    frozen_ok = all(
        np.array_equal(fb[k], np.asarray(fa[k])) for k in fb
        if "predictions" not in "/".join(map(str, k)))
    print("frozen backbone unchanged:", frozen_ok)

    # bake the adapters away: a base-shaped tree for the unmodified module
    merged = lora.merge_lora(trainer.state.params)
    x = jnp.asarray(rng.rand(4, args.image_size, args.image_size, 3),
                    jnp.float32)
    adapted = model.apply_fn({"params": trainer.state.params}, x,
                             deterministic=True)
    served = vit.apply({"params": merged}, x, deterministic=True)
    print("merge max|delta|:",
          float(jnp.max(jnp.abs(adapted - served))))


if __name__ == "__main__":
    main()
