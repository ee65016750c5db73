"""The DeiT training recipe, end-to-end on the TPU-native stack.

Touvron et al.'s data-efficient ViT recipe (the one the reference's DeiT
presets were trained with — reference vision_transformer.py:15-96 ships
``deit_b16_224`` weights produced by it) assembled entirely from
chambers_tpu parts:

- per-image **RandAugment** + ImageNet normalization, fused on device
- **MixUp / CutMix** with a per-batch coin flip (timm semantics)
- **AdamW** with weight-decay masks (no decay on bias/norm/cls)
- **cosine schedule** under a **linear warmup**
- **parameter EMA** (the shadow weights DeiT evaluates with)
- **FSDP (ZeRO-3)** sharding of weights and Adam moments over the data mesh
- **TensorBoard** event files (no TF dependency)

Runs on synthetic data (the point is the train-step stack, not the
loader); for image-folder input plug the ``InterleaveImageClassDataset``
recipe from ``examples/train_cnn_classifier.py`` into ``EpochStream``.
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chambers_tpu.augmentations import (
    CutMix,
    ImageNetNormalization,
    MixUp,
    RandAugment,
    mixup_or_cutmix,
)
from chambers_tpu.callbacks import TensorBoard
from chambers_tpu.models import Model
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.optimizers import AdamW
from chambers_tpu.parallel import create_mesh, fsdp_rules
from chambers_tpu.schedules import CosineDecay, LinearWarmup
from chambers_tpu.training import Trainer


def soft_cross_entropy(y_true, y_pred):
    """CE against soft (mixed) targets on logits."""
    return -jnp.mean(jnp.sum(y_true * jax.nn.log_softmax(y_pred), axis=-1))


def soft_accuracy(y_true, y_pred):
    """Top-1 against the dominant mixed target."""
    return jnp.mean(
        (jnp.argmax(y_pred, -1) == jnp.argmax(y_true, -1)).astype(jnp.float32)
    )


def make_augment_fn(n_classes, magnitude):
    """One jitted device program: RandAugment -> normalize -> mix."""
    randaug = RandAugment(n_transforms=2, magnitude=magnitude)
    normalize = ImageNetNormalization(mode="tf")
    mixup = MixUp(alpha=0.8, num_classes=n_classes, label_smoothing=0.1)
    cutmix = CutMix(alpha=1.0, num_classes=n_classes, label_smoothing=0.1)

    @jax.jit
    def augment(images_uint8, labels, key):
        k_ra, k_mix = jax.random.split(key)
        x = normalize(randaug(images_uint8, key=k_ra))
        return mixup_or_cutmix(x, labels, k_mix, mixup=mixup, cutmix=cutmix)

    return augment


def synthetic_batches(n_classes, image_size, batch, steps, augment, seed=0):
    rng = np.random.RandomState(seed)
    for i in range(steps):
        images = rng.randint(
            0, 256, (batch, image_size, image_size, 3), np.uint8)
        labels = rng.randint(0, n_classes, batch)
        yield augment(images, labels, jax.random.PRNGKey(seed * 10_000 + i))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--patch-size", type=int, default=8)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps-per-epoch", type=int, default=8)
    p.add_argument("--magnitude", type=int, default=9)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--logdir", default="/tmp/deit_recipe_logs")
    args = p.parse_args()

    model = VisionTransformer(
        patch_size=args.patch_size, patch_dim=64, n_encoder_layers=2,
        n_heads=4, ff_dim=128, dropout_rate=0.0, classes=args.classes,
        classifier_activation=None,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.image_size, args.image_size, 3)))

    total_steps = args.epochs * args.steps_per_epoch
    schedule = LinearWarmup(
        CosineDecay(args.lr, decay_steps=max(total_steps - 2, 1)),
        warmup_steps=2)
    optimizer = AdamW(weight_decay=0.05, learning_rate=schedule,
                      decay_exclude=["bias", "norm", "cls", "dist"])

    # FSDP over every device: weights + Adam moments stored 1/N
    mesh = create_mesh({"data": -1})
    rules = fsdp_rules(variables["params"], mesh, min_weight_size=1024)
    trainer = Trainer(
        Model(model, variables), loss=soft_cross_entropy,
        optimizer=optimizer, metrics={"acc": soft_accuracy},
        mesh=mesh, param_sharding_rules=rules, ema_decay=0.999, seed=0,
    )

    augment = make_augment_fn(args.classes, args.magnitude)

    class EpochStream:
        def __iter__(self):
            return synthetic_batches(args.classes, args.image_size,
                                     args.batch, args.steps_per_epoch,
                                     augment)

    history = trainer.fit(EpochStream(), epochs=args.epochs,
                          callbacks=[TensorBoard(args.logdir)], verbose=True)

    first, last = history[0]["loss"], history[-1]["loss"]
    print(f"loss {first:.4f} -> {last:.4f}")

    # the DeiT evaluation weights are the EMA shadow
    ema = trainer.ema_variables
    ema_leaf = jax.tree.leaves(ema["params"])[0]
    live_leaf = jax.tree.leaves(trainer.variables["params"])[0]
    drift = float(jnp.mean(jnp.abs(ema_leaf - live_leaf)))
    print(f"ema shadow differs from live params (mean |delta| {drift:.2e})")

    events = glob.glob(os.path.join(args.logdir, "train", "*tfevents*"))
    print(f"tensorboard events: {len(events)} file(s) under {args.logdir}")
    assert events, "no tfevents written"

    shard = next(iter(
        trainer.state.params["encoder"]["layers_0"]["dense1"]["kernel"]
        .addressable_shards)).data.shape
    print(f"fsdp: dense1 kernel stored per-device as {shard} "
          f"on {len(jax.devices())} device(s)")


if __name__ == "__main__":
    main()
