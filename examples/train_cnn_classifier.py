"""Fine-tune a BatchNorm CNN backbone end-to-end through the Trainer.

The reference trains its SENet/ResNeXt/BN-Inception backbones via Keras
``compile``/``fit`` (reference senet.py:326-474); the TPU-native Trainer
does the same with mutable ``batch_stats`` threaded through the jitted,
donated train step — running stats update per step, single-device or
data-parallel over a mesh.

Run on an image-folder dataset (one subdirectory per class):

    python examples/train_cnn_classifier.py --data /path/to/train

or without arguments for a synthetic smoke run (tiny images, random data).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chambers_tpu.augmentations import ImageNetNormalization
from chambers_tpu.data import InterleaveImageClassDataset, match_nested_set
from chambers_tpu.models.backbones import SEResNet50
from chambers_tpu.optimizers import SGDW
from chambers_tpu.schedules import LinearWarmup
from chambers_tpu.training import Trainer


def cross_entropy(y_true, y_pred):
    """One-hot CE over softmax outputs (the backbones end in softmax)."""
    return -jnp.mean(jnp.sum(y_true * jnp.log(y_pred + 1e-8), axis=-1))


def accuracy(y_true, y_pred):
    return jnp.mean(
        (jnp.argmax(y_pred, -1) == jnp.argmax(y_true, -1)).astype(jnp.float32)
    )


def synthetic_batches(n_classes, image_size, batch, steps, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        x = rng.randint(0, 256, (batch, image_size, image_size, 3),
                        np.uint8)
        y = np.eye(n_classes, dtype=np.float32)[
            rng.randint(0, n_classes, batch)]
        yield x.astype(np.float32), y


def folder_batches(data_dir, n_classes, image_size, batch):
    normalize = ImageNetNormalization(mode="torch")
    dirs = sorted(match_nested_set(data_dir))[:n_classes]
    ds = InterleaveImageClassDataset(
        dirs, list(range(len(dirs))), class_cycle_length=min(8, len(dirs)),
        images_per_block=4, shuffle=True, seed=0, repeats=-1,
    ).batch(batch)
    for images, labels in iter(ds):
        x = np.stack([
            np.asarray(
                jax.image.resize(jnp.asarray(img, jnp.float32),
                                 (image_size, image_size, 3), "bilinear"))
            for img in images
        ])
        x = np.asarray(normalize(jnp.asarray(x)))
        y = np.eye(len(dirs), dtype=np.float32)[np.asarray(labels)]
        yield x, y


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default=None)
    parser.add_argument("--classes", type=int, default=10)
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--steps-per-epoch", type=int, default=8)
    args = parser.parse_args()

    model = SEResNet50(weights=None, input_shape=(args.image_size,
                                                  args.image_size, 3),
                       classes=args.classes)
    stats_before = np.asarray(
        jax.tree.leaves(model.variables["batch_stats"])[0]).copy()

    trainer = Trainer(
        model,
        loss=cross_entropy,
        optimizer=SGDW(weight_decay=1e-4, learning_rate=LinearWarmup(
            0.01, warmup_steps=5), momentum=0.9,
            decay_exclude=["bias", "scale"]),
        metrics={"acc": accuracy},
    )

    if args.data:
        batches = folder_batches(args.data, args.classes, args.image_size,
                                 args.batch)
    else:
        batches = synthetic_batches(
            args.classes, args.image_size, args.batch,
            steps=args.epochs * args.steps_per_epoch)

    trainer.fit(batches, epochs=args.epochs,
                steps_per_epoch=args.steps_per_epoch)

    stats_after = np.asarray(
        jax.tree.leaves(trainer.variables["batch_stats"])[0])
    print("batch_stats moved:",
          float(np.max(np.abs(stats_after - stats_before))))


if __name__ == "__main__":
    main()
