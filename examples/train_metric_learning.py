"""End-to-end metric-learning training example.

Pipeline (the reference's core use case, SURVEY.md §3.2): P×K class-interleaved
batches → on-device RandAugment → ViT backbone with L2-normalized embeddings →
MultiSimilarityLoss(+miner) → AdamW with warmup and decay masks → retrieval
evaluation (recall@k / mAP).

Run on an image-folder dataset (one subdirectory per class):

    python examples/train_metric_learning.py --data /path/to/train

or without arguments for a synthetic smoke run.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chambers_tpu.augmentations import ImageNetNormalization, RandAugment
from chambers_tpu.callbacks import ExperimentCallback
from chambers_tpu.data import InterleaveImageClassDataset, match_nested_set
from chambers_tpu.layers import l2_normalize
from chambers_tpu.losses import MultiSimilarityLoss
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.models import Model
from chambers_tpu.optimizers import AdamW
from chambers_tpu.schedules import LinearWarmup
from chambers_tpu.training import Trainer
from chambers_tpu.utils.ranking import (
    mean_average_precision,
    recall_at_k,
    score_matrix_to_binary_ranking,
)


def build_embedder(image_size, embed_dim=128, seed=0):
    """Small ViT backbone + L2-normalized embedding head."""
    vit = VisionTransformer(
        patch_size=8, patch_dim=192, n_encoder_layers=6, n_heads=6,
        ff_dim=768, dropout_rate=0.1, include_top=False, pooling="cls",
        feature_dim=embed_dim, dtype=jnp.bfloat16,
    )
    dummy = jnp.zeros((1, image_size, image_size, 3))
    variables = vit.init(jax.random.PRNGKey(seed), dummy)
    return Model(vit, variables, name="vit_embedder")


def make_dataset(data_dir, p_classes, k_images, image_size, seed):
    class_dirs = sorted(match_nested_set(data_dir))
    labels = list(range(len(class_dirs)))
    print(f"{len(class_dirs)} classes found in {data_dir}")

    from PIL import Image

    def host_resize(x, y):
        # PIL on host threads — per-image jax resizes would round-trip the
        # device serially and starve the input pipeline
        img = Image.fromarray(np.asarray(x)).resize(
            (image_size, image_size), Image.BILINEAR
        )
        return np.asarray(img, np.uint8), y

    ds = InterleaveImageClassDataset(
        class_dirs=class_dirs, labels=labels,
        class_cycle_length=p_classes, images_per_block=k_images,
        sample_block_random=True, shuffle=True, seed=seed, repeats=-1,
    )
    ds = ds.map(host_resize, num_parallel_calls=8)
    # multi-host DP: each process reads its own slice of the element stream,
    # batches host-locally, and the Trainer/mesh path reassembles via
    # parallel.distributed.host_local_batch_to_global (SURVEY.md §2.8 DP row)
    if jax.process_count() > 1:
        ds = ds.shard(jax.process_count(), jax.process_index())
    return ds.batch(p_classes * k_images, drop_remainder=True).prefetch()


def synthetic_batches(n_batches, batch, image_size, n_classes=8, seed=0):
    """Class-colored noise images — enough signal for a smoke run."""
    rng = np.random.RandomState(seed)
    for _ in range(n_batches):
        y = rng.randint(0, n_classes, batch)
        base = (y[:, None, None, None] * 29 % 255).astype(np.uint8)
        noise = rng.randint(0, 60, (batch, image_size, image_size, 3))
        x = np.clip(base + noise, 0, 255).astype(np.uint8)
        yield x, y.astype(np.int64)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default=None, help="image folder root")
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--p", type=int, default=8, help="classes per batch")
    parser.add_argument("--k", type=int, default=4, help="images per class")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--experiments", default="experiments")
    args = parser.parse_args()

    model = build_embedder(args.image_size)
    augment = RandAugment(n_transforms=2, magnitude=9, elementwise=True)
    normalize = ImageNetNormalization(mode="tf")
    loss = MultiSimilarityLoss()

    def apply_fn(variables, images, deterministic, rngs):
        x = images
        if not deterministic and rngs is not None:
            # derive the augmentation stream from the step's dropout key
            aug_key = jax.random.fold_in(rngs["dropout"], 1)
            x = augment(x, key=aug_key)
        x = normalize(x)
        z = model.module.apply(
            variables, x, deterministic=deterministic, rngs=rngs
        )
        return l2_normalize(z, axis=-1)

    trainer = Trainer(
        model,
        loss=loss,
        optimizer=AdamW(
            weight_decay=1e-4,
            decay_exclude=["bias", "norm", "embeddings"],
            learning_rate=LinearWarmup(args.lr, warmup_steps=50),
        ),
        apply_fn=apply_fn,
    )

    if args.data:
        train_iter = make_dataset(
            args.data, args.p, args.k, args.image_size, seed=42
        )
    else:
        print("no --data given: synthetic smoke run")
        train_iter = list(synthetic_batches(
            args.steps, args.p * args.k, args.image_size
        ))

    trainer.fit(
        train_iter, epochs=args.epochs, steps_per_epoch=args.steps,
        callbacks=[ExperimentCallback(args.experiments,
                                      checkpoint_monitor="loss")],
    )

    # retrieval evaluation on a fresh batch
    eval_batches = list(synthetic_batches(4, args.p * args.k,
                                          args.image_size, seed=7))
    zs, ys = [], []
    embed = jax.jit(lambda v, x: apply_fn(v, x, True, None))
    for x, y in eval_batches:
        zs.append(np.asarray(embed(trainer.variables, jnp.asarray(x))))
        ys.append(y)
    z = np.concatenate(zs)
    y = np.concatenate(ys)
    scores = z @ z.T
    ranking = score_matrix_to_binary_ranking(
        jnp.asarray(scores), jnp.asarray(y), jnp.asarray(y), remove_top1=True
    )
    print(f"recall@1 {float(recall_at_k(ranking, 1)):.3f} | "
          f"recall@4 {float(recall_at_k(ranking, 4)):.3f} | "
          f"mAP {float(mean_average_precision(ranking)):.3f}")


if __name__ == "__main__":
    main()
