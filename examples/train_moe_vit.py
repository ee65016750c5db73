"""Mixture-of-Experts ViT training example (EP x DP through the Trainer).

Beyond-reference capability (SURVEY.md §2.8 EP row): a V-MoE-style ViT —
every other encoder MLP replaced by a top-k routed expert MLP
(`chambers_tpu.layers.moe`) — trained with the standard Trainer. The sown
load-balancing auxiliary losses are added to the objective automatically;
expert weights shard over an `expert` mesh axis (expert parallelism) while
the batch shards over `data`, all from one `param_sharding_rules` argument.

Run with a mesh (any dp*ep <= device count; dp=ep=1 means no mesh):

    python examples/train_moe_vit.py --dp 2 --ep 4

The synthetic task is learnable (class-dependent channel means), so the
loss must drop; the script also reports how balanced the router's
dispatch is after training.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from chambers_tpu.layers.moe import moe_aux_loss
from chambers_tpu.models import Model
from chambers_tpu.models.backbones.vision_transformer import VisionTransformer
from chambers_tpu.optimizers import AdamW
from chambers_tpu.training import Trainer


def build_model(image_size, n_classes, n_experts, top_k, seed=0):
    vit = VisionTransformer(
        patch_size=8, patch_dim=32, n_encoder_layers=4, n_heads=4,
        ff_dim=64, dropout_rate=0.0, include_top=True, classes=n_classes,
        moe_every_n=2, moe_n_experts=n_experts,
        moe_n_selected_experts=top_k,
        # None = one global routing group (O(n^2) dispatch memory — fine at
        # these toy token counts). For large batches set a divisor of the
        # flattened batch*tokens count to bound it at O(n * group_size).
        moe_group_size=None,
    )
    dummy = jnp.zeros((1, image_size, image_size, 3))
    variables = vit.init(jax.random.PRNGKey(seed), dummy)
    return Model(vit, variables, name="moe_vit")


def synthetic_batches(n_classes, image_size, batch, steps, seed):
    """Class-separable images: class c has channel means keyed by c."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.0, 1.0, size=(n_classes, 3)).astype(np.float32)
    for _ in range(steps):
        y = rng.integers(0, n_classes, size=(batch,))
        x = rng.normal(0.0, 0.3, size=(batch, image_size, image_size, 3))
        x = (x + means[y][:, None, None, :]).astype(np.float32)
        yield x, y.astype(np.int32)


def cross_entropy(y, logits):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps-per-epoch", type=int, default=20)
    ap.add_argument("--experts", type=int, default=4)
    ap.add_argument("--top-k", type=int, default=2)
    ap.add_argument("--dp", type=int, default=1, help="data-parallel size")
    ap.add_argument("--ep", type=int, default=1, help="expert-parallel size")
    args = ap.parse_args(argv)

    model = build_model(args.image_size, args.classes, args.experts,
                        args.top_k)

    mesh = rules = None
    if args.dp * args.ep > 1:
        from chambers_tpu.parallel import create_mesh
        from chambers_tpu.parallel.expert_parallel import (
            moe_expert_parallel_rules,
        )

        mesh = create_mesh({"data": args.dp, "expert": args.ep})
        rules = moe_expert_parallel_rules("expert")
        print(f"mesh: data={args.dp} x expert={args.ep}")

    trainer = Trainer(
        model,
        loss=cross_entropy,
        optimizer=AdamW(learning_rate=3e-3, weight_decay=1e-4),
        mesh=mesh,
        param_sharding_rules=rules,
    )

    first_loss = last_loss = None
    for epoch in range(args.epochs):
        data = synthetic_batches(args.classes, args.image_size, args.batch,
                                 args.steps_per_epoch, seed=epoch)
        logs = trainer.fit(data, epochs=1,
                           steps_per_epoch=args.steps_per_epoch,
                           verbose=False)
        loss = float(logs[-1]["loss"])
        if first_loss is None:
            first_loss = loss
        last_loss = loss
        # the Trainer logs the routed layers' balance(+z) term on its own
        aux = float(logs[-1]["moe_aux_loss"])
        print(f"epoch {epoch}: loss={loss:.4f} moe_aux={aux:.5f}")

    print(f"loss {first_loss:.4f} -> {last_loss:.4f} "
          f"({'improved' if last_loss < first_loss else 'NOT improved'})")

    # routing balance after training: fraction of tokens whose first choice
    # is each expert (the aux loss drives this toward uniform)
    x, _ = next(synthetic_batches(args.classes, args.image_size, args.batch,
                                  1, seed=99))
    _, state = model.module.apply(
        trainer.variables, jnp.asarray(x), mutable=["intermediates"]
    )
    aux = float(moe_aux_loss(state["intermediates"]))
    print(f"moe aux loss on held-out batch: {aux:.5f}")
    return last_loss


if __name__ == "__main__":
    main()
