"""A reference training script, ported by changing one import line.

The reference's users train exactly like this — Keras ``compile`` with
string losses/metrics, array-form ``fit`` with a validation split, then
``evaluate``/``predict`` (reference test_units/manual_test_vit_weights.py
drives a built ViT the same way). Everything below is the Keras surface;
underneath, ``compile`` wires a :class:`chambers_tpu.training.Trainer`
whose train step is one donated, jitted XLA program (optionally windowed
with ``steps_per_execution``).

Run a synthetic smoke pass:

    python examples/train_keras_frontdoor.py

or a real run on bigger shapes:

    python examples/train_keras_frontdoor.py --n 4096 --size 96 --epochs 5
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--steps-per-execution", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (tests/smoke)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from chambers_tpu.models.backbones import ViTS16

    # synthetic, learnable data: label = argmax of a fixed projection of
    # the image's mean color (random labels would make loss descent moot)
    rng = np.random.RandomState(0)
    x = rng.randn(args.n, args.size, args.size, 3).astype(np.float32)
    proj = rng.randn(3, args.classes).astype(np.float32)
    y = np.argmax(x.mean(axis=(1, 2)) @ proj, axis=1).astype(np.int32)

    model = ViTS16(weights=None, include_top=True, classes=args.classes,
                   input_shape=(args.size, args.size, 3))

    # -- the Keras script, verbatim ---------------------------------------
    model.compile("adamw", "sparse_categorical_crossentropy",
                  metrics=["accuracy"],
                  steps_per_execution=args.steps_per_execution)
    history = model.fit(x, y, batch_size=args.batch, epochs=args.epochs,
                        validation_split=0.25, shuffle=True)
    logs = model.evaluate(x, y, batch_size=args.batch, verbose=False,
                          return_dict=True)
    preds = model.predict(x[: args.batch], batch_size=args.batch)
    # ----------------------------------------------------------------------

    print(f"final: loss={logs['loss']:.4f} accuracy={logs['accuracy']:.4f} "
          f"val_loss={history[-1]['val_loss']:.4f} "
          f"predictions={preds.shape}")


if __name__ == "__main__":
    main()
