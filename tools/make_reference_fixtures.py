"""Generate real reference checkpoints + golden logits for importer tests.

Builds randomly-initialized reference models with the *actual* reference
builders (via tools/reference_runtime.py), saves genuine Keras-2 legacy
``.h5`` weight files, and records (input, output) goldens. The parity tests
in tests/models/test_reference_h5_parity.py import these files through our
h5 importers and assert logit parity — the strongest offline validation of
the checkpoint naming/ordering contract (the released weight files were
written by exactly this save path).

Usage: TF_USE_LEGACY_KERAS=1 python tools/make_reference_fixtures.py OUTDIR
       [model ...]   (default: all)
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (chambers_tpu import)
from reference_runtime import ensure_reference_importable  # noqa: E402

ensure_reference_importable()

import numpy as np  # noqa: E402


def _bninception_twin():
    """tf_keras twin of chambers_tpu's BN-Inception (no top).

    The reference ships no BNInception architecture (it loads a stored
    model), so this twin is built from the same published channel table as
    chambers_tpu/models/backbones/inception.py, with layer *call order*
    matching that module's creation order. Saving it through the legacy h5
    path produces a file in exactly the stored-model weight layout class the
    order-based importer must handle, and its predictions validate our
    conv/BN/pool semantics end-to-end.
    """
    import tf_keras as keras

    L = keras.layers

    def conv_bn(x, filters, kernel, strides=1, pad=0):
        if pad:
            x = L.ZeroPadding2D(((pad, pad), (pad, pad)))(x)
        x = L.Conv2D(filters, kernel, strides=strides, use_bias=True)(x)
        x = L.BatchNormalization(epsilon=1e-3)(x)
        return L.ReLU()(x)

    def pool2(x, kind):
        x = L.ZeroPadding2D(((0, 1), (0, 1)))(x)
        cls = L.MaxPooling2D if kind == "max" else L.AveragePooling2D
        return cls(3, strides=2, padding="valid")(x)

    from chambers_tpu.models.backbones.inception import _MODULES

    inp = L.Input((224, 224, 3))
    x = conv_bn(inp, 64, 7, strides=2, pad=3)
    x = pool2(x, "max")
    x = conv_bn(x, 64, 1)
    x = conv_bn(x, 192, 3, pad=1)
    x = pool2(x, "max")
    for (b1, b3r, b3, bdr, bd, pp, pk) in _MODULES:
        stride = 1 if b1 is not None else 2
        branches = []
        if b1 is not None:
            branches.append(conv_bn(x, b1, 1))
        y = conv_bn(x, b3r, 1)
        branches.append(conv_bn(y, b3, 3, strides=stride, pad=1))
        z = conv_bn(x, bdr, 1)
        z = conv_bn(z, bd, 3, pad=1)
        branches.append(conv_bn(z, bd, 3, strides=stride, pad=1))
        if b1 is not None:
            pool_cls = L.MaxPooling2D if pk == "max" else L.AveragePooling2D
            p = pool_cls(3, strides=1, padding="same")(x)
            branches.append(conv_bn(p, pp, 1))
        else:
            branches.append(pool2(x, "max"))
        x = L.Concatenate()(branches)
    return keras.Model(inp, x, name="bninception")


def _builders():
    from chambers.models.backbones import resnext, senet, vision_transformer

    return {
        "bninception": _bninception_twin,
        "vit_b16": lambda: vision_transformer.ViTB16(
            input_shape=(224, 224, 3), weights=None),
        "deit_b16": lambda: vision_transformer.DeiTB16(
            input_shape=(224, 224, 3), weights=None),
        "seresnet50": lambda: senet.SEResNet50(
            input_shape=(224, 224, 3), weights=None),
        "seresnext50": lambda: senet.SEResNeXt50(
            input_shape=(224, 224, 3), weights=None),
        "resnext50": lambda: resnext.ResNeXt50(
            input_shape=(224, 224, 3), weights=None),
    }


def main():
    outdir = sys.argv[1]
    wanted = sys.argv[2:] or None
    os.makedirs(outdir, exist_ok=True)
    x = np.random.default_rng(0).uniform(
        0, 1, (2, 224, 224, 3)).astype("float32")
    for name, build in _builders().items():
        if wanted and name not in wanted:
            continue
        h5 = os.path.join(outdir, f"{name}.h5")
        npz = os.path.join(outdir, f"{name}.npz")
        if os.path.exists(h5) and os.path.exists(npz):
            print(f"{name}: cached")
            continue
        model = build()
        model.save_weights(h5)
        y = model.predict(x, verbose=0)
        if isinstance(y, list):  # DeiT returns [cls, dist]
            np.savez(npz, x=x, y=y[0], y_dist=y[1])
        else:
            np.savez(npz, x=x, y=y)
        print(f"{name}: saved {model.count_params()} params")


if __name__ == "__main__":
    main()
