"""Checkpoint-contract parity against *real* reference Keras-2 saves.

A session fixture runs the actual reference builders (via tf_keras shims,
tools/make_reference_fixtures.py) in a subprocess, saving genuine legacy
``.h5`` weight files plus golden logits. These are the same builders and the
same Keras save path that produced the released weight files, so passing
here demonstrates the full naming/ordering contract of our importers offline
(reference test_units/manual_test_vit_weights.py:324-341 is the end-to-end
tolerance model: atol 1e-3; we hold 1e-4).

Skipped automatically when the reference checkout or tf_keras is missing.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "_reference_fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
MODELS = ["vit_b16", "deit_b16", "seresnet50", "seresnext50", "resnext50",
          "bninception"]


def _can_generate():
    if not os.path.isdir("/root/reference/chambers"):
        return False
    try:
        import tf_keras  # noqa: F401
    except Exception:
        return False
    return True


@pytest.fixture(scope="session")
def fixtures():
    missing = [m for m in MODELS
               if not (os.path.exists(os.path.join(FIXTURE_DIR, f"{m}.h5"))
                       and os.path.exists(os.path.join(FIXTURE_DIR, f"{m}.npz")))]
    if missing:
        if not _can_generate():
            pytest.skip("reference checkout / tf_keras unavailable and no "
                        "cached fixtures")
        env = dict(os.environ, TF_USE_LEGACY_KERAS="1")
        env.pop("JAX_PLATFORMS", None)
        subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "make_reference_fixtures.py"),
             FIXTURE_DIR, *missing],
            check=True, env=env, timeout=1800,
        )
    return FIXTURE_DIR


def _paths(fixtures, name):
    d = np.load(os.path.join(fixtures, f"{name}.npz"))
    return os.path.join(fixtures, f"{name}.h5"), d


def test_vit_b16_real_h5_logit_parity(fixtures):
    from chambers_tpu.models.backbones import ViTB16

    h5, d = _paths(fixtures, "vit_b16")
    model = ViTB16(input_shape=(224, 224, 3), weights=h5)
    y = np.asarray(model(d["x"]))
    assert np.abs(y - d["y"]).max() < 1e-4


def test_deit_b16_real_h5_logit_parity(fixtures):
    from chambers_tpu.models.backbones import DeiTB16

    h5, d = _paths(fixtures, "deit_b16")
    model = DeiTB16(input_shape=(224, 224, 3), weights=h5)
    y_cls, y_dist = model(d["x"])
    assert np.abs(np.asarray(y_cls) - d["y"]).max() < 1e-4
    assert np.abs(np.asarray(y_dist) - d["y_dist"]).max() < 1e-4


def test_seresnet50_real_h5_parity(fixtures):
    from chambers_tpu.models.backbones import SEResNet50

    h5, d = _paths(fixtures, "seresnet50")
    model = SEResNet50(input_shape=(224, 224, 3), weights=h5)
    y = np.asarray(model(d["x"], training=False))
    # softmax outputs; conv stacks accumulate backend-dependent rounding
    assert np.abs(y - d["y"]).max() < 5e-4


def test_seresnext50_real_h5_parity(fixtures):
    """Covers the reference's per-group Conv2D layers -> single grouped-conv
    kernel concatenation in the order-based importer."""
    from chambers_tpu.models.backbones import SEResNeXt50

    h5, d = _paths(fixtures, "seresnext50")
    model = SEResNeXt50(input_shape=(224, 224, 3), weights=h5)
    y = np.asarray(model(d["x"], training=False))
    assert np.abs(y - d["y"]).max() < 5e-4


def test_resnext50_real_h5_parity(fixtures):
    """Covers the keras-applications depthwise->grouped kernel conversion."""
    from chambers_tpu.models.backbones import ResNeXt50

    h5, d = _paths(fixtures, "resnext50")
    model = ResNeXt50(input_shape=(224, 224, 3), weights=h5)
    y = np.asarray(model(d["x"], training=False))
    assert np.abs(y - d["y"]).max() < 5e-4


def test_bninception_h5_feature_parity(fixtures):
    """BN-Inception vs its tf_keras twin: validates the published module
    graph's conv/BN/pool semantics end-to-end plus the stored-model
    order-based import (raw pre-pooling features, so tolerances are loose
    relative to unit scale)."""
    from chambers_tpu.models.backbones.inception import BNInception

    h5, d = _paths(fixtures, "bninception")
    model = BNInception(weights_path=h5, pooling=None)
    y = np.asarray(model(d["x"], training=False))
    assert y.shape == d["y"].shape == (2, 7, 7, 1024)
    scale = np.abs(d["y"]).max()
    assert np.abs(y - d["y"]).max() < 1e-4 * max(scale, 1.0)


def test_bninception_pooling(fixtures):
    from chambers_tpu.models.backbones.inception import BNInception

    h5, _ = _paths(fixtures, "bninception")
    model = BNInception(weights_path=h5, pooling="avg")
    y = model(np.zeros((1, 224, 224, 3), np.float32), training=False)
    assert y.shape == (1, 1024)
