"""Run the reference (chjort/chambers, TF2.6-era Keras) under modern TF.

The reference imports Keras 2 through paths that TF >= 2.16 removed
(``tensorflow.python.keras``, ``tensorflow.keras.layers.experimental``) and
depends on ``tensorflow_addons`` (not installed here). The genuine Keras 2
implementation ships as the ``tf_keras`` package, so aliasing those legacy
module paths onto ``tf_keras`` lets the *actual reference builders* run and
save *real* legacy-format ``.h5`` files — which is how the checkpoint-naming
contract of our importers is validated offline (no release downloads needed).

Import this module **before** anything imports TensorFlow, in a process with
``TF_USE_LEGACY_KERAS=1`` (``ensure_reference_importable`` enforces both).

tfa is only stubbed: the model builders never *call* tfa ops; the stub lets
``chambers.augmentations`` import so the backbones' ``preprocess_input``
re-exports resolve.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def ensure_reference_importable():
    if os.environ.get("TF_USE_LEGACY_KERAS") != "1":
        raise RuntimeError(
            "Set TF_USE_LEGACY_KERAS=1 in the environment before starting "
            "Python (tensorflow.keras must resolve to tf_keras)."
        )
    if "tensorflow" in sys.modules and "tf_keras" not in sys.modules:
        raise RuntimeError(
            "TensorFlow was already imported without the legacy-keras shims."
        )
    import tf_keras

    # plain assignment, NOT setdefault: importing tf_keras pulls in
    # tensorflow, and TF >= 2.16 still registers a vestigial (empty)
    # tensorflow.python.keras that must be displaced
    sys.modules["tensorflow.python.keras"] = tf_keras.src
    for sub in ("backend", "layers", "models", "utils", "applications"):
        mod = __import__(f"tf_keras.src.{sub}", fromlist=["_"])
        sys.modules[f"tensorflow.python.keras.{sub}"] = mod
    import tf_keras.src.applications.resnet as _resnet
    import tf_keras.src.utils.control_flow_util as _cfu
    import tf_keras.src.utils.data_utils as _du

    sys.modules["tensorflow.python.keras.utils.data_utils"] = _du
    sys.modules["tensorflow.python.keras.applications.resnet"] = _resnet
    # reference augmentation_schemes.py does
    # `from keras.utils.control_flow_util import smart_cond`
    sys.modules["keras.utils.control_flow_util"] = _cfu

    if "tensorflow_addons" not in sys.modules:
        tfa = types.ModuleType("tensorflow_addons")
        tfa.image = types.ModuleType("tensorflow_addons.image")
        tfa.optimizers = types.ModuleType("tensorflow_addons.optimizers")

        def _unavailable(*_a, **_k):
            raise RuntimeError("tensorflow_addons stub: op not available")

        for name in ("rotate", "transform", "translate", "equalize",
                     "sharpness", "random_cutout"):
            setattr(tfa.image, name, _unavailable)

        class _DecoupledWeightDecayExtension:  # noqa: N801 - tfa name
            pass

        tfa.optimizers.DecoupledWeightDecayExtension = (
            _DecoupledWeightDecayExtension)
        sys.modules["tensorflow_addons"] = tfa
        sys.modules["tensorflow_addons.image"] = tfa.image
        sys.modules["tensorflow_addons.optimizers"] = tfa.optimizers

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import chambers  # noqa: F401  (proves the reference imports)
