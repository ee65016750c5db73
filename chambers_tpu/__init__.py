"""chambers_tpu — a TPU-native (JAX/XLA/Pallas) re-design of the Chambers library.

Chambers (chjort/chambers) is a TF2/Keras utility library for image retrieval,
deep metric learning, and vision transformers. chambers_tpu rebuilds the same
capability surface TPU-first:

- ``chambers_tpu.layers``       — transformer/attention/embedding/pooling layers
  (Flax modules with the reference's per-head weight layout so released
  checkpoints import deterministically).
- ``chambers_tpu.augmentations`` — AutoAugment/RandAugment and the 16 image ops
  as batched, branchless, on-device kernels keyed by ``jax.random`` PRNG keys.
- ``chambers_tpu.models``       — ViT/DeiT/SENet/ResNeXt backbones + Seq2Seq
  transformer.
- ``chambers_tpu.losses`` / ``miners`` / ``metrics`` — dense-mask pair losses.
- ``chambers_tpu.data``         — host-side P×K interleave pipeline feeding
  device-side augmentation.
- ``chambers_tpu.optimizers`` / ``schedules`` / ``callbacks`` / ``training`` —
  optax-based AdamW/SGDW with regex decay masks, warmup schedules, and an
  experiment harness.
- ``chambers_tpu.parallel``     — ``jax.sharding`` mesh utilities for
  data/model/context-parallel training over TPU slices.
- ``chambers_tpu.serving``      — AOT StableHLO export/load for deployment.
- ``chambers_tpu.quantization`` — int8 dynamic post-training quantization for
  the serving path (per-channel int8 weights + per-token activations on the
  MXU's 2× int8 rate).

Reference parity notes cite ``/root/reference`` file:line in docstrings.
"""

__version__ = "0.1.0"

_SUBMODULES = (
    "activations", "augmentations", "callbacks", "data", "layers", "losses",
    "metrics", "miners", "models", "ops", "optimizers", "parallel",
    "quantization", "schedules", "serving", "training", "utils",
)


def __getattr__(name):
    """Lazy subpackage import: ``import chambers_tpu; chambers_tpu.losses``
    works without paying for every subsystem at import time."""
    if name in _SUBMODULES:
        import importlib

        module = importlib.import_module(f"chambers_tpu.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'chambers_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
