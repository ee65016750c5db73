"""Config serialization round-trip for the public API.

Parity: the reference registers nearly every class with
``@tf.keras.utils.register_keras_serializable(package="Chambers")`` and
implements ``get_config``/``from_config`` (e.g. reference
layers/attention.py:155-181, miners.py:37-44) — config round-trip is part of
its API contract (SURVEY.md §5.4). This build provides the equivalent as
free functions over the whole public namespace:

- ``get_config(obj)`` — explicit ``obj.get_config()`` if defined, the
  dataclass fields for Flax modules (our layers/models are dataclasses), or
  ``__init__``-signature introspection against same-named attributes.
- ``serialize_object(obj)`` / ``deserialize_object(spec)`` — class-registry
  round-trip, recursing into nested objects (e.g. ``RandomChance.transform``,
  a loss's ``miner``) and encoding dtypes as strings.

Every public layer, loss, miner, augmentation, and schedule is registered;
``tests/test_serialization.py`` round-trips them all.
"""

import dataclasses
import inspect
from typing import Any, Dict

import numpy as np

_REGISTRY: Dict[str, type] = {}


def register_serializable(cls):
    """Register a class for ``deserialize_object`` (idempotent; decorator)."""
    _REGISTRY[cls.__name__] = cls
    return cls


def _register_public_namespaces():
    import chambers_tpu.augmentations as A
    import chambers_tpu.layers as L
    import chambers_tpu.losses as Lo
    import chambers_tpu.metrics as Me
    import chambers_tpu.miners as M
    import chambers_tpu.optimizers as O
    import chambers_tpu.schedules as S

    for mod in (L, Lo, M, A, S, O, Me):
        for name in dir(mod):
            obj = getattr(mod, name)
            if (inspect.isclass(obj) and not name.startswith("_")
                    and obj.__module__.startswith("chambers_tpu")):
                _REGISTRY.setdefault(name, obj)

    # model architectures (the reference's model builders return Keras models
    # whose get_config is the module graph; here the Flax module dataclass IS
    # the architecture config — reference vision_transformer.py:288)
    from chambers_tpu.models import Seq2SeqTransformer
    from chambers_tpu.models.backbones import (
        DistilledVisionTransformer, VisionTransformer,
    )
    from chambers_tpu.models.backbones.inception import BNInceptionModule
    from chambers_tpu.models.backbones.resnext import ResNeXtModule
    from chambers_tpu.models.backbones.senet import SENetModule
    from chambers_tpu.models.detection import DETR

    for cls in (VisionTransformer, DistilledVisionTransformer, SENetModule,
                ResNeXtModule, BNInceptionModule, Seq2SeqTransformer, DETR):
        _REGISTRY.setdefault(cls.__name__, cls)


def _ensure_registry():
    if not _REGISTRY:
        _register_public_namespaces()


def _is_serializable_instance(value):
    _ensure_registry()
    cls = _REGISTRY.get(type(value).__name__)
    return cls is not None and isinstance(value, cls)


def _encode(value):
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    if isinstance(value, dict):
        return {k: _encode(v) for k, v in value.items()}
    if _is_serializable_instance(value):
        return serialize_object(value)
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, (np.integer, np.floating)):
        return value.item()
    # jnp dtypes arrive as classes (jnp.bfloat16) or np.dtype instances;
    # JSON-encode them as names (strings pass through untouched)
    if not isinstance(value, (str, int, float, bool, type(None))):
        try:
            return {"__dtype__": np.dtype(value).name}
        except TypeError:
            pass
        if callable(value):
            raise ValueError(
                f"Cannot serialize callable config value {value!r}; define "
                "an explicit get_config() on the owning class."
            )
    return value


def _decode(value):
    if isinstance(value, dict) and "__dtype__" in value:
        return np.dtype(value["__dtype__"])
    if isinstance(value, dict) and "class_name" in value and "config" in value:
        return deserialize_object(value)
    if isinstance(value, dict):
        return {k: _decode(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


def get_config(obj) -> Dict[str, Any]:
    """Constructor kwargs reproducing ``obj`` (reference ``get_config``)."""
    explicit = getattr(type(obj), "get_config", None)
    if explicit is not None:
        return obj.get_config()
    if dataclasses.is_dataclass(obj):
        config = {}
        for f in dataclasses.fields(obj):
            if f.name in ("parent", "name"):
                continue
            value = getattr(obj, f.name)
            # omit values equal to the field default: keeps configs JSON-small
            # and skips non-serializable defaults (e.g. kernel initializers)
            if f.default is not dataclasses.MISSING:
                if value is f.default:
                    continue
                try:
                    if bool(value == f.default):
                        continue
                except Exception:
                    pass
            config[f.name] = value
        return config
    config = {}
    sig = inspect.signature(type(obj).__init__)
    for pname, param in sig.parameters.items():
        if pname == "self" or param.kind in (param.VAR_POSITIONAL,
                                             param.VAR_KEYWORD):
            continue
        if not hasattr(obj, pname):
            raise ValueError(
                f"{type(obj).__name__} stores no attribute for __init__ "
                f"parameter '{pname}'; define an explicit get_config()."
            )
        config[pname] = getattr(obj, pname)
    return config


def serialize_object(obj) -> Dict[str, Any]:
    """``{"class_name", "config"}`` spec (Keras serialize contract)."""
    _ensure_registry()
    name = type(obj).__name__
    if name not in _REGISTRY:
        raise ValueError(f"{name} is not a registered serializable class.")
    return {"class_name": name,
            "config": {k: _encode(v) for k, v in get_config(obj).items()}}


def deserialize_object(spec):
    """Rebuild an object from ``serialize_object`` output."""
    _ensure_registry()
    cls = _REGISTRY.get(spec["class_name"])
    if cls is None:
        raise ValueError(f"Unknown serializable class '{spec['class_name']}'")
    config = {k: _decode(v) for k, v in spec["config"].items()}
    from_config = getattr(cls, "from_config", None)
    if from_config is not None:
        return cls.from_config(config)
    return cls(**config)
