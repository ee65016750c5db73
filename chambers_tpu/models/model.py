"""Lightweight model wrapper bundling a Flax module with its variables.

The reference returns built ``tf.keras.Model`` objects from its model
builders (e.g. vision_transformer.py:288) — users call them directly, run
``.predict``, and ``.load_weights``/``.save_weights``. JAX has no Keras, so
this wrapper provides that thin user-facing surface over the idiomatic
(module, variables) pair while keeping everything functional underneath:
``model.apply_fn`` is a pure function suitable for ``jax.jit`` / ``pjit``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


class Model:
    """Bundles ``(module, variables)`` with convenience inference methods."""

    def __init__(
        self,
        module,
        variables,
        preprocess: Optional[Callable] = None,
        name: Optional[str] = None,
        apply_fn: Optional[Callable] = None,
    ):
        self.module = module
        self.variables = variables
        self.preprocess = preprocess
        self.name = name or type(module).__name__
        # optional apply override (e.g. lora.wrap_apply): EVERY inference
        # path — __call__, predict, serving export, and the Trainer's
        # default step — routes through it, so a model whose variables only
        # make sense through a transform (LoRA adapters) can't silently run
        # the raw module
        self._apply_override = apply_fn
        self._jit_apply = None

    # -- functional surface -------------------------------------------------
    @property
    def params(self):
        return self.variables.get("params", self.variables)

    def apply_fn(self, variables, *args, **kwargs):
        """Pure apply — use this under jit/pjit with explicit variables."""
        if self._apply_override is not None:
            return self._apply_override(variables, *args, **kwargs)
        return self.module.apply(variables, *args, **kwargs)

    def with_apply_fn(self, apply_fn: Optional[Callable]) -> "Model":
        """Install (or clear, with None) the apply override in place."""
        self._apply_override = apply_fn
        self._jit_apply = None
        return self

    # -- eager convenience --------------------------------------------------
    def __call__(self, x, training: bool = False, rngs=None):
        deterministic = not training
        return self.apply_fn(
            self.variables, x, deterministic=deterministic, rngs=rngs
        )

    def predict(self, x, batch_size: int = 32):
        """Batched jitted inference over a host array (pads the tail batch)."""
        if self._jit_apply is None:
            self._jit_apply = jax.jit(
                lambda v, b: self.apply_fn(v, b, deterministic=True)
            )
        x = np.asarray(x)
        n = x.shape[0]
        if n == 0:
            out_tree = jax.eval_shape(
                lambda v, b: self.apply_fn(v, b, deterministic=True),
                self.variables, jnp.zeros((1,) + x.shape[1:], x.dtype),
            )
            return jax.tree.map(
                lambda s: np.zeros((0,) + s.shape[1:], s.dtype), out_tree
            )
        n_batches = math.ceil(n / batch_size)
        outs = []
        for i in range(n_batches):
            batch = x[i * batch_size: (i + 1) * batch_size]
            pad = batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)], 0)
            out = self._jit_apply(self.variables, jnp.asarray(batch))
            out = jax.tree.map(np.asarray, out)
            if pad:
                out = jax.tree.map(lambda o: o[: batch_size - pad], out)
            outs.append(out)
        return jax.tree.map(lambda *xs: np.concatenate(xs, 0), *outs)

    def count_params(self) -> int:
        return sum(int(p.size) for p in jax.tree.leaves(self.params))

    def summary(self, depth: int = 2, print_fn: Optional[Callable] = None
                ) -> str:
        """Keras-style parameter summary from the variables tree.

        Groups the params pytree to ``depth`` path levels and prints one row
        per group with its parameter count and leaf shapes; non-``params``
        collections (e.g. ``batch_stats``) are footnoted. Returns the
        rendered string; route it elsewhere (or silence it) via
        ``print_fn``."""
        from chambers_tpu.utils.pytree import param_paths

        groups: dict = {}
        for path, leaf in zip(param_paths(self.params),
                              jax.tree.leaves(self.params)):
            head = "/".join(path.split("/")[:depth]) or "(root)"
            count, shapes = groups.get(head, (0, []))
            groups[head] = (count + int(leaf.size),
                            shapes + [tuple(leaf.shape)])
        name_w = max([len(g) for g in groups] + [10]) + 2
        lines = [f'Model: "{self.name}"', "=" * (name_w + 30),
                 f"{'Path (grouped)':<{name_w}}{'Param #':>12}  Shapes",
                 "-" * (name_w + 30)]
        for head, (count, shapes) in groups.items():
            shown = ", ".join(
                "x".join(map(str, s)) if s else "()" for s in shapes[:4])
            if len(shapes) > 4:
                shown += f", ... (+{len(shapes) - 4})"
            lines.append(f"{head:<{name_w}}{count:>12,}  {shown}")
        lines.append("=" * (name_w + 30))
        total = self.count_params()
        lines.append(f"Total params: {total:,} "
                     f"({4 * total / 2**20:.1f} MB at f32)")
        for coll, tree in self.variables.items():
            if coll == "params":
                continue
            n = sum(int(p.size) for p in jax.tree.leaves(tree))
            lines.append(f"Non-trainable '{coll}': {n:,}")
        out = "\n".join(lines)
        (print_fn or print)(out)
        return out

    # -- Keras training facade ----------------------------------------------
    def compile(self, optimizer, loss, metrics=None, weighted_metrics=None,
                **trainer_kwargs) -> "Model":
        """``tf.keras.Model.compile``: wire a :class:`~chambers_tpu.training.Trainer`
        behind the Keras front door, so a reference user's training script
        (``model.compile(...)``; ``model.fit(...)``; ``model.evaluate(...)``)
        runs unchanged against a built backbone.

        ``optimizer``/``loss`` take objects (any optax transform /
        ``losses.Loss`` or callable) or the common Keras strings
        (``"adam"``, ``"adamw"``, ``"sgd"``, ``"sgdw"``;
        ``"categorical_crossentropy"``, ``"sparse_categorical_crossentropy"``,
        ``"mse"``). ``metrics``/``weighted_metrics`` take the Keras list
        form (named ``StreamingMetric`` instances or callables) or the
        Trainer's ``{name: metric}`` dict form. Every other keyword —
        ``steps_per_execution``, ``mesh``, ``ema_decay``, ``trainable``,
        ``gradient_accumulation_steps``, ... — passes through to the
        Trainer. Returns ``self`` (call chaining)."""
        from chambers_tpu.training import Trainer

        def resolve_optimizer(opt):
            if not isinstance(opt, str):
                return opt
            import optax

            from chambers_tpu.optimizers import AdamW, SGDW

            table = {
                "adam": lambda: optax.adam(1e-3),
                "adamw": lambda: AdamW(weight_decay=1e-4,
                                       learning_rate=1e-3),
                "sgd": lambda: optax.sgd(1e-2),
                "sgdw": lambda: SGDW(weight_decay=1e-4, learning_rate=1e-2),
                "rmsprop": lambda: optax.rmsprop(1e-3),
            }
            if opt.lower() not in table:
                raise ValueError(
                    f"unknown optimizer string {opt!r}: use one of "
                    f"{sorted(table)} or pass an optax transform")
            return table[opt.lower()]()

        def resolve_loss(fn):
            if not isinstance(fn, str):
                return fn
            from chambers_tpu import losses

            table = {
                "categorical_crossentropy":
                    losses.CategoricalCrossentropy,
                "sparse_categorical_crossentropy":
                    losses.SparseCategoricalCrossentropy,
                "mse": losses.MeanSquaredError,
                "mean_squared_error": losses.MeanSquaredError,
            }
            if fn.lower() not in table:
                raise ValueError(
                    f"unknown loss string {fn!r}: use one of "
                    f"{sorted(table)} or pass a losses.Loss/callable")
            return table[fn.lower()]()

        def as_dict(ms, kind):
            if ms is None or isinstance(ms, dict):
                return ms
            out = {}
            for m in ms:
                name = (getattr(m, "name", None)
                        or getattr(m, "__name__", None))
                if not name:
                    raise ValueError(
                        f"{kind} entry {m!r} has no name — use the "
                        "{name: metric} dict form")
                if name in out:
                    raise ValueError(f"duplicate {kind} name {name!r}")
                out[name] = m
            return out

        self._trainer = Trainer(
            self, loss=resolve_loss(loss),
            optimizer=resolve_optimizer(optimizer),
            metrics=as_dict(metrics, "metrics"),
            weighted_metrics=as_dict(weighted_metrics, "weighted_metrics"),
            **trainer_kwargs,
        )
        return self

    @property
    def trainer(self):
        """The :meth:`compile`-built Trainer (raises before compile)."""
        t = getattr(self, "_trainer", None)
        if t is None:
            raise ValueError("model is not compiled — call "
                             "model.compile(optimizer, loss, ...) first")
        return t

    def fit(self, dataset, **kwargs):
        """``tf.keras.Model.fit`` over ``(x, y[, sample_weight])`` batch
        iterables — delegates to :meth:`Trainer.fit` (same signature:
        ``epochs``, ``steps_per_epoch``, ``validation_data``, ``callbacks``,
        ``class_weight``, ...) and copies the trained variables back into
        this model (Keras semantics: the model owns its weights)."""
        try:
            return self.trainer.fit(dataset, **kwargs)
        finally:
            self.trainer.sync_model()
            self._jit_apply = None

    def evaluate(self, dataset, **kwargs):
        """``tf.keras.Model.evaluate`` — delegates to
        :meth:`Trainer.evaluate`, returning its logs dict."""
        return self.trainer.evaluate(dataset, **kwargs)

    # -- persistence --------------------------------------------------------
    def save_weights(self, path: str):
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.variables))

    def load_weights(self, path: str):
        with open(path, "rb") as f:
            self.variables = serialization.from_bytes(self.variables, f.read())
        self._jit_apply = None
        return self

    def export(self, directory: str):
        """Full-model export: variables plus a JSON config snapshot
        (the reference's SavedModel-at-train-end equivalent,
        callbacks.py:103)."""
        import dataclasses
        import json
        import os

        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "model.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self.variables))
        config = {"name": self.name, "module": type(self.module).__name__}
        if dataclasses.is_dataclass(self.module):
            for field in dataclasses.fields(self.module):
                value = getattr(self.module, field.name, None)
                if isinstance(value, (int, float, str, bool, type(None), tuple, list)):
                    config[field.name] = (
                        list(value) if isinstance(value, tuple) else value
                    )
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)

    def replace_variables(self, variables) -> "Model":
        self.variables = variables
        self._jit_apply = None
        return self
