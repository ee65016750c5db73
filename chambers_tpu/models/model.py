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


class _ArrayBatcher:
    """Re-iterable batch stream over in-memory arrays (Keras array-form
    ``fit(x, y, batch_size=...)``).

    Each ``__iter__`` yields ``(x, y[, sample_weight])`` batch tuples; with
    ``shuffle=True`` every fresh iteration draws a new permutation (Keras
    reshuffles between epochs), seeded so runs are reproducible. The tail
    batch is partial, as in Keras.
    """

    def __init__(self, arrays, batch_size: int, shuffle: bool = False,
                 seed: int = 0):
        self.arrays = [np.asarray(a) for a in arrays]
        sizes = {a.shape[0] for a in self.arrays}
        if len(sizes) != 1:
            raise ValueError(
                f"x/y/sample_weight cardinalities differ: {sorted(sizes)}")
        self.n = sizes.pop()
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = int(seed)
        self._epoch = 0

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            self._epoch += 1
            rng.shuffle(idx)
        for i in range(0, self.n, self.batch_size):
            sel = idx[i: i + self.batch_size]
            yield tuple(a[sel] for a in self.arrays)

    def __len__(self):
        return math.ceil(self.n / self.batch_size)


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

    def predict(self, x, batch_size: int = 32, mesh=None):
        """Batched jitted inference over a host array (pads the tail batch).

        ``mesh``: shard each batch's leading axis over the mesh's ``data``
        axis (data-parallel inference). Defaults to the mesh the model was
        :meth:`compile`-d with, if any — a DP-trained model predicts DP
        without extra plumbing."""
        if mesh is None:
            trainer = getattr(self, "_trainer", None)
            mesh = getattr(trainer, "mesh", None)
        place = None
        if mesh is not None:
            from chambers_tpu.parallel import shard_batch

            place = lambda b: shard_batch(b, mesh)
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
            placed = place(jnp.asarray(batch)) if place else jnp.asarray(batch)
            out = self._jit_apply(self.variables, placed)
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
                "binary_crossentropy": losses.BinaryCrossentropy,
                "bce": losses.BinaryCrossentropy,
                "mse": losses.MeanSquaredError,
                "mean_squared_error": losses.MeanSquaredError,
            }
            if fn.lower() not in table:
                raise ValueError(
                    f"unknown loss string {fn!r}: use one of "
                    f"{sorted(table)} or pass a losses.Loss/callable")
            return table[fn.lower()]()

        loss_obj = resolve_loss(loss)

        def resolve_metric(m):
            """Keras string-metric resolution (``metrics=["accuracy"]``).

            ``"accuracy"``/``"acc"`` infer the flavor from the compiled
            loss exactly as ``tf.keras.Model.compile`` does (sparse CE →
            sparse accuracy, CE → categorical, BCE → binary) and report
            under the user's string (Keras logs say ``accuracy``, not the
            resolved class name)."""
            if not isinstance(m, str):
                return m
            from chambers_tpu import losses, metrics as M

            key = m.lower()
            if key in ("accuracy", "acc"):
                if isinstance(loss_obj, losses.SparseCategoricalCrossentropy):
                    return M.SparseCategoricalAccuracy(name=m)
                if isinstance(loss_obj, losses.BinaryCrossentropy):
                    return M.BinaryAccuracy(name=m)
                if isinstance(loss_obj, losses.CategoricalCrossentropy):
                    return M.CategoricalAccuracy(name=m)
                raise ValueError(
                    f"cannot infer {m!r} flavor from loss "
                    f"{type(loss_obj).__name__} — use an explicit string "
                    "('sparse_categorical_accuracy', 'categorical_accuracy',"
                    " 'binary_accuracy') or a metric instance")
            table = {
                "categorical_accuracy": M.CategoricalAccuracy,
                "sparse_categorical_accuracy": M.SparseCategoricalAccuracy,
                "binary_accuracy": M.BinaryAccuracy,
                "top_k_categorical_accuracy": M.TopKCategoricalAccuracy,
                "sparse_top_k_categorical_accuracy":
                    M.SparseTopKCategoricalAccuracy,
                "auc": M.AUC,
                "precision": M.Precision,
                "recall": M.Recall,
                "f1": M.F1,
                "dsc": M.SoftDiceCoefficient,
            }
            if key not in table:
                raise ValueError(
                    f"unknown metric string {m!r}: use one of "
                    f"{sorted(table) + ['accuracy']} or pass a metric "
                    "instance")
            return table[key]()

        def as_dict(ms, kind):
            if ms is None or isinstance(ms, dict):
                return ms
            out = {}
            for m in ms:
                m = resolve_metric(m)
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
            self, loss=loss_obj,
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

    def fit(self, x, y=None, batch_size: int = 32, shuffle: bool = True,
            validation_split: float = 0.0, sample_weight=None, seed: int = 0,
            **kwargs):
        """``tf.keras.Model.fit`` — both Keras input forms.

        Batch-iterable form (``y=None``): ``x`` is an iterable of
        ``(x, y[, sample_weight])`` NumPy batch tuples, passed through to
        :meth:`Trainer.fit` untouched (``batch_size``/``shuffle``/
        ``validation_split`` don't apply and are ignored).

        Array form (``y`` given, or ``x`` a single array): whole-dataset
        NumPy/JAX arrays are batched to ``batch_size`` with per-epoch
        reshuffling (``shuffle=True``, seeded) and an optional
        ``validation_split`` taken from the TAIL of the data before
        shuffling — all Keras semantics.

        Either way delegates to :meth:`Trainer.fit` (``epochs``,
        ``steps_per_epoch``, ``validation_data``, ``callbacks``,
        ``class_weight``, ...) and copies the trained variables back into
        this model (Keras semantics: the model owns its weights)."""
        dataset = x
        # Keras validation_data=(x_val, y_val[, w_val]) tuple-of-arrays form
        val = kwargs.get("validation_data")
        if (isinstance(val, (tuple, list)) and len(val) in (2, 3)
                and all(isinstance(a, (np.ndarray, jax.Array)) for a in val)):
            kwargs["validation_data"] = _ArrayBatcher(
                list(val), batch_size, shuffle=False)
        if y is not None or isinstance(x, (np.ndarray, jax.Array)):
            if y is None:
                raise ValueError(
                    "array-form fit(x) needs targets: fit(x, y, ...)")
            arrays = [x, y] + ([sample_weight] if sample_weight is not None
                               else [])
            if validation_split:
                if not 0.0 < validation_split < 1.0:
                    raise ValueError(
                        f"validation_split must be in (0, 1), got "
                        f"{validation_split}")
                n = np.asarray(x).shape[0]
                # Keras boundary: train on int(n·(1−split)) samples
                split = int(n * (1.0 - validation_split))
                if split == 0 or split == n:
                    raise ValueError(
                        f"validation_split={validation_split} leaves an "
                        f"empty train or validation set for {n} samples")
                val = [np.asarray(a)[split:] for a in arrays]
                arrays = [np.asarray(a)[:split] for a in arrays]
                kwargs.setdefault(
                    "validation_data",
                    _ArrayBatcher(val, batch_size, shuffle=False))
            dataset = _ArrayBatcher(arrays, batch_size, shuffle=shuffle,
                                    seed=seed)
        elif sample_weight is not None:
            raise ValueError(
                "sample_weight= only applies to array-form fit(x, y, ...); "
                "for a batch-iterable dataset yield (x, y, sample_weight) "
                "elements instead")
        try:
            return self.trainer.fit(dataset, **kwargs)
        finally:
            self.trainer.sync_model()
            self._jit_apply = None

    def evaluate(self, x, y=None, batch_size: int = 32, sample_weight=None,
                 return_dict: bool = False, **kwargs):
        """``tf.keras.Model.evaluate`` — batch-iterable form (``y=None``)
        or Keras array form (``y`` given; batched unshuffled) — delegates
        to :meth:`Trainer.evaluate`.

        Keras return contract: the scalar loss, or ``[loss, *metrics]``
        in compile order when metrics exist; ``return_dict=True`` returns
        the named logs dict instead (``Trainer.evaluate``'s native form)."""
        dataset = x
        if y is not None or isinstance(x, (np.ndarray, jax.Array)):
            if y is None:
                raise ValueError(
                    "array-form evaluate(x) needs targets: evaluate(x, y)")
            arrays = [x, y] + ([sample_weight] if sample_weight is not None
                               else [])
            dataset = _ArrayBatcher(arrays, batch_size, shuffle=False)
        elif sample_weight is not None:
            raise ValueError(
                "sample_weight= only applies to array-form evaluate(x, y); "
                "for a batch-iterable dataset yield (x, y, sample_weight) "
                "elements instead")
        logs = self.trainer.evaluate(dataset, **kwargs)
        if return_dict:
            return logs
        names = (list(self.trainer.metrics)
                 + list(self.trainer.weighted_metrics))
        values = [logs["loss"]] + [logs[n] for n in names if n in logs]
        return values[0] if len(values) == 1 else values

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
