"""Training loop.

The reference delegates its training loop to Keras ``model.compile/fit``
(SURVEY.md §1: "the TPU-native build must supply its own thin training/eval
loop layer"). :class:`Trainer` is that layer: a compiled-once
``(state, batch) -> (state, logs)`` step function driven by a host loop with
Keras-style callback hooks.

TPU notes:
- the whole step (forward + loss + backward + optimizer) is one jitted
  function; the train state is donated so parameters update in place in HBM;
- batches move host→device once per step; everything else stays resident;
- with a mesh (see ``chambers_tpu.parallel``) the same step function runs
  data-parallel: batches are sharded over the ``data`` axis and XLA inserts
  the gradient all-reduce.
"""

from __future__ import annotations

import itertools
import re
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct
from flax.traverse_util import flatten_dict, unflatten_dict

from chambers_tpu.callbacks import Callback, CallbackList


@struct.dataclass
class TrainState:
    params: Any
    extra_vars: Any  # non-param collections; mutable ones (batch_stats)
    # are updated by train_step, so they live in the donated state
    opt_state: Any
    rng: jax.Array
    step: jax.Array
    # exponential moving average of params (Trainer(ema_decay=...)); None
    # (an empty pytree node) when EMA is off, so the state structure — and
    # therefore existing checkpoints — are unchanged unless it is enabled
    ema_params: Any = None


class _PushbackIterator:
    """Iterator wrapper with one-batch pushback (window boundary cuts)."""

    def __init__(self, it):
        self._it = iter(it)
        self._stack = []

    def __iter__(self):
        return self

    def __next__(self):
        if self._stack:
            return self._stack.pop()
        return next(self._it)

    def push(self, item):
        self._stack.append(item)


class _DevicePrefetcher:
    """Async host→device double buffering over a batch iterator.

    ``jax.device_put`` only *enqueues* a transfer, so placing the next
    ``depth`` batches while the current step computes overlaps the copy with
    the math — without it every step pays the full host→device latency
    serially (on PCIe ~10s of ms per large batch; far worse over a relay).
    Keeps at most ``depth`` batches in HBM ahead of the consumer.
    """

    def __init__(self, it, place, depth: int = 2):
        from collections import deque

        self._it = it
        self._place = place
        self._queue = deque()
        self._depth = depth
        self._started = False  # lazy: don't consume the stream until the
        # first next() — constructing a prefetcher must not pull batches
        # from a shared iterator for a fit() that runs zero epochs

    def _fill(self, n):
        for _ in range(n):
            try:
                batch = next(self._it)
            except StopIteration:
                return
            self._queue.append(self._place(*batch))

    def __iter__(self):
        return self

    def __next__(self):
        if not self._started:
            self._started = True
            self._fill(self._depth)
        if not self._queue:
            raise StopIteration
        out = self._queue.popleft()
        self._fill(1)
        return out


class _CallbackModel:
    """The model facade handed to callbacks: save/export current state.

    Also exposes ``variables``/``apply_fn`` so serving export
    (``chambers_tpu.serving.export_serving_artifact``) works on the live
    train state, e.g. from ``ExperimentCallback(serving_input_shape=...)``.
    """

    def __init__(self, trainer: "Trainer"):
        self._trainer = trainer

    @property
    def stop_training(self):
        return self._trainer.stop_training

    @stop_training.setter
    def stop_training(self, value):
        self._trainer.stop_training = bool(value)

    def get_weights(self):
        """Snapshot of the learnable state (params + mutable collections).

        Copies the buffers: the Trainer's jitted step DONATES its state, so
        merely holding the old pytree would leave the snapshot pointing at
        deleted device memory one step later."""
        state = self._trainer.state
        copy = lambda x: x.copy() if hasattr(x, "copy") else x
        return jax.tree.map(
            copy, {"params": state.params, "extra_vars": state.extra_vars})

    def set_weights(self, weights):
        """Restore a :meth:`get_weights` snapshot (EarlyStopping's
        restore_best_weights); optimizer state and step are untouched."""
        self._trainer.state = self._trainer.state.replace(
            params=weights["params"], extra_vars=weights["extra_vars"])
        self._trainer.sync_model()

    @property
    def variables(self):
        return self._trainer.variables

    def apply_fn(self, variables, x, deterministic=True, rngs=None):
        return self._trainer._apply_fn(variables, x, deterministic, rngs)

    # -- learning-rate control (ReduceLROnPlateau / LearningRateScheduler) --
    def get_lr_scale(self):
        return self._trainer.get_lr_scale()

    def set_lr_scale(self, value):
        self._trainer.set_lr_scale(value)

    @property
    def base_learning_rate(self):
        """The optimizer's configured scalar rate, or None (schedule /
        unconfigured optimizer) — the anchor the lr callbacks scale from."""
        get_config = getattr(self._trainer.optimizer, "get_config", None)
        if get_config is None:
            return None
        try:
            rate = get_config().get("learning_rate")
        except Exception:
            return None
        return float(rate) if isinstance(rate, (int, float)) else None

    def save_weights(self, path):
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self._trainer.variables))

    def export(self, directory):
        import os

        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "model.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self._trainer.variables))
        with open(os.path.join(directory, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(self._trainer.state.opt_state))


class Trainer:
    """Compiles and drives train/eval steps for a (module, variables) model.

    :param model: a :class:`chambers_tpu.models.Model` (or any object with
        ``module`` and ``variables`` attributes).
    :param loss: callable ``loss(y_true, y_pred) -> scalar``.
    :param optimizer: an optax ``GradientTransformation``.
    :param metrics: mapping ``name -> metric`` where metric is either a
        per-batch callable ``fn(y_true, y_pred) -> scalar`` (averaged over
        the epoch) or a :class:`chambers_tpu.metrics.StreamingMetric`
        (accumulated exactly, on device, inside the jitted step — no
        per-batch host sync). Metrics are computed during *training* (from
        the same forward pass as the loss, Keras semantics) and during
        evaluation.
    :param apply_fn: optional override ``apply_fn(variables, x, deterministic,
        rngs)``; defaults to the module's ``__call__``.
    """

    def __init__(self, model, loss, optimizer, metrics: Optional[Dict[str, Callable]] = None,
                 seed: int = 0, apply_fn: Optional[Callable] = None,
                 donate: bool = True, mesh=None, param_sharding_rules=None,
                 gradient_accumulation_steps: int = 1,
                 ema_decay: Optional[float] = None,
                 trainable: Optional[Union[str, Sequence[str], Callable]] = None,
                 steps_per_execution: int = 1,
                 weighted_metrics: Optional[Dict[str, Callable]] = None):
        """``mesh``: optional ``jax.sharding.Mesh`` — the train/eval steps run
        data-parallel over its ``data`` axis (batches are sharded per step,
        params replicated or sharded by ``param_sharding_rules``, and XLA
        inserts the gradient all-reduce).

        ``gradient_accumulation_steps``: with ``N > 1`` each ``fit`` batch is
        a microbatch — gradients average over ``N`` consecutive batches and
        the optimizer applies once per ``N`` (an effective batch of
        ``N×batch_size`` in params-sized extra memory; the Keras harness the
        reference trained under has no equivalent). Implemented with
        ``optax.MultiSteps``, so schedules see the *optimizer* step count.
        The accumulator does not flush at epoch or ``fit`` boundaries: keep
        the number of batches per epoch divisible by ``N``, or up to
        ``N−1`` trailing microbatches carry over into the next optimizer
        step (or are discarded when training ends). BatchNorm running stats
        update every microbatch, so they follow microbatch moments — close
        to, but not identical with, the stats a true ``N×batch_size`` batch
        would write (the EMA weights microbatches unequally and
        between-microbatch mean spread is lost from the variance).

        ``trainable``: optional parameter-freezing filter — the Keras
        ``layer.trainable = False`` fine-tuning workflow (freeze a pretrained
        backbone, train the head; or train only LoRA adapters). A regex
        string, a sequence of regexes (a param trains if ANY pattern
        ``re.search``-matches its ``/``-joined path — the same convention as
        the optimizer ``decay_include``/``decay_exclude`` masks), or a
        callable ``path -> bool``. Frozen params are excluded from the loss
        differentiation itself (not just masked out of the update), so the
        backward pass skips their weight-gradient matmuls and the optimizer
        keeps moments only for the trainable subtree — Adam state for a
        frozen ViT backbone costs nothing.

        ``steps_per_execution``: run ``N`` train (and eval) steps per host
        round trip — ``tf.keras.Model.compile(steps_per_execution=N)``, the
        execution batching behind the reference's ``model.fit``. Batches
        stream to the device individually (async puts), are stacked into a
        ``[N, batch, ...]`` window inside the compiled program (an HBM
        concatenate — no host-side ``np.stack``), and run as a single jitted
        ``lax.scan`` of the train step, so per-step host↔device latency
        (large on a relay-attached chip) amortizes across the window. Numerics are IDENTICAL to
        ``N=1`` — the scan body IS the single-step function (EMA,
        accumulation, freezing, DP mesh included) and epoch logs average the
        same per-step values. Differences a Keras user will recognize:
        batch callbacks fire once per window (``on_train_batch_begin(first)``
        / ``on_train_batch_end(last, last_step_logs)``), and
        ``stop_training`` is honored at window boundaries. Keep
        ``steps_per_epoch`` divisible by ``N`` to avoid one extra compile
        for the trailing partial window."""
        self.model = model
        self.loss = loss
        if gradient_accumulation_steps < 1:
            raise ValueError(
                "gradient_accumulation_steps must be >= 1, got "
                f"{gradient_accumulation_steps}"
            )
        if steps_per_execution < 1:
            raise ValueError(
                f"steps_per_execution must be >= 1, got {steps_per_execution}"
            )
        self._spe = int(steps_per_execution)
        if gradient_accumulation_steps > 1:
            optimizer = optax.MultiSteps(
                optimizer, every_k_schedule=gradient_accumulation_steps
            )
        self.optimizer = optimizer
        self._ema_every = gradient_accumulation_steps
        if ema_decay is not None and not 0.0 <= ema_decay < 1.0:
            raise ValueError(f"ema_decay={ema_decay} must be in [0, 1)")
        # DeiT-style parameter EMA: shadow params update inside the jitted
        # step (ema = d*ema + (1-d)*params, zero host traffic); evaluate or
        # export them via `ema_variables`
        self.ema_decay = ema_decay
        self.metrics = dict(metrics or {})
        # Keras compile(weighted_metrics=): metrics that receive the batch
        # sample weights (from (x, y, w) dataset elements or class_weight=).
        # Plain `metrics` stay unweighted, exactly as in Keras.
        self.weighted_metrics = dict(weighted_metrics or {})
        overlap = set(self.metrics) & set(self.weighted_metrics)
        if overlap:
            raise ValueError(
                f"metric names {sorted(overlap)} appear in both metrics= and "
                "weighted_metrics= — log keys must be unique"
            )
        # does the loss speak the Keras Loss call contract? (a chambers_tpu
        # losses.Loss subclass, or any callable with a sample_weight kwarg)
        import inspect as _inspect

        try:
            _params = _inspect.signature(loss).parameters
            self._loss_takes_sw = (
                "sample_weight" in _params
                or any(p.kind is _inspect.Parameter.VAR_KEYWORD
                       for p in _params.values())
            )
        except (TypeError, ValueError):  # builtins / odd callables
            self._loss_takes_sw = False
        self.mesh = mesh
        # Keras semantics: a callback may set this (directly or through its
        # model facade) to end training at the next batch boundary —
        # EarlyStopping-style control and the hook PreemptionCheckpoint uses
        self.stop_training = False
        # split metrics: streaming (functional init/update/compute, live in
        # the jitted step) vs per-batch callables (averaged over the epoch)
        def _split_streaming(mapping):
            streaming = {
                name: m for name, m in mapping.items()
                if hasattr(m, "init") and hasattr(m, "update")
                and hasattr(m, "compute")
            }
            fns = {name: m for name, m in mapping.items()
                   if name not in streaming}
            return streaming, fns

        self._streaming, self._metric_fns = _split_streaming(self.metrics)
        # weighted metrics: streaming ones get sample_weight= in update();
        # per-batch callables are called fn(y_true, y_pred, sample_weight)
        self._streaming_w, self._weighted_metric_fns = _split_streaming(
            self.weighted_metrics)

        if "quant" in model.variables:
            raise ValueError(
                "model variables carry a 'quant' collection (int8 serving "
                "weights, chambers_tpu.quantization). Quantized variables "
                "are inference-only — jnp.round has zero gradient, so "
                "training through them would silently learn nothing. Train "
                "the float model, then quantize_variables() for serving."
            )
        params = model.variables["params"]
        extra_vars = {
            k: dict(v) if hasattr(v, "items") else v
            for k, v in model.variables.items() if k != "params"
        }
        if donate:
            # the train step donates its state buffers; keep the caller's
            # model.variables alive by training on a copy
            params = jax.tree.map(jnp.array, params)
            extra_vars = jax.tree.map(jnp.array, extra_vars)
        # collections the train step applies mutably and threads through the
        # state — BatchNorm running stats. The reference trains BN backbones
        # through Keras fit, which updates moving_mean/variance implicitly
        # (e.g. senet.py's compiled models); here the updated collection comes
        # back explicitly from module.apply(mutable=...) each step.
        self._mutable = (["batch_stats"] if "batch_stats" in extra_vars
                         else [])

        # parameter freezing: resolve `trainable` to the frozenset of
        # flattened key tuples that train. None = everything trains (the
        # split/merge helpers degrade to identity).
        self._train_keys = None
        if trainable is not None:
            if callable(trainable):
                predicate = trainable
            else:
                patterns = ([trainable] if isinstance(trainable, str)
                            else list(trainable))
                predicate = lambda path: any(
                    re.search(p, path) for p in patterns)
            flat = flatten_dict(params)
            keys = frozenset(
                k for k in flat if predicate("/".join(map(str, k))))
            if not keys:
                sample = ["/".join(map(str, k)) for k in list(flat)[:5]]
                raise ValueError(
                    f"trainable={trainable!r} matches no parameters. "
                    f"Example param paths: {sample}"
                )
            self._train_keys = keys
            # normalize the container type (FrozenDict -> plain dict) so the
            # split/merge round-trip inside train_step returns the same
            # pytree structure it was given — otherwise step 2 recompiles
            params = unflatten_dict(flat)

        if mesh is not None:
            from chambers_tpu.parallel.sharding import (
                make_param_shardings, replicate,
            )

            if param_sharding_rules:
                shardings = make_param_shardings(params, mesh,
                                                 param_sharding_rules)
                params = jax.tree.map(jax.device_put, params, shardings)
            else:
                params = replicate(params, mesh)
            # batch stats are per-channel vectors — replicate them; under a
            # sharded global batch the written stats are the global-batch
            # moments (the mean/var reductions span the full data axis, XLA
            # inserts the collectives)
            extra_vars = replicate(extra_vars, mesh)
            # init AFTER placement: optimizer state (mu/nu etc. via
            # zeros_like) inherits the params' shardings instead of being
            # fully replicated on every device
            opt_state = optimizer.init(self._split_params(params)[0])
            # scalar leaves (step counts) come out of init uncommitted on
            # the default device; pin them to the mesh (replicated) so a
            # checkpoint restore — which reinstates CONCRETE shardings —
            # doesn't hand the next train step a single-device leaf next
            # to mesh-placed params (incompatible-devices error)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            opt_state = jax.tree.map(
                lambda x: x if getattr(x, "sharding", None) is not None
                and x.sharding.num_devices > 1
                else jax.device_put(x, rep),
                opt_state,
            )
            self.state = TrainState(
                params=params,
                extra_vars=extra_vars,
                opt_state=opt_state,
                rng=replicate(jax.random.PRNGKey(seed), mesh),
                step=replicate(jnp.zeros([], jnp.int32), mesh),
            )
        else:
            self.state = TrainState(
                params=params,
                extra_vars=extra_vars,
                opt_state=optimizer.init(self._split_params(params)[0]),
                rng=jax.random.PRNGKey(seed),
                step=jnp.zeros([], jnp.int32),
            )
        if ema_decay is not None:
            # shadow starts at a COPY of the initial params (same values,
            # same mesh placement, distinct buffers — the donated step may
            # not receive one buffer in two arguments)
            self.state = self.state.replace(
                ema_params=jax.tree.map(lambda x: x.copy(),
                                        self.state.params))

        module = model.module
        if apply_fn is None:
            # a model carrying an apply override (e.g. lora.apply_to_model)
            # trains through it too — otherwise the step would silently run
            # the raw module and ignore the transform
            apply_fn = getattr(model, "_apply_override", None)
        if apply_fn is None:
            def apply_fn(variables, x, deterministic, rngs, mutable=False):
                return module.apply(
                    variables, x, deterministic=deterministic, rngs=rngs,
                    mutable=mutable,
                )
        import inspect

        self._apply_fn = apply_fn
        # a custom apply_fn opts into batch-stats updates by accepting a
        # `mutable` kwarg (mirroring module.apply). Without it, the train
        # step applies immutably — fine for stats-free models, but a
        # BatchNorm model whose custom apply_fn trains with
        # use_running_average=False will raise flax's
        # ModifyScopeVariableError (accept `mutable` or pin the running
        # averages in the custom fn)
        self._apply_accepts_mutable = (
            "mutable" in inspect.signature(apply_fn).parameters
        )
        if not self._apply_accepts_mutable:
            # a custom apply_fn without `mutable` cannot return updated
            # batch_stats (BN training raises at step time) NOR sown
            # intermediates — a routed (MoE) model would train WITHOUT its
            # load-balancing aux loss and experts can silently collapse.
            # Both conditions are visible from the variables; warn up front.
            has_router = any(
                getattr(p, "key", None) == "w_router"
                for path, _ in jax.tree_util.tree_leaves_with_path(
                    model.variables.get("params", {}))
                for p in path
            )
            if self._mutable or has_router:
                import warnings

                warnings.warn(
                    "custom apply_fn does not accept a `mutable` kwarg: "
                    + ("BatchNorm running stats cannot update; "
                       if self._mutable else "")
                    + ("MoE load-balancing aux losses will NOT be added to "
                       "the training loss; " if has_router else "")
                    + "add `mutable=False` to its signature and forward it "
                    "to module.apply",
                    stacklevel=2,
                )

        def _metric_logs(y, y_pred, metric_states, sw=None):
            logs = {name: fn(y, y_pred) for name, fn in self._metric_fns.items()}
            if self._weighted_metric_fns and sw is None:
                # Keras weighted_metrics degrade to unweighted (weights of
                # ones) when the dataset carries no weights — callables must
                # never see None
                batch = jax.tree.leaves(y_pred)[0].shape[0]
                sw_fns = jnp.ones((batch,), jnp.float32)
            else:
                sw_fns = sw
            logs.update({
                name: fn(y, y_pred, sw_fns)
                for name, fn in self._weighted_metric_fns.items()
            })
            new_states = {
                name: m.update(metric_states[name], y, y_pred)
                for name, m in self._streaming.items()
            }
            new_states.update({
                name: m.update(metric_states[name], y, y_pred,
                               sample_weight=sw)
                for name, m in self._streaming_w.items()
            })
            return logs, new_states

        # "intermediates" is always requested alongside the stateful
        # collections: modules that sow auxiliary objectives (the MoE
        # router's load-balancing loss) get them added to the training
        # loss; models that sow nothing return an empty dict at zero cost.
        # Sown values are per-step ephemera — consumed here, never stored
        # in TrainState.
        mutable_in_train = (
            self._mutable + ["intermediates"]
            if self._apply_accepts_mutable else []
        )

        def train_step(state: TrainState, metric_states, x, y, sw=None):
            rng, dropout_rng = jax.random.split(state.rng)
            # trainable=: differentiate w.r.t. the trainable subtree only;
            # frozen leaves ride through as closed-over constants (XLA
            # aliases them input->output, so they cost nothing)
            train_params, frozen = self._split_params(state.params)

            def loss_fn(train_params):
                params = self._merge_params(train_params, frozen)
                variables = {"params": params, **state.extra_vars}
                if mutable_in_train:
                    y_pred, mutated = self._apply_fn(
                        variables, x, deterministic=False,
                        rngs={"dropout": dropout_rng},
                        mutable=mutable_in_train,
                    )
                    mutated = dict(mutated)
                    intermediates = mutated.pop("intermediates", {})
                    extra_vars = {**state.extra_vars, **mutated}
                else:
                    y_pred = self._apply_fn(
                        variables, x, deterministic=False,
                        rngs={"dropout": dropout_rng},
                    )
                    intermediates = {}
                    extra_vars = state.extra_vars
                # sw is None or not at TRACE time (fit keeps it consistent
                # across a run), so this is a compile-time branch
                loss_value = (self.loss(y, y_pred) if sw is None
                              else self.loss(y, y_pred, sample_weight=sw))
                # static check (dict structure is fixed at trace time):
                # does anything sow a routed-MoE aux loss?
                aux = None
                if intermediates and any(
                    getattr(p, "key", None) == "moe_aux_loss"
                    for path, _ in jax.tree_util.tree_leaves_with_path(
                        intermediates)
                    for p in path
                ):
                    from chambers_tpu.layers.moe import moe_aux_loss

                    aux = moe_aux_loss(intermediates)
                    loss_value = loss_value + aux
                return loss_value, (y_pred, extra_vars, aux)

            (loss_value, (y_pred, extra_vars, aux)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(train_params)
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, train_params
            )
            params = self._merge_params(
                optax.apply_updates(train_params, updates), frozen
            )
            ema_params = state.ema_params
            if self.ema_decay is not None:
                d = self.ema_decay
                if self._ema_every > 1:
                    # under gradient accumulation only every k-th micro-step
                    # applies an optimizer update; decaying the shadow on the
                    # no-op micro-steps too would change the effective decay
                    # to d**k (params are unchanged there, so gating on the
                    # micro-step count keeps EMA-per-UPDATE semantics)
                    is_update = (state.step + 1) % self._ema_every == 0
                    ema_params = jax.tree.map(
                        lambda e, p: jnp.where(
                            is_update, d * e + (1.0 - d) * p, e),
                        state.ema_params, params)
                else:
                    ema_params = jax.tree.map(
                        lambda e, p: d * e + (1.0 - d) * p,
                        state.ema_params, params)
            new_state = TrainState(
                params=params, extra_vars=extra_vars, opt_state=opt_state,
                rng=rng, step=state.step + 1, ema_params=ema_params,
            )
            # train-time metrics reuse the forward pass already paid for the
            # loss (Keras semantics); streaming states accumulate on device
            logs, metric_states = _metric_logs(y, y_pred, metric_states, sw)
            logs["loss"] = loss_value
            if aux is not None:
                # routing-health observability: the balance (+z) term the
                # step just added to the objective, logged on its own
                logs["moe_aux_loss"] = aux
            return new_state, metric_states, logs

        def eval_step(params, extra_vars, metric_states, x, y, sw=None):
            variables = {"params": params, **extra_vars}
            y_pred = self._apply_fn(variables, x, deterministic=True, rngs=None)
            logs, metric_states = _metric_logs(y, y_pred, metric_states, sw)
            logs["loss"] = (self.loss(y, y_pred) if sw is None
                            else self.loss(y, y_pred, sample_weight=sw))
            return metric_states, logs

        donate_args = (0, 1) if donate else (1,)
        self.train_step = jax.jit(train_step, donate_argnums=donate_args)
        self.eval_step = jax.jit(eval_step, donate_argnums=(2,))

        # steps_per_execution: the window functions scan the SAME step
        # bodies over a [n, batch, ...] stack — one compiled program, one
        # host dispatch, n steps. Logs come back stacked [n] per key so
        # epoch aggregation sees exactly the per-step values N=1 would.
        def _stack_batches(batches):
            # the [n, batch, ...] window stack happens INSIDE the compiled
            # program: batches arrive as n separate device arrays (each an
            # async host→device put) and XLA concatenates them in HBM.
            # Stacking on the host instead (np.stack of a multi-hundred-MB
            # window) costs more than the window's compute on a slow host
            # core, and it serializes on the ingest path.
            return jax.tree.map(lambda *leaves: jnp.stack(leaves), *batches)

        def train_window(state: TrainState, metric_states, batches):
            def body(carry, xyw):
                state, metric_states = carry
                state, metric_states, logs = train_step(
                    state, metric_states, *xyw)
                return (state, metric_states), logs

            # a batch's sw=None scans through as structure (steps see None)
            (state, metric_states), logs = jax.lax.scan(
                body, (state, metric_states), _stack_batches(batches))
            return state, metric_states, logs

        def eval_window(params, extra_vars, metric_states, batches):
            def body(metric_states, xyw):
                return eval_step(params, extra_vars, metric_states, *xyw)

            metric_states, logs = jax.lax.scan(body, metric_states,
                                               _stack_batches(batches))
            return metric_states, logs

        # (batch buffers are not donated: XLA cannot alias n [batch, ...]
        # inputs into one [n, batch, ...] concatenate output, so donating
        # them only triggers unusable-donation warnings)
        self.train_window = jax.jit(train_window, donate_argnums=donate_args)
        self.eval_window = jax.jit(eval_window, donate_argnums=(2,))

    # -- parameter freezing ---------------------------------------------------
    def _split_params(self, params):
        """Partition the full params tree into ``(trainable, frozen)``.

        ``trainable`` is a nested subtree (key paths preserved, so optimizer
        regex masks like ``decay_exclude`` still see full paths); ``frozen``
        is a flat ``{key_tuple: leaf}`` dict. Identity — ``(params, None)`` —
        when no ``trainable=`` filter is set.
        """
        if self._train_keys is None:
            return params, None
        flat = flatten_dict(params)
        train = unflatten_dict(
            {k: v for k, v in flat.items() if k in self._train_keys})
        frozen = {k: v for k, v in flat.items()
                  if k not in self._train_keys}
        return train, frozen

    def _merge_params(self, train, frozen):
        """Inverse of :meth:`_split_params`."""
        if frozen is None:
            return train
        merged = dict(frozen)
        merged.update(flatten_dict(train))
        return unflatten_dict(merged)

    def _place_batch(self, x, y, sw=None):
        # x/y may be pytrees (e.g. a (labels, teacher_logits) target for
        # DistillationLoss) — convert leaf-wise, not with one jnp.asarray.
        # sw (per-sample weights, or None) rides along: None is pytree
        # structure, so both tree.map and the mesh placement pass it through.
        if self.mesh is None:
            return (jax.tree.map(jnp.asarray, x), jax.tree.map(jnp.asarray, y),
                    jax.tree.map(jnp.asarray, sw))
        from chambers_tpu.parallel.distributed import host_local_batch_to_global

        return host_local_batch_to_global((x, y, sw), self.mesh)

    # -- sample weights / class weights ---------------------------------------
    def _normalized_stream(self, it, class_weight=None):
        """Normalize dataset elements to ``(x, y, sample_weight_or_None)``.

        Keras ``fit`` contract: elements are ``(x, y)`` or ``(x, y, w)``;
        ``class_weight={class_index: weight}`` converts per-label weights to
        per-sample weights host-side (exactly what the Keras data adapter
        does) and MULTIPLIES with an element weight when both are present.
        Classes absent from the dict weight 1.0; labels outside the dict's
        index range raise. ``[b, 1]`` integer-label columns squeeze (the
        Keras squeeze-or-expand rule — argmax over a size-1 axis would map
        every label to class 0); wider rank-2 (one-hot/probabilistic)
        targets use argmax; rank>2 targets are rejected (Keras:
        class_weight supports rank<=2).
        """
        table = None
        if class_weight is not None:
            if not class_weight or min(class_weight) < 0:
                raise ValueError(
                    f"class_weight={class_weight!r}: expected a non-empty "
                    "{non-negative class index: weight} mapping"
                )
            table = np.ones(max(class_weight) + 1, np.float32)
            for k, v in class_weight.items():
                table[int(k)] = float(v)
        for elem in it:
            if not isinstance(elem, (tuple, list)) or len(elem) not in (2, 3):
                raise ValueError(
                    "dataset elements must be (x, y) or (x, y, sample_weight) "
                    f"tuples, got a {type(elem).__name__} of length "
                    f"{len(elem) if isinstance(elem, (tuple, list)) else 'n/a'}"
                )
            x, y = elem[0], elem[1]
            sw = elem[2] if len(elem) == 3 else None
            if table is not None:
                yarr = np.asarray(y)
                if yarr.ndim > 2:
                    raise ValueError(
                        "class_weight= supports integer [b] or one-hot "
                        f"[b, classes] targets, got rank {yarr.ndim}"
                    )
                if yarr.ndim == 2 and yarr.shape[-1] == 1:
                    idx = yarr[:, 0]
                elif yarr.ndim == 2:
                    idx = yarr.argmax(-1)
                else:
                    idx = yarr
                idx = np.asarray(idx, np.int64)
                if idx.size and idx.max() >= table.size:
                    raise ValueError(
                        f"label {int(idx.max())} is outside class_weight's "
                        f"index range [0, {table.size - 1}]"
                    )
                cw = table[idx]
                sw = cw if sw is None else np.asarray(sw, np.float32) * cw
            if sw is not None and not self._loss_takes_sw:
                raise TypeError(
                    "the dataset carries sample weights (or class_weight= "
                    "was passed) but the loss does not accept a "
                    "sample_weight kwarg — use a chambers_tpu.losses.Loss "
                    "subclass (or any loss(y_true, y_pred, sample_weight=) "
                    "callable)"
                )
            yield x, y, sw

    # -- steps_per_execution windows ----------------------------------------
    @staticmethod
    def _collect_window(it, n):
        """Pull up to ``n`` same-shaped host batches; [] at stream end.

        A window is one ``lax.scan`` over a ``[n, batch, ...]`` stack, so
        every batch in it must have identical shapes. A partial tail batch
        (Keras array-form ``fit`` emits one whenever ``n % batch_size``)
        ends the window early and is pushed back — it runs as its own
        (shorter) window instead of crashing the stack. ``it`` must be a
        :class:`_PushbackIterator` (the windowed paths always wrap)."""
        batches = []
        shapes = None
        for _ in range(n):
            try:
                b = next(it)
            except StopIteration:
                break
            s = jax.tree.map(np.shape, b)
            if shapes is None:
                shapes = s
            elif s != shapes:
                # a sw-presence flip is a malformed dataset, not a tail
                # batch — keep the loud error (window cuts would silently
                # "handle" it)
                if (b[2] is None) != (batches[0][2] is None):
                    raise ValueError(
                        "a steps_per_execution window mixes weighted "
                        "(x, y, w) and unweighted (x, y) batches — the "
                        "dataset must be consistent")
                it.push(b)
                break
            batches.append(b)
        return batches

    def _place_window(self, batches):
        """Place a list of host ``(x, y, sw)`` batches for one window.

        Each batch is transferred individually (``jax.device_put`` only
        enqueues, so the n copies stream while the previous window
        computes); the ``[n, batch, ...]`` stack happens inside the compiled
        window program, where it is an HBM concatenate — a host-side
        ``np.stack`` of a multi-hundred-MB window would cost more than the
        window's compute. On a mesh every batch lands sharded over ``data``
        (via :meth:`_place_batch`, multi-process included), so the in-program
        stack yields a ``[n, batch, ...]`` window sharded on axis 1 with no
        resharding."""
        weighted = [b[2] is not None for b in batches]
        if any(weighted) and not all(weighted):
            raise ValueError(
                "a steps_per_execution window mixes weighted (x, y, w) and "
                "unweighted (x, y) batches — the dataset must be consistent"
            )
        return tuple(self._place_batch(*b) for b in batches)

    # -- state access -------------------------------------------------------
    @property
    def variables(self):
        return {"params": self.state.params, **self.state.extra_vars}

    @property
    def ema_variables(self):
        """Variables with the EMA shadow params (``Trainer(ema_decay=...)``)
        in place of the live ones — evaluate or export these for the
        smoothed model (DeiT-style)."""
        if self.state.ema_params is None:
            raise ValueError(
                "EMA is not enabled — construct the Trainer with "
                "ema_decay=<float in [0, 1)>")
        return {"params": self.state.ema_params, **self.state.extra_vars}

    def get_lr_scale(self) -> Optional[float]:
        """The mutable lr multiplier (``AdamW/SGDW(mutable_lr=True)``), or
        None when the optimizer carries none."""
        from chambers_tpu.optimizers import get_lr_scale

        return get_lr_scale(self.state.opt_state)

    def set_lr_scale(self, value: float):
        """Set the mutable lr multiplier in the live optimizer state — no
        retrace, no recompile (the mechanism behind ReduceLROnPlateau and
        LearningRateScheduler). Raises if the optimizer was not constructed
        with ``mutable_lr=True``."""
        from chambers_tpu.optimizers import set_lr_scale

        scalar = jnp.asarray(value, jnp.float32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            scalar = jax.device_put(
                scalar, NamedSharding(self.mesh, PartitionSpec()))
        self.state = self.state.replace(
            opt_state=set_lr_scale(self.state.opt_state, scalar))

    def sync_model(self):
        """Copy the trained params back into the wrapped model.

        A real copy (``jnp.array``): aliasing the live train-state buffers
        would let the next ``fit()`` donate — and delete — the arrays backing
        ``model.variables``.
        """
        self.model.replace_variables(jax.tree.map(jnp.array, self.variables))
        return self.model

    # -- loops --------------------------------------------------------------
    def _init_metric_states(self):
        # fresh buffer per leaf: the steps donate metric state, and a metric
        # init() that aliases one array across leaves would fail donation
        return {
            name: jax.tree.map(jnp.array, m.init())
            for name, m in {**self._streaming, **self._streaming_w}.items()
        }

    def fit(self, dataset: Iterable, epochs: int = 1,
            steps_per_epoch: Optional[int] = None,
            validation_data: Optional[Iterable] = None,
            validation_steps: Optional[int] = None,
            callbacks: Sequence[Callback] = (), verbose: bool = True,
            initial_epoch: int = 0, skip_batches: int = 0,
            class_weight: Optional[Dict[int, float]] = None):
        """Train over an iterable of ``(x, y)`` or ``(x, y, sample_weight)``
        NumPy batch tuples.

        ``class_weight``: Keras ``fit(class_weight={idx: weight})`` — each
        sample's loss is weighted by its label's entry (training only, as in
        Keras; pass weighted validation elements for weighted val metrics).
        Per-element sample weights and ``class_weight`` multiply when both
        are present. Weighted training requires a loss speaking the Keras
        ``Loss`` call contract (``chambers_tpu.losses.Loss`` subclasses do).

        ``skip_batches``: drain this many leading batches from the stream
        (host-side, never transferred to device) before the first trained
        step. This is the mid-epoch resume recipe for a deterministic
        (seeded) pipeline after :meth:`CheckpointCallback.restore_into`::

            restored = ckpt.restore_into(trainer)
            step = int(trainer.state.step)
            trainer.fit(ds, epochs=E, steps_per_epoch=S,
                        initial_epoch=step // S, skip_batches=step % S)

        Note: the device prefetcher reads up to 2 batches ahead of the last
        trained step, so when ``dataset`` is a shared single-pass generator
        driven with ``steps_per_epoch``, up to 2 batches beyond the trained
        range are consumed (and dropped) when ``fit`` returns — a second
        ``fit`` on the same stream resumes after them. Pass a re-iterable
        dataset (or a fresh generator) when exact stream positioning across
        ``fit`` calls matters.
        """
        callback_list = CallbackList(list(callbacks))
        callback_list.set_model(_CallbackModel(self))
        callback_list.set_params({"epochs": epochs})
        self.stop_training = False
        callback_list.on_train_begin()

        def drained(raw_it):
            for _ in range(skip_batches):
                try:
                    next(raw_it)
                except StopIteration:
                    break
            return raw_it

        history = []
        # With steps_per_epoch, the iterator persists across epochs (Keras/
        # tf.data semantics: a repeated stream keeps advancing rather than
        # re-training the same leading batches each epoch). The prefetcher
        # wraps the raw iterator and keeps 2 batches device_put ahead, so
        # the host→device copy of batch i+1 overlaps step i's compute.
        # steps_per_execution>1 uses the raw iterator instead: windows are
        # stacked host-side while the device runs the previous window
        # (dispatch is async), and transferred in one move.
        windowed = self._spe > 1
        make_stream = lambda: self._normalized_stream(iter(dataset),
                                                      class_weight)
        persistent_it = None
        if steps_per_epoch is not None:
            raw = drained(make_stream())
            persistent_it = (_PushbackIterator(raw) if windowed
                             else _DevicePrefetcher(raw, self._place_batch))

        for epoch in range(initial_epoch, epochs):
            callback_list.on_epoch_begin(epoch)
            epoch_start = time.perf_counter()
            batch_logs: Dict[str, list] = {}
            metric_states = self._init_metric_states()  # reset per epoch
            if persistent_it is not None:
                it = persistent_it
            else:
                it = (drained(make_stream()) if epoch == initial_epoch
                      else make_stream())
                it = (_PushbackIterator(it) if windowed
                      else _DevicePrefetcher(it, self._place_batch))
            step = 0
            any_batch = False
            while ((steps_per_epoch is None or step < steps_per_epoch)
                   and not self.stop_training):
                if windowed:
                    # one compiled scan over up to `spe` steps, truncated at
                    # the epoch boundary so windows never cross epochs
                    w_target = (self._spe if steps_per_epoch is None
                                else min(self._spe, steps_per_epoch - step))
                    batches = self._collect_window(it, w_target)
                    if not batches:
                        if persistent_it is None:
                            break
                        persistent_it = it = _PushbackIterator(
                            make_stream())  # restart stream
                        batches = self._collect_window(it, w_target)
                        if not batches:
                            break  # dataset is empty
                    placed = self._place_window(batches)
                    w = len(batches)
                    callback_list.on_train_batch_begin(step)
                    self.state, metric_states, step_logs = self.train_window(
                        self.state, metric_states, placed
                    )
                    any_batch = True
                    # step_logs leaves are stacked [w] — every per-step value
                    # reaches the epoch aggregation, exactly as with N=1
                    for k, v in step_logs.items():
                        batch_logs.setdefault(k, []).append(v)
                    # Keras steps_per_execution convention: batch callbacks
                    # fire once per window, end with the LAST step's index
                    # and logs
                    callback_list.on_train_batch_end(
                        step + w - 1,
                        jax.tree.map(lambda a: a[-1], step_logs))
                    step += w
                    continue
                try:
                    x, y, sw = next(it)
                except StopIteration:
                    if persistent_it is None:
                        break
                    persistent_it = it = _DevicePrefetcher(  # restart stream
                        make_stream(), self._place_batch)
                    try:
                        x, y, sw = next(it)
                    except StopIteration:
                        break  # dataset is empty
                callback_list.on_train_batch_begin(step)
                self.state, metric_states, step_logs = self.train_step(
                    self.state, metric_states, x, y, sw
                )
                any_batch = True
                # keep values on device — float()ing here would sync the
                # host every step and stall async dispatch
                for k, v in step_logs.items():
                    batch_logs.setdefault(k, []).append(v)
                callback_list.on_train_batch_end(step, step_logs)
                step += 1

            if not any_batch and not self.stop_training and epoch > initial_epoch:
                raise ValueError(
                    "Dataset yielded no batches after the first epoch — "
                    "pass a re-iterable dataset, or use `repeats`/"
                    "`steps_per_epoch` for single-pass generators."
                )
            logs = {
                k: float(jnp.mean(jnp.concatenate(
                    [jnp.atleast_1d(v) for v in vs])))
                for k, vs in batch_logs.items()
            }
            if "loss" not in logs:
                logs["loss"] = float("nan")
            for name, m in {**self._streaming,
                            **self._streaming_w}.items():
                logs[name] = float(m.compute(metric_states[name]))
            lr = self._current_lr()
            if lr is not None:
                logs["lr"] = lr  # schedule curves land in CSV/TensorBoard
            if validation_data is not None:
                val_logs = self.evaluate(validation_data, callbacks=callback_list,
                                         steps=validation_steps, verbose=False)
                logs.update({f"val_{k}": v for k, v in val_logs.items()})
            if verbose:
                dt = time.perf_counter() - epoch_start
                msg = " - ".join(f"{k}: {v:.4f}" for k, v in logs.items())
                print(f"Epoch {epoch + 1}/{epochs} [{dt:.1f}s] {msg}")
            callback_list.on_epoch_end(epoch, logs)
            history.append(logs)
            if self.stop_training:
                break

        callback_list.on_train_end()
        self.sync_model()
        return history

    def _current_lr(self) -> Optional[float]:
        """The learning rate at the CURRENT optimizer step, when the
        optimizer exposes one (a configured AdamW/SGDW or any object with a
        ``learning_rate`` in its ``get_config``); None otherwise. Scalar
        rates report as-is; schedules evaluate at ``state.step`` (the count
        every ``scale_by_learning_rate(schedule)`` sees)."""
        get_config = getattr(self.optimizer, "get_config", None)
        if get_config is None:
            return None
        try:
            config = get_config()
            rate = config.get("learning_rate")
        except Exception:
            return None
        if rate is None:
            return None
        try:
            value = float(rate(self.state.step)) if callable(rate) \
                else float(rate)
        except Exception:
            return None
        time_decay = config.get("decay") or 0.0  # legacy Keras-1 kwarg
        if time_decay:
            value /= 1.0 + time_decay * float(self.state.step)
        scale = self.get_lr_scale()  # ReduceLROnPlateau / LRScheduler factor
        if scale is not None:
            value *= scale
        return value

    def evaluate(self, dataset: Iterable, callbacks=None, verbose: bool = True,
                 steps: Optional[int] = None):
        if callbacks is None:
            callback_list = CallbackList([])
        elif isinstance(callbacks, CallbackList):
            callback_list = callbacks
        else:
            callback_list = CallbackList(list(callbacks))
        callback_list.on_test_begin()
        totals: Dict[str, list] = {}
        metric_states = self._init_metric_states()
        # islice consumes exactly `steps` batches — a bound check inside the
        # for-loop would pull (and discard) one extra element from shared or
        # expensive iterators
        bounded_raw = itertools.islice(
            self._normalized_stream(iter(dataset)), steps)
        if self._spe > 1:
            bounded_raw = _PushbackIterator(bounded_raw)
            step = 0
            while True:
                batches = self._collect_window(bounded_raw, self._spe)
                if not batches:
                    break
                placed = self._place_window(batches)
                callback_list.on_test_batch_begin(step)
                metric_states, logs = self.eval_window(
                    self.state.params, self.state.extra_vars, metric_states,
                    placed,
                )
                for k, v in logs.items():
                    totals.setdefault(k, []).append(v)  # stacked [w]
                callback_list.on_test_batch_end(step + len(batches) - 1)
                step += len(batches)
        else:
            bounded = _DevicePrefetcher(bounded_raw, self._place_batch)
            for step, (x, y, sw) in enumerate(bounded):
                callback_list.on_test_batch_begin(step)
                metric_states, logs = self.eval_step(
                    self.state.params, self.state.extra_vars, metric_states,
                    x, y, sw,
                )
                # keep scalars on device during the loop; one sync at the end
                for k, v in logs.items():
                    totals.setdefault(k, []).append(v)
                callback_list.on_test_batch_end(step)
        callback_list.on_test_end()
        result = {
            k: float(jnp.mean(jnp.concatenate(
                [jnp.atleast_1d(v) for v in vs])))
            for k, vs in totals.items()
        }
        for name, m in {**self._streaming, **self._streaming_w}.items():
            result[name] = float(m.compute(metric_states[name]))
        if verbose:
            print(" - ".join(f"{k}: {v:.4f}" for k, v in result.items()))
        return result

    def predict(self, x, batch_size: int = 32):
        self.sync_model()
        return self.model.predict(x, batch_size=batch_size)
