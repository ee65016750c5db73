"""Optimizers with decoupled weight decay and regex-based decay filtering.

Parity: reference ``chambers/optimizers.py``. The reference extends tfa's
``DecoupledWeightDecayExtension`` with regex ``decay_include``/
``decay_exclude`` variable filtering (optimizers.py:169-181) and decays
weights with the *raw* weight-decay rate independent of the learning rate,
using the pre-update variable value (``var -= wd * var`` before the gradient
step, :147-167).

This build expresses the same math as optax gradient transformations:
``base_update(-lr·g̃) + masked(-wd·param)`` — exactly tfa's decoupled decay
(commutes with the additive gradient step). Parameter paths for the regex
filters are ``/``-joined pytree key paths (e.g.
``encoder/layers_0/norm1/scale``); the reference matched TF variable names of
the same shape.
"""

import re
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import optax

ScalarOrSchedule = Union[float, Callable[[Any], Any]]


from chambers_tpu.utils.pytree import param_paths as _param_paths


def decay_mask(params, decay_include=None, decay_exclude=None):
    """Boolean pytree: which leaves receive weight decay.

    Mirrors ``WeightDecayExtension._is_decay_allowed`` (optimizers.py:169-181):
    with ``decay_include``, only params whose path matches any pattern
    (``re.search``) decay; with ``decay_exclude``, all decay except matches;
    with neither, everything decays.
    """
    if decay_include is not None and decay_exclude is not None:
        raise ValueError(
            "Got both `decay_include` and `decay_exclude` arguments. "
            "Use only `decay_include` or `decay_exclude`."
        )

    def allowed(path):
        if decay_include is not None:
            return any(re.search(p, path) for p in decay_include)
        if decay_exclude is not None:
            return not any(re.search(p, path) for p in decay_exclude)
        return True

    paths = iter(_param_paths(params))
    return jax.tree.map(lambda _: allowed(next(paths)), params)


def add_decoupled_weight_decay(
    weight_decay: ScalarOrSchedule,
    decay_include=None,
    decay_exclude=None,
) -> optax.GradientTransformation:
    """Adds ``-wd * param`` to the updates for masked leaves (tfa-style
    lr-independent decoupled decay). Apply *after* learning-rate scaling."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jax.numpy.zeros([], jax.numpy.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("add_decoupled_weight_decay requires params.")
        wd = weight_decay(state.count) if callable(weight_decay) else weight_decay
        mask = decay_mask(
            params, decay_include=decay_include, decay_exclude=decay_exclude
        )
        new_updates = jax.tree.map(
            lambda u, p, m: u - wd * p if m else u, updates, params, mask
        )
        return new_updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def extend_with_weight_decay(
    base_optimizer: optax.GradientTransformation,
    weight_decay: ScalarOrSchedule,
    decay_include=None,
    decay_exclude=None,
) -> optax.GradientTransformation:
    """Any optax optimizer → decoupled-weight-decay variant
    (optimizers.py:193-286 equivalent)."""
    return optax.chain(
        base_optimizer,
        add_decoupled_weight_decay(
            weight_decay,
            decay_include=decay_include,
            decay_exclude=decay_exclude,
        ),
    ) if weight_decay else base_optimizer


def clip_by_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-leaf L2-norm gradient clipping — Keras ``clipnorm`` semantics
    (``tf.clip_by_norm`` on each gradient tensor independently:
    ``g * max_norm / max(|g|, max_norm)``). For the joint-norm variant use
    ``optax.clip_by_global_norm``."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def clip(g):
            norm = jax.numpy.sqrt(jax.numpy.sum(jax.numpy.square(g)))
            return g * (max_norm / jax.numpy.maximum(norm, max_norm))

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init, update)


def _resolve_lr(learning_rate, lr):
    """The legacy ``lr`` alias replaces ``learning_rate`` — it must never
    silently override an explicit one (a stale ``lr=`` surviving a partial
    migration would train at the wrong rate with no diagnostic)."""
    if lr is None:
        return learning_rate
    if not (isinstance(learning_rate, float) and learning_rate == 0.001):
        raise ValueError(
            f"Got both learning_rate={learning_rate!r} and its legacy "
            f"alias lr={lr!r}; pass only one."
        )
    return lr


def _apply_time_decay(learning_rate, decay):
    """Keras-1-style time-inverse decay (the legacy ``decay`` kwarg the
    reference's optimizers document, reference optimizers.py:352-356):
    ``rate_t = rate / (1 + decay * step)``, composed on top of whatever
    ``learning_rate`` is (scalar or schedule)."""
    if not decay:
        return learning_rate
    base = learning_rate

    def rate_fn(step):
        rate = base(step) if callable(base) else base
        return rate / (1.0 + decay * jax.numpy.asarray(
            step, jax.numpy.float32))
    return rate_fn


def _clip_transforms(clipnorm, clipvalue, global_clipnorm):
    """Keras optimizer clipping kwargs → optax transforms, in Keras's
    apply order (norm clip, then value clip; reference optimizers.py:352-356
    allows ``clipnorm``/``clipvalue`` on SGDW/AdamW)."""
    if clipnorm is not None and global_clipnorm is not None:
        raise ValueError(
            "At most one of `clipnorm` and `global_clipnorm` can be set "
            "(Keras optimizer contract).")
    parts = []
    if clipnorm is not None:
        parts.append(clip_by_norm(clipnorm))
    if global_clipnorm is not None:
        parts.append(optax.clip_by_global_norm(global_clipnorm))
    if clipvalue is not None:
        parts.append(optax.clip(clipvalue))
    return parts


class MutableLRScaleState(NamedTuple):
    """State of :func:`mutable_lr_scale`: a host-settable learning-rate
    multiplier. Lives in the optimizer state (device-resident, donated with
    it) so changing the rate NEVER retraces or recompiles the train step —
    the mechanism behind ``callbacks.ReduceLROnPlateau`` and
    ``callbacks.LearningRateScheduler``."""

    scale: jax.Array


def mutable_lr_scale() -> optax.GradientTransformation:
    """Multiply updates by a state-resident scalar (initially 1.0).

    Inserted by ``AdamW(..., mutable_lr=True)`` / ``SGDW(..., mutable_lr=
    True)`` AFTER the learning rate but BEFORE the decoupled weight decay,
    so — like Keras ``ReduceLROnPlateau`` over a tfa decoupled-decay
    optimizer — the decay term keeps its configured strength when the rate
    drops."""

    def init(params):
        del params
        return MutableLRScaleState(scale=jax.numpy.ones([], jax.numpy.float32))

    def update(updates, state, params=None):
        del params
        return (jax.tree.map(lambda u: u * state.scale, updates), state)

    return optax.GradientTransformation(init, update)


def _is_scale_state(node):
    return isinstance(node, MutableLRScaleState)


def get_lr_scale(opt_state):
    """The current mutable lr multiplier, or None if the optimizer was not
    built with ``mutable_lr=True``."""
    found = []
    jax.tree.map(lambda n: found.append(n.scale) if _is_scale_state(n) else n,
                 opt_state, is_leaf=_is_scale_state)
    return float(found[0]) if found else None


def set_lr_scale(opt_state, scale):
    """A copy of ``opt_state`` with the mutable lr multiplier replaced.

    ``scale`` may be a Python float or a placed jax array (pass a
    mesh-replicated scalar when the train state is sharded)."""
    found = [0]

    def replace(node):
        if _is_scale_state(node):
            found[0] += 1
            value = scale if hasattr(scale, "dtype") else jax.numpy.asarray(
                scale, jax.numpy.float32)
            return MutableLRScaleState(scale=value)
        return node

    new_state = jax.tree.map(replace, opt_state, is_leaf=_is_scale_state)
    if not found[0]:
        raise ValueError(
            "optimizer state carries no mutable lr scale — construct the "
            "optimizer with mutable_lr=True (AdamW/SGDW) to use "
            "ReduceLROnPlateau / LearningRateScheduler")
    return new_state


class WeightDecayExtension:
    """Decoupled weight decay with regex variable filtering as a reusable
    extension object (reference optimizers.py:10-181, the public
    ``WeightDecayExtension`` class).

    The reference expresses this as a mixin over Keras optimizers; the optax
    counterpart is a value object holding the decay configuration that turns
    any base ``GradientTransformation`` into its decayed variant::

        tx = WeightDecayExtension(1e-4, decay_exclude=[r"bias$"]).extend(
            optax.adam(1e-3))

    ``mask(params)`` exposes the ``_is_decay_allowed`` predicate
    (optimizers.py:169-181) as a boolean pytree. ``extend_with_weight_decay``
    and the named ``SGDW``/``AdamW`` classes are the function-style spellings
    of the same machinery.
    """

    def __init__(self, weight_decay: ScalarOrSchedule,
                 decay_include=None, decay_exclude=None):
        if decay_include is not None and decay_exclude is not None:
            raise ValueError(
                "Got both `decay_include` and `decay_exclude` arguments. "
                "Use only `decay_include` or `decay_exclude`."
            )
        self.weight_decay = weight_decay
        self.decay_include = decay_include
        self.decay_exclude = decay_exclude

    def mask(self, params):
        """Boolean pytree of leaves that receive decay."""
        return decay_mask(params, decay_include=self.decay_include,
                          decay_exclude=self.decay_exclude)

    def extend(self, base_optimizer: optax.GradientTransformation
               ) -> optax.GradientTransformation:
        """``base_optimizer`` → its decoupled-weight-decay variant."""
        return extend_with_weight_decay(
            base_optimizer, self.weight_decay,
            decay_include=self.decay_include,
            decay_exclude=self.decay_exclude,
        )

    __call__ = extend

    def get_config(self):
        return {
            "weight_decay": self.weight_decay,
            "decay_include": self.decay_include,
            "decay_exclude": self.decay_exclude,
        }

    @classmethod
    def from_config(cls, config):
        return cls(**config)


class _ConfiguredOptimizer:
    """An optax ``GradientTransformation`` that keeps its constructor config.

    The reference registers ``SGDW``/``AdamW`` as Keras-serializable with a
    ``get_config`` round-trip (reference optimizers.py:289-290,371-372).
    optax transformations are anonymous closures, so the named optimizers are
    classes: instances expose ``init``/``update`` (the transformation
    protocol) plus ``get_config``/``from_config`` for
    ``chambers_tpu.serialization``.
    """

    def __init__(self, **config):
        self._config = config
        self._tx = self._build(**config)

    @staticmethod
    def _build(**config) -> optax.GradientTransformation:
        raise NotImplementedError

    def init(self, params):
        return self._tx.init(params)

    def update(self, updates, state, params=None):
        return self._tx.update(updates, state, params)

    def get_config(self):
        return dict(self._config)

    @classmethod
    def from_config(cls, config):
        return cls(**config)


class AdamW(_ConfiguredOptimizer):
    """Adam + decoupled weight decay (optimizers.py:372-464).

    Defaults mirror the reference (note Keras's epsilon=1e-7, not 1e-8).
    ``clipnorm``/``clipvalue`` are the Keras optimizer kwargs the reference
    explicitly allows (optimizers.py:446-449): gradients are clipped before
    the Adam statistics; the decoupled decay term is NOT clipped (Keras
    applies decay outside the gradient path). ``global_clipnorm`` is the
    joint-norm variant (mutually exclusive with ``clipnorm``).
    """

    def __init__(
        self,
        weight_decay: ScalarOrSchedule,
        decay_include=None,
        decay_exclude=None,
        learning_rate: ScalarOrSchedule = 0.001,
        beta_1: float = 0.9,
        beta_2: float = 0.999,
        epsilon: float = 1e-7,
        amsgrad: bool = False,
        clipnorm: Optional[float] = None,
        clipvalue: Optional[float] = None,
        global_clipnorm: Optional[float] = None,
        lr: Optional[ScalarOrSchedule] = None,
        decay: float = 0.0,
        mutable_lr: bool = False,
    ):
        super().__init__(
            weight_decay=weight_decay, decay_include=decay_include,
            decay_exclude=decay_exclude,
            learning_rate=_resolve_lr(learning_rate, lr),
            beta_1=beta_1, beta_2=beta_2, epsilon=epsilon, amsgrad=amsgrad,
            clipnorm=clipnorm, clipvalue=clipvalue,
            global_clipnorm=global_clipnorm, decay=decay,
            mutable_lr=mutable_lr,
        )

    @staticmethod
    def _build(weight_decay, decay_include, decay_exclude, learning_rate,
               beta_1, beta_2, epsilon, amsgrad,
               clipnorm=None, clipvalue=None, global_clipnorm=None,
               decay=0.0, mutable_lr=False):
        learning_rate = _apply_time_decay(learning_rate, decay)
        base = optax.chain(
            *_clip_transforms(clipnorm, clipvalue, global_clipnorm),
            optax.scale_by_amsgrad(b1=beta_1, b2=beta_2, eps=epsilon)
            if amsgrad
            else optax.scale_by_adam(b1=beta_1, b2=beta_2, eps=epsilon),
            optax.scale_by_learning_rate(learning_rate),
            *([mutable_lr_scale()] if mutable_lr else []),
        )
        return extend_with_weight_decay(
            base, weight_decay, decay_include=decay_include,
            decay_exclude=decay_exclude,
        )


class SGDW(_ConfiguredOptimizer):
    """SGD (+momentum/nesterov) + decoupled weight decay
    (optimizers.py:290-368). ``clipnorm``/``clipvalue``/``global_clipnorm``
    as on :class:`AdamW` (reference optimizers.py:352-356)."""

    def __init__(
        self,
        weight_decay: ScalarOrSchedule,
        decay_include=None,
        decay_exclude=None,
        learning_rate: ScalarOrSchedule = 0.001,
        momentum: float = 0.0,
        nesterov: bool = False,
        clipnorm: Optional[float] = None,
        clipvalue: Optional[float] = None,
        global_clipnorm: Optional[float] = None,
        lr: Optional[ScalarOrSchedule] = None,
        decay: float = 0.0,
        mutable_lr: bool = False,
    ):
        super().__init__(
            weight_decay=weight_decay, decay_include=decay_include,
            decay_exclude=decay_exclude,
            learning_rate=_resolve_lr(learning_rate, lr),
            momentum=momentum, nesterov=nesterov,
            clipnorm=clipnorm, clipvalue=clipvalue,
            global_clipnorm=global_clipnorm, decay=decay,
            mutable_lr=mutable_lr,
        )

    @staticmethod
    def _build(weight_decay, decay_include, decay_exclude, learning_rate,
               momentum, nesterov,
               clipnorm=None, clipvalue=None, global_clipnorm=None,
               decay=0.0, mutable_lr=False):
        learning_rate = _apply_time_decay(learning_rate, decay)
        parts = _clip_transforms(clipnorm, clipvalue, global_clipnorm)
        if momentum:
            parts.append(optax.trace(decay=momentum, nesterov=nesterov))
        parts.append(optax.scale_by_learning_rate(learning_rate))
        if mutable_lr:
            parts.append(mutable_lr_scale())
        return extend_with_weight_decay(
            optax.chain(*parts), weight_decay,
            decay_include=decay_include, decay_exclude=decay_exclude,
        )
