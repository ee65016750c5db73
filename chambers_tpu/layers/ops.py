"""Op-wrapper layers (matmul and reductions).

Parity: reference ``chambers/layers/ops.py:5-149``. In the reference these are
Keras layers so reductions compose in the functional graph API (e.g.
``Sum(axis=1)`` implements the ``pooling="sum"`` head of ViT,
vision_transformer.py:179-181). Here they are simple callables over jnp ops.
"""

import jax.numpy as jnp


class Matmul:
    def __init__(self, transpose_a=False, transpose_b=False):
        self.transpose_a = transpose_a
        self.transpose_b = transpose_b

    def __call__(self, inputs):
        a, b = inputs
        if self.transpose_a:
            a = jnp.swapaxes(a, -1, -2)
        if self.transpose_b:
            b = jnp.swapaxes(b, -1, -2)
        return a @ b


class ReduceFunctionWrapper:
    """Wrap any ``fn(x, axis=, keepdims=)`` reduction as a layer-style
    callable — the extension point the reference exposes
    (chambers/layers/ops.py:54-76); ``Sum``/``Max``/... below are its
    preconfigured instances."""

    def __init__(self, reduce_fn, axis=None, keepdims=False):
        self.reduce_fn = reduce_fn
        self.axis = axis
        self.keepdims = keepdims

    def __call__(self, inputs):
        return self.reduce_fn(inputs, axis=self.axis, keepdims=self.keepdims)


class _Reduce(ReduceFunctionWrapper):
    _fn = None

    def __init__(self, axis=None, keepdims=False):
        super().__init__(type(self)._fn, axis=axis, keepdims=keepdims)


class Sum(_Reduce):
    _fn = staticmethod(jnp.sum)


class Prod(_Reduce):
    _fn = staticmethod(jnp.prod)


class Max(_Reduce):
    _fn = staticmethod(jnp.max)


class Min(_Reduce):
    _fn = staticmethod(jnp.min)


class ArgReduceFunctionWrapper:
    """Wrap any ``fn(x, axis=)`` arg-reduction, cast to ``output_type`` —
    the reference's extension point (chambers/layers/ops.py:79-101);
    ``Argmax``/``Argmin`` are its preconfigured instances."""

    def __init__(self, reduce_fn, axis=None, output_type=jnp.int32):
        self.reduce_fn = reduce_fn
        self.axis = axis
        self.output_type = output_type

    def __call__(self, inputs):
        return self.reduce_fn(inputs, axis=self.axis).astype(self.output_type)


class _ArgReduce(ArgReduceFunctionWrapper):
    _fn = None

    def __init__(self, axis=None, output_type=jnp.int32):
        super().__init__(type(self)._fn, axis=axis, output_type=output_type)


class Argmax(_ArgReduce):
    _fn = staticmethod(jnp.argmax)


class Argmin(_ArgReduce):
    _fn = staticmethod(jnp.argmin)
