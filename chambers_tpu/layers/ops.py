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


class _Reduce:
    _fn = None

    def __init__(self, axis=None, keepdims=False):
        self.axis = axis
        self.keepdims = keepdims

    def __call__(self, inputs):
        return type(self)._fn(inputs, axis=self.axis, keepdims=self.keepdims)


class Sum(_Reduce):
    _fn = staticmethod(jnp.sum)


class Prod(_Reduce):
    _fn = staticmethod(jnp.prod)


class Max(_Reduce):
    _fn = staticmethod(jnp.max)


class Min(_Reduce):
    _fn = staticmethod(jnp.min)


class _ArgReduce:
    _fn = None

    def __init__(self, axis=None, output_type=jnp.int32):
        self.axis = axis
        self.output_type = output_type

    def __call__(self, inputs):
        out = type(self)._fn(inputs, axis=self.axis)
        return out.astype(self.output_type)


class Argmax(_ArgReduce):
    _fn = staticmethod(jnp.argmax)


class Argmin(_ArgReduce):
    _fn = staticmethod(jnp.argmin)
