r"""Basic Lie functions: vec2skew, manifold-aware add, mul.

Ref: pypose/lietensor/basics.py.
"""

import jax.numpy as jnp

from .jacobian import vec2skew as _vec2skew
from .lietensor import LieTensor


def vec2skew(input):
    """Batched vectors (*, 3) -> skew matrices (*, 3, 3).  Ref: basics.py:7-42."""
    v = input.tensor() if isinstance(input, LieTensor) else jnp.asarray(input)
    assert v.shape[-1] == 3, "Last dim should be 3"
    return _vec2skew(v)


def add(input, other, alpha=1):
    r"""Manifold-aware add.  Ref: basics.py:51-129.

    y = alpha*a + x for algebras; y = Exp(alpha*a) * x for groups.
    """
    assert isinstance(input, LieTensor), 'input must be a LieTensor'
    return input.add(other, alpha)


def add_(input, other, alpha=1):
    """Pure alias of :func:`add` (JAX has no in-place ops).  Ref: basics.py:44-48."""
    return add(input, other, alpha)


def mul(input, other):
    r"""Group multiplication / action / scalar mul.  Ref: basics.py:131-229."""
    assert isinstance(input, LieTensor), 'input must be a LieTensor'
    return input.mul(other)
