r"""Type/NaN checking helpers.  Ref: pypose/function/checking.py."""

import math

import jax.numpy as jnp

from ..lietensor import lietensor as _lt
from ..lietensor.lietensor import LieTensor


def is_lietensor(obj):
    """Ref: checking.py:6."""
    return isinstance(obj, LieTensor)


def is_SE3(obj):
    """Ref: checking.py:19."""
    return isinstance(getattr(obj, 'ltype', None), _lt.SE3Type)


def hasnan(obj):
    """Recursively check a (nested) container for NaN.  Ref: checking.py:32."""
    if isinstance(obj, (list, tuple)):
        return any(hasnan(l) for l in obj)
    if isinstance(obj, dict):
        return any(hasnan(l) for l in obj.values())
    if isinstance(obj, LieTensor):
        obj = obj.tensor()
    if hasattr(obj, 'dtype'):
        return bool(jnp.isnan(obj).any())
    return math.isnan(obj)
