r"""Generic batched ops: sign-with-plus-at-zero and O(log N) cumulative scans.

TPU-native redesign of pypose/basics/ops.py.  The reference implements the
inclusive scan by index-doubling in Python (ops.py:27-36); here the same
O(log N) behavior comes from :func:`jax.lax.associative_scan`, which XLA
lowers to a work-efficient parallel scan on TPU — and which operates over
pytrees, so LieTensor slices flow through the user-provided group op
directly.
"""

import jax
import jax.numpy as jnp


def pm(input):
    """Sign function returning +1 at 0.  Ref: basics/ops.py:4-24."""
    from ..lietensor.lietensor import LieTensor
    x = input.tensor() if isinstance(input, LieTensor) else jnp.asarray(input)
    return jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))


def _check_dim(input, dim):
    ndim = len(input.lshape) if hasattr(input, 'lshape') else input.ndim - 1
    if dim < 0:
        dim += ndim + 1
    assert 0 <= dim < ndim + 1 and dim != ndim, \
        "Invalid dim: cannot scan over the storage dimension"
    return dim


def cumops(input, dim, ops):
    r"""Cumulative user-defined op along ``dim``: y_i = x_1 o x_2 o ... o x_i.

    O(log N) via lax.associative_scan.  Ref: basics/ops.py:59-96.
    """
    dim = _check_dim(input, dim)
    return jax.lax.associative_scan(ops, input, axis=dim)


def cummul(input, dim, left=True):
    """Cumulative group ``*``.  Left: y_i = x_i * ... * x_1.  Ref: ops.py:99-152."""
    if left:
        return cumops(input, dim, lambda a, b: b * a)
    return cumops(input, dim, lambda a, b: a * b)


def cumprod(input, dim, left=True):
    """Cumulative group ``@``.  Left: y_i = x_i @ ... @ x_1.  Ref: ops.py:153-205."""
    if left:
        return cumops(input, dim, lambda a, b: b @ a)
    return cumops(input, dim, lambda a, b: a @ b)


# JAX is functional — the reference's inplace variants (basics/ops.py:27-57)
# alias the pure ones.
cumops_ = cumops
cummul_ = cummul
cumprod_ = cumprod
