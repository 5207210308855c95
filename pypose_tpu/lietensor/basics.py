r"""Basic Lie functions: vec2skew, manifold-aware add, mul.

Ref: pypose/lietensor/basics.py.
"""

import jax.numpy as jnp

from .jacobian import vec2skew as _vec2skew
from .lietensor import LieTensor


def vec2skew(input):
    r"""Batched vectors ``(*, 3)`` -> skew-symmetric matrices ``(*, 3, 3)``.

    .. math:: \hat v = \begin{bmatrix} 0 & -v_z & v_y \\ v_z & 0 & -v_x
              \\ -v_y & v_x & 0 \end{bmatrix},\qquad \hat v\,p = v \times p

    Ref: pypose/lietensor/basics.py:7-42.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.vec2skew(jnp.array([1., 2., 3.]))
        Array([[ 0., -3.,  2.],
               [ 3.,  0., -1.],
               [-2.,  1.,  0.]], dtype=float32)
    """
    v = input.tensor() if isinstance(input, LieTensor) else jnp.asarray(input)
    assert v.shape[-1] == 3, "Last dim should be 3"
    return _vec2skew(v)


def add(input, other, alpha=1):
    r"""Manifold-aware addition (the retraction underlying first-order
    on-manifold optimizers).

    Algebra types: ``y = input + alpha * other`` (plain vector add).
    Group types: ``y = Exp(alpha * other[..., :m]) * input`` — the
    perturbation's first ``m`` (manifold-dim) channels are interpreted as
    a left tangent; a storage-shaped ``other`` is accepted so gradients
    (which are storage-shaped, left-trivialized) add directly.

    Ref: pypose/lietensor/basics.py:51-129.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.identity_SO3()
        >>> y = pp.add(X, jnp.array([0.1, 0., 0., 0.]))   # storage-shaped
        >>> bool(jnp.allclose(y.tensor(),
        ...                   pp.so3(jnp.array([0.1, 0., 0.])).Exp().tensor()))
        True
    """
    assert isinstance(input, LieTensor), 'input must be a LieTensor'
    return input.add(other, alpha)


def add_(input, other, alpha=1):
    """Pure alias of :func:`add` (JAX has no in-place ops).  Ref: basics.py:44-48."""
    return add(input, other, alpha)


def mul(input, other):
    r"""Group multiplication / point action / scalar multiplication.

    Dispatches on ``other``: same-type group -> composition; point array
    -> :func:`pypose_tpu.Act`; scalar (algebra types only) -> tangent
    scaling.  Ref: pypose/lietensor/basics.py:131-229.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> x = pp.so3(jnp.array([0.2, 0., 0.]))
        >>> pp.mul(x, 0.5)
        so3Type LieTensor:
        [0.1 0.  0. ]
    """
    assert isinstance(input, LieTensor), 'input must be a LieTensor'
    return input.mul(other)


def _same_ltype(tensors):
    lt = [t for t in tensors if isinstance(t, LieTensor)]
    assert lt, 'At least one input must be a LieTensor'
    ltype = lt[0].ltype
    assert all(t.ltype is ltype for t in lt), 'ltype mismatch'
    return ltype


def stack(tensors, dim=0):
    """Stack LieTensors along a new batch dim (the reference exposes this
    through __torch_function__ whitelisting, lietensor.py:26-35).

    Example:
        >>> import pypose_tpu as pp
        >>> pp.lietensor.basics.stack([pp.identity_SO3(),
        ...                            pp.identity_SO3()]).lshape
        (2,)
    """
    ltype = _same_ltype(tensors)
    data = jnp.stack([t.tensor() if isinstance(t, LieTensor)
                      else jnp.asarray(t) for t in tensors], axis=dim)
    return LieTensor(data, ltype=ltype)


def cat(tensors, dim=0):
    """Concatenate LieTensors along an existing batch dim."""
    ltype = _same_ltype(tensors)
    data = jnp.concatenate([t.tensor() if isinstance(t, LieTensor)
                            else jnp.asarray(t) for t in tensors], axis=dim)
    return LieTensor(data, ltype=ltype)


concat = cat


def split(tensor, split_size_or_sections, dim=0):
    """Split a LieTensor along a batch dim."""
    assert isinstance(tensor, LieTensor)
    n = tensor.lshape[dim] if dim >= 0 else tensor.tensor().shape[dim]
    if isinstance(split_size_or_sections, int):
        idx = list(range(split_size_or_sections, n,
                         split_size_or_sections))
    else:
        import numpy as _np
        idx = list(_np.cumsum(split_size_or_sections)[:-1])
    parts = jnp.split(tensor.tensor(), idx, axis=dim)
    return tuple(LieTensor(p, ltype=tensor.ltype) for p in parts)
