r"""Batched linear-algebra helpers.  Ref: pypose/function/linalg.py."""

import jax.numpy as jnp

from ..lietensor.lietensor import LieTensor


def _t(x):
    return x.tensor() if isinstance(x, LieTensor) else x


def bvv(lvec, rvec):
    """Batched vector-vector outer product ``(*, m), (*, n) -> (*, m, n)``.

    Ref: pypose/function/linalg.py:5.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.bvv(jnp.array([1., 2.]), jnp.array([3., 4.]))
        Array([[3., 4.],
               [6., 8.]], dtype=float32)
    """
    lvec, rvec = _t(lvec), _t(rvec)
    return lvec[..., :, None] @ rvec[..., None, :]


def bmv(mat, vec):
    """Batched matrix-vector product ``(*, m, n), (*, n) -> (*, m)``.

    Ref: pypose/function/linalg.py:37.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.bmv(jnp.eye(2) * 2., jnp.array([1., 3.]))
        Array([2., 6.], dtype=float32)
    """
    mat, vec = _t(mat), _t(vec)
    assert mat.ndim >= 2 and vec.ndim >= 1, 'Input arguments invalid'
    assert mat.shape[-1] == vec.shape[-1], 'matrix-vector shape invalid'
    return (mat @ vec[..., None])[..., 0]


def bvmv(lvec, mat, rvec):
    """Batched vector-matrix-vector product ``-> (*,)`` (quadratic form).

    Ref: pypose/function/linalg.py:67.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.bvmv(jnp.ones(2), jnp.eye(2), jnp.ones(2))
        Array([2.], dtype=float32)
    """
    lvec, mat, rvec = _t(lvec), _t(mat), _t(rvec)
    assert mat.ndim >= 2 and lvec.ndim >= 1 and rvec.ndim >= 1
    assert lvec.shape[-1] == mat.shape[-2] and mat.shape[-1] == rvec.shape[-1]
    out = (lvec[..., None, :] @ mat @ rvec[..., :, None])[..., 0, 0]
    return jnp.atleast_1d(out)
