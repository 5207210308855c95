r"""Batched linear-algebra helpers.  Ref: pypose/function/linalg.py."""

import jax.numpy as jnp

from ..lietensor.lietensor import LieTensor


def _t(x):
    return x.tensor() if isinstance(x, LieTensor) else x


def bvv(lvec, rvec):
    """Batched vector-vector outer product (*, m, n).  Ref: linalg.py:5."""
    lvec, rvec = _t(lvec), _t(rvec)
    return lvec[..., :, None] @ rvec[..., None, :]


def bmv(mat, vec):
    """Batched matrix-vector product (*, m).  Ref: linalg.py:37."""
    mat, vec = _t(mat), _t(vec)
    assert mat.ndim >= 2 and vec.ndim >= 1, 'Input arguments invalid'
    assert mat.shape[-1] == vec.shape[-1], 'matrix-vector shape invalid'
    return (mat @ vec[..., None])[..., 0]


def bvmv(lvec, mat, rvec):
    """Batched vector-matrix-vector product (*,).  Ref: linalg.py:67."""
    lvec, mat, rvec = _t(lvec), _t(mat), _t(rvec)
    assert mat.ndim >= 2 and lvec.ndim >= 1 and rvec.ndim >= 1
    assert lvec.shape[-1] == mat.shape[-2] and mat.shape[-1] == rvec.shape[-1]
    out = (lvec[..., None, :] @ mat @ rvec[..., :, None])[..., 0, 0]
    return jnp.atleast_1d(out)
