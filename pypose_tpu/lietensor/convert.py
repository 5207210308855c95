r"""Matrix/Euler conversions and accessors for LieTensors.

Ref: pypose/lietensor/convert.py.  The 4-case branchless quaternion
extraction (convert.py:95-147) is kept mask-based so it vectorizes on TPU;
validity checks (orthogonality/determinant) run only on concrete (non-traced)
arrays since data-dependent raises cannot live under ``jit``.
"""

import warnings

import jax
import jax.numpy as jnp

from .lietensor import (
    LieTensor, SO3_type, SE3_type, Sim3_type, RxSO3_type, liegroup,
)
from .utils import SO3, SE3, Sim3, RxSO3


def _is_concrete(x):
    return not isinstance(x, jax.core.Tracer)


def _check_shape(mat):
    mat = jnp.asarray(mat)
    if mat.ndim < 2:
        raise ValueError(
            'Input size must be at least 2 dimensions. Got {}'.format(
                mat.shape))
    if mat.shape[-2:] not in ((3, 3), (3, 4), (4, 4)):
        raise ValueError(
            'Input size must be a * x 3 x 3 or * x 3 x 4 or * x 4 x 4 '
            'tensor. Got {}'.format(mat.shape))
    return mat


def _check_rotation(mat, rtol, atol):
    e0 = mat @ jnp.swapaxes(mat, -1, -2)
    e1 = jnp.eye(3, dtype=mat.dtype)
    if not jnp.allclose(e0, jnp.broadcast_to(e1, e0.shape), rtol=rtol,
                        atol=atol):
        raise ValueError('Input rotation matrices are not all orthogonal '
                         'matrix')
    if not jnp.allclose(jnp.linalg.det(mat),
                        jnp.ones(mat.shape[:-2], dtype=mat.dtype),
                        rtol=rtol, atol=atol):
        raise ValueError("Input rotation matrices' determinant are not all "
                         "equal to 1")


def mat2SO3(mat, check=True, rtol=1e-5, atol=1e-5):
    r"""Rotation matrices ``(*, 3, 3)`` -> SO3 quaternions ``(*, 4)``.

    Uses the branchless 4-case quaternion extraction (one case per
    dominant diagonal element), mask-combined so it vectorizes on TPU.
    Also accepts ``(*, 3, 4)`` / ``(*, 4, 4)`` and reads the upper-left
    3x3 block.

    Args:
        mat: rotation matrices.
        check: when True and the input is concrete (not traced), raise
            ``ValueError`` if matrices are not orthogonal with unit
            determinant (within ``rtol/atol``).

    Ref: pypose/lietensor/convert.py:95-147.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.mat2SO3(jnp.eye(3))
        SO3Type LieTensor:
        [0. 0. 0. 1.]
        >>> import jax
        >>> R = pp.randn_SO3(5, key=jax.random.PRNGKey(0))
        >>> q = pp.mat2SO3(R.matrix())        # round-trip via matrices
        >>> bool(jnp.allclose(q.matrix(), R.matrix(), atol=1e-5))
        True
    """
    mat = _check_shape(mat)[..., :3, :3]
    if check and _is_concrete(mat):
        _check_rotation(mat, rtol, atol)

    rt = jnp.swapaxes(mat, -1, -2)

    mask_d2 = rt[..., 2, 2] < atol
    mask_d0_d1 = rt[..., 0, 0] > rt[..., 1, 1]
    mask_d0_nd1 = rt[..., 0, 0] < -rt[..., 1, 1]

    t0 = 1 + rt[..., 0, 0] - rt[..., 1, 1] - rt[..., 2, 2]
    q0 = jnp.stack([rt[..., 1, 2] - rt[..., 2, 1], t0,
                    rt[..., 0, 1] + rt[..., 1, 0],
                    rt[..., 2, 0] + rt[..., 0, 2]], axis=-1)

    t1 = 1 - rt[..., 0, 0] + rt[..., 1, 1] - rt[..., 2, 2]
    q1 = jnp.stack([rt[..., 2, 0] - rt[..., 0, 2],
                    rt[..., 0, 1] + rt[..., 1, 0], t1,
                    rt[..., 1, 2] + rt[..., 2, 1]], axis=-1)

    t2 = 1 - rt[..., 0, 0] - rt[..., 1, 1] + rt[..., 2, 2]
    q2 = jnp.stack([rt[..., 0, 1] - rt[..., 1, 0],
                    rt[..., 2, 0] + rt[..., 0, 2],
                    rt[..., 1, 2] + rt[..., 2, 1], t2], axis=-1)

    t3 = 1 + rt[..., 0, 0] + rt[..., 1, 1] + rt[..., 2, 2]
    q3 = jnp.stack([t3, rt[..., 1, 2] - rt[..., 2, 1],
                    rt[..., 2, 0] - rt[..., 0, 2],
                    rt[..., 0, 1] - rt[..., 1, 0]], axis=-1)

    c0 = (mask_d2 & mask_d0_d1)[..., None]
    c1 = (mask_d2 & ~mask_d0_d1)[..., None]
    c2 = (~mask_d2 & mask_d0_nd1)[..., None]
    c3 = (~mask_d2 & ~mask_d0_nd1)[..., None]
    c0f, c1f = c0.astype(mat.dtype), c1.astype(mat.dtype)
    c2f, c3f = c2.astype(mat.dtype), c3.astype(mat.dtype)

    q = q0 * c0f + q1 * c1f + q2 * c2f + q3 * c3f
    t = t0[..., None] * c0f + t1[..., None] * c1f + \
        t2[..., None] * c2f + t3[..., None] * c3f
    q = q / (2.0 * jnp.sqrt(jnp.maximum(t, jnp.finfo(mat.dtype).tiny)))

    # wxyz -> xyzw
    q = q[..., jnp.array([1, 2, 3, 0])]
    return SO3(q)


def _check_last_row(mat, rtol, atol):
    zo = jnp.array([0, 0, 0, 1], dtype=mat.dtype)
    if not jnp.allclose(mat[..., 3, :],
                        jnp.broadcast_to(zo, mat[..., 3, :].shape),
                        rtol=rtol, atol=atol):
        warnings.warn(
            'input of shape 4x4 last rows are not all equal [0, 0, 0, 1]')


def mat2SE3(mat, check=True, rtol=1e-5, atol=1e-5):
    r"""Transformation matrices ``(*, 3|4, 3|4)`` -> SE3 ``(*, 7)``.

    The rotation block goes through :func:`mat2SO3`; the translation is
    read from the 4th column (zeros for 3x3 input).  4x4 inputs warn if
    the last row deviates from ``[0, 0, 0, 1]``.

    Ref: pypose/lietensor/convert.py:148-260.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> M = jnp.eye(4).at[:3, 3].set(jnp.array([1., 2., 3.]))
        >>> pp.mat2SE3(M)
        SE3Type LieTensor:
        [1. 2. 3. 0. 0. 0. 1.]
    """
    mat = _check_shape(mat)
    if mat.shape[-2:] == (4, 4) and check and _is_concrete(mat):
        _check_last_row(mat, rtol, atol)
    q = mat2SO3(mat[..., :3, :3], check=check, rtol=rtol, atol=atol).tensor()
    if mat.shape[-1] == 3:
        t = jnp.zeros(mat.shape[:-2] + (3,), dtype=mat.dtype)
    else:
        t = mat[..., :3, 3]
    return SE3(jnp.concatenate([t, q], axis=-1))


def mat2Sim3(mat, check=True, rtol=1e-5, atol=1e-5):
    r"""Similarity matrices ``(*, 3|4, 3|4)`` -> Sim3 ``(*, 8)``.

    The scale is recovered as ``det(sR)^(1/3)``; the de-scaled block is
    validated/extracted by :func:`mat2SO3`.

    Ref: pypose/lietensor/convert.py:261-414.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.mat2Sim3(2.0 * jnp.eye(3))     # pure scale
        Sim3Type LieTensor:
        [0. 0. 0. 0. 0. 0. 1. 2.]
    """
    mat = _check_shape(mat)
    if mat.shape[-2:] == (4, 4) and check and _is_concrete(mat):
        _check_last_row(mat, rtol, atol)
    rot = mat[..., :3, :3]
    s = jnp.cbrt(jnp.linalg.det(rot))[..., None]
    if _is_concrete(s) and jnp.allclose(
            s, jnp.zeros_like(s), rtol=rtol, atol=atol):
        raise ValueError('Rotation matrix not full rank.')
    q = mat2SO3(rot / s[..., None], check=check, rtol=rtol,
                atol=atol).tensor()
    if mat.shape[-1] == 3:
        t = jnp.zeros(mat.shape[:-2] + (3,), dtype=mat.dtype)
    else:
        t = mat[..., :3, 3]
    return Sim3(jnp.concatenate([t, q, s], axis=-1))


def mat2RxSO3(mat, check=True, rtol=1e-5, atol=1e-5):
    r"""Scaled rotations ``(*, 3, 3)`` -> RxSO3 ``(*, 5)``.

    Ref: pypose/lietensor/convert.py:415-515.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.mat2RxSO3(3.0 * jnp.eye(3))
        RxSO3Type LieTensor:
        [0. 0. 0. 1. 3.]
    """
    mat = _check_shape(mat)
    rot = mat[..., :3, :3]
    s = jnp.cbrt(jnp.linalg.det(rot))[..., None]
    if _is_concrete(s) and jnp.allclose(
            s, jnp.zeros_like(s), rtol=rtol, atol=atol):
        raise ValueError('Rotation matrix not full rank.')
    q = mat2SO3(rot / s[..., None], check=check, rtol=rtol,
                atol=atol).tensor()
    return RxSO3(jnp.concatenate([q, s], axis=-1))


def from_matrix(mat, ltype, check=True, rtol=1e-5, atol=1e-5):
    r"""Generic matrix -> LieTensor dispatch on ``ltype``.

    Ref: pypose/lietensor/convert.py:516-606.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.from_matrix(jnp.eye(4), pp.SE3_type)
        SE3Type LieTensor:
        [0. 0. 0. 0. 0. 0. 1.]
    """
    mat = _check_shape(mat)
    if ltype == SO3_type:
        return mat2SO3(mat, check=check, rtol=rtol, atol=atol)
    elif ltype == SE3_type:
        return mat2SE3(mat, check=check, rtol=rtol, atol=atol)
    elif ltype == Sim3_type:
        return mat2Sim3(mat, check=check, rtol=rtol, atol=atol)
    elif ltype == RxSO3_type:
        return mat2RxSO3(mat, check=check, rtol=rtol, atol=atol)
    raise ValueError(
        'Input ltype must be one of SO3_type, SE3_type, Sim3_type or '
        'RxSO3_type. Got {}'.format(ltype))


def euler2SO3(euler, **kwargs):
    r"""Euler angles ``(*, 3)`` (roll, pitch, yaw; radians) -> SO3.

    Intrinsic x-y-z convention, matching the reference.

    Ref: pypose/lietensor/convert.py:607-665.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.euler2SO3(jnp.zeros(3))
        SO3Type LieTensor:
        [0. 0. 0. 1.]
        >>> q = pp.euler2SO3(jnp.array([0.1, -0.2, 0.3]))
        >>> bool(jnp.allclose(q.euler(), jnp.array([0.1, -0.2, 0.3]),
        ...                   atol=1e-6))    # euler() round-trips
        True
    """
    euler = jnp.asarray(euler, **kwargs)
    assert euler.shape[-1] == 3
    shape = euler.shape
    euler = euler.reshape(-1, 3)
    roll, pitch, yaw = euler[:, 0], euler[:, 1], euler[:, 2]
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    q = jnp.stack([sr * cp * cy - cr * sp * sy,
                   cr * sp * cy + sr * cp * sy,
                   cr * cp * sy - sr * sp * cy,
                   cr * cp * cy + sr * sp * sy], axis=-1)
    return SO3(q).lview(*shape[:-1])


def tensor(inputs):
    """Storage array of a LieTensor.  Ref: pypose/lietensor/convert.py:666.

    Example:
        >>> import pypose_tpu as pp
        >>> pp.tensor(pp.identity_SO3())
        Array([0., 0., 0., 1.], dtype=float32)
    """
    return inputs.tensor()


def translation(inputs):
    """Translation part ``(*, 3)`` (zeros for SO3/RxSO3).
    Ref: pypose/lietensor/convert.py:668-700.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.translation(pp.SE3(jnp.array([1., 2., 3., 0., 0., 0., 1.])))
        Array([1., 2., 3.], dtype=float32)
    """
    return inputs.translation()


def rotation(inputs):
    """Rotation part as an SO3 LieTensor.
    Ref: pypose/lietensor/convert.py:702-734."""
    return inputs.rotation()


def scale(inputs):
    """Scale part ``(*, 1)`` (ones for SO3/SE3).
    Ref: pypose/lietensor/convert.py:736-768."""
    return inputs.scale()


def matrix(inputs):
    """Dense matrix form: 3x3 (SO3/RxSO3) or 4x4 (SE3/Sim3).
    Ref: pypose/lietensor/convert.py:770-800.

    Example:
        >>> import pypose_tpu as pp
        >>> pp.matrix(pp.identity_SE3()).shape
        (4, 4)
    """
    return inputs.matrix()


def euler(inputs, eps=2e-4):
    """Euler angles (roll, pitch, yaw) of the rotation part, with the
    gimbal-lock branch taken when |pitch| is within ``eps`` of pi/2.
    Ref: pypose/lietensor/convert.py:802-828."""
    return inputs.euler(eps=eps)


def quat2unit(input, eps=1e-12):
    r"""Normalize the quaternion part of a group LieTensor.

    Ref: pypose/lietensor/convert.py:830-862.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.quat2unit(pp.SO3(jnp.array([0., 0., 0., 2.])))
        SO3Type LieTensor:
        [0. 0. 0. 1.]
    """
    if isinstance(input, LieTensor) and input.ltype in liegroup:
        data = input.tensor()
        if input.ltype in (SO3_type, RxSO3_type):
            q = data[..., :4]
            n = jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
            data = jnp.concatenate([q / n, data[..., 4:]], axis=-1)
        else:  # SE3 / Sim3
            q = data[..., 3:7]
            n = jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
            data = jnp.concatenate([data[..., :3], q / n, data[..., 7:]],
                                   axis=-1)
        return LieTensor(data, ltype=input.ltype)
    warnings.warn('Input is not Lie group, doing nothing and returning '
                  'input.')
    return input
